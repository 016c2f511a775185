package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.Sketches
import org.apache.spark.sql.functions._

/** Hashed linear quality classifier ([[Classifier]]): weight-function
  * determinism, the exact integer fold, path parity (pure-function
  * weights vs the materialized weight table), the shuffle-free plan of
  * the map-side path, and edge documents.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("weightMilli is the Knuth mix, in range, and spread across it") {
    val ws = (0L to 2000L).map { b =>
      val w = Classifier.weightMilli(7, b)
      assert(w == (b + 7) * 2654435761L % 2001 - 1000)
      assert(w >= -1000 && w <= 1000)
      w
    }
    // the multiplicative mix must not collapse: most residues distinct
    assert(ws.distinct.size > 1900, s"weight mix degenerate: ${ws.distinct.size}")
  }

  test("score = sigmoid of the exact integer feature-weight mean") {
    val docs = Seq((1L, "red fox"), (2L, "one"), (3L, "a b a")).toDF("id", "text")
    val got = Classifier.score(docs, "text", bucketBits = 18, seed = 7)
      .select("id", "n_feats", "quality").orderBy("id")
      .as[(Long, Long, Double)].collect()

    def hand(words: Seq[String]): (Long, Double) = {
      val feats = words ++ words.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val s = feats.map(f =>
        Classifier.weightMilli(7, Sketches.hash60(f) % (1L << 18))).sum
      val mean = s.toDouble / (feats.size * 1000.0)
      (feats.size.toLong,
        BigDecimal(1.0 / (1.0 + math.exp(-mean)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got(0) == ((1L, 3L, hand(Seq("red", "fox"))._2)))
    assert(got(1)._2 == 1L) // single token: unigram only, no bigram
    assert(got(2) == ((3L, 5L, hand(Seq("a", "b", "a"))._2)))
  }

  test("scoreWith on the materialized hash model equals the pure-function path") {
    val docs = Tables.documents(spark, sfDir).limit(200).cache()
    val bits = 10
    val a = Classifier.score(docs, "text", bucketBits = bits, seed = 7)
      .select("doc_id", "n_feats", "quality", "keep")
    val b = Classifier.scoreWith(docs, "doc_id", "text",
      Classifier.hashModel(spark, bits, 7), bucketBits = bits)
      .select("doc_id", "n_feats", "quality", "keep")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    docs.unpersist()
  }

  test("pure-function scoring is map-side only (no Exchange in the plan)") {
    val plan = Classifier.score(Tables.documents(spark, sfDir), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"hash-weight scoring must not shuffle:\n${plan.take(2000)}")
  }

  test("scoreWith missing buckets weigh zero; empty-ish docs keep=false on NULL") {
    val docs = Seq((1L, "only these words")).toDF("id", "text")
    val empty = spark.emptyDataset[(Long, Long)].toDF("bucket", "w_milli")
    val r = Classifier.scoreWith(docs, "id", "text", empty)
      .select("quality", "keep").as[(Double, Boolean)].head()
    assert(r == ((0.5, true))) // all-zero weights: sigmoid(0) = 0.5 >= 0.5
    val neg = Classifier.score(Seq((1L, "x")).toDF("id", "text"),
      "text", threshold = 1.1)
      .select("keep").as[Boolean].head()
    assert(!neg)
  }

  test("calibrateThreshold picks the F1-max cut, higher threshold on ties") {
    import spark.implicits._
    // qualities 0.9/0.7/0.4/0.2; actual y. Cuts (desc):
    //  0.9: tp=1 fp=0 fn=2 -> f1 = 2/4 = .5
    //  0.7: tp=2 fp=0 fn=1 -> f1 = 4/5 = .8
    //  0.4: tp=2 fp=1 fn=1 -> f1 = 4/6 = .6667
    //  0.2: tp=3 fp=1 fn=0 -> f1 = 6/7 = .8571  <- best
    val scored = Seq((0.9, true), (0.7, true), (0.4, false), (0.2, true))
      .toDF("quality", "y")
    val got = Classifier.calibrateThreshold(scored, col("quality"), col("y"))
      .as[(Double, Long, Long, Long, Double)].head()
    assert(got == ((0.2, 3L, 1L, 0L, 0.8571)), got.toString)
    // tie case: two cuts with equal f1 -> the higher threshold wins
    val tied = Seq((0.9, true), (0.5, false), (0.3, false)).toDF("quality", "y")
    val t = Classifier.calibrateThreshold(tied, col("quality"), col("y"))
      .as[(Double, Long, Long, Long, Double)].head()
    assert(t._1 == 0.9, t.toString) // f1=1.0 at 0.9; lower cuts add fp
    // null qualities count toward fn (never kept), not toward any cut
    val withNull = Seq((Some(0.8), true), (None, true), (Some(0.1), false))
      .toDF("quality", "y")
    val n = Classifier.calibrateThreshold(withNull, col("quality"), col("y"))
      .as[(Double, Long, Long, Long, Double)].head()
    assert(n == ((0.8, 1L, 0L, 1L, 0.6667)), n.toString)
  }

  test("edge contracts: all-null calibrate row, confusion null handling") {
    import spark.implicits._
    // all qualities NULL -> still one row: no cut, everything fn
    val allNull = Seq((Option.empty[Double], true), (None, true), (None, false))
      .toDF("quality", "y")
    val c = Classifier.calibrateThreshold(allNull, col("quality"), col("y"))
      .collect()(0)
    assert(c.isNullAt(0) && c.getLong(1) == 0L && c.getLong(3) == 2L &&
      c.isNullAt(4), c.toString)
    // confusion: NULL predicted = false; NULL actual excluded entirely
    val cm = Classifier.confusion(
        Seq((Some(true), Some(true)), (None, Some(true)),
          (Some(true), Option.empty[Boolean])).toDF("p", "y"),
        col("p"), col("y"))
      .as[(Long, Long, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].head()
    assert((cm._1, cm._2, cm._3, cm._4) == ((1L, 0L, 0L, 1L)), cm.toString)
  }

  test("calibrateThreshold and auc match brute-force references on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 120).map { _ =>
      (BigDecimal(rnd.nextDouble()).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, rnd.nextBoolean())
    }
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // brute sweep: every distinct quality as the cut, f1 rounded, tie -> higher q
    val cuts = rows.map(_._1).distinct.map { q =>
      val tp = rows.count(r => r._1 >= q && r._2)
      val fp = rows.count(r => r._1 >= q && !r._2)
      val fn = rows.count(r => r._1 < q && r._2)
      (q, tp, fp, fn, r4(2.0 * tp / (2.0 * tp + fp + fn)))
    }
    val best = cuts.maxBy { case (q, _, _, _, f1) => (f1, q) }
    val gotC = Classifier.calibrateThreshold(rows.toDF("quality", "y"),
        col("quality"), col("y"))
      .as[(Double, Long, Long, Long, Double)].head()
    assert(gotC == ((best._1, best._2.toLong, best._3.toLong,
      best._4.toLong, best._5)), s"got $gotC expected $best")
    // brute AUC: all pos-neg pairs, ties half
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val u = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val gotA = Classifier.auc(rows.toDF("quality", "y"), col("quality"), col("y"))
      .as[(Double, Long, Long)].head()
    assert(gotA == ((r4(u / (pos.size * neg.size)), pos.size.toLong,
      neg.size.toLong)), s"got $gotA expected u=$u")
  }

  test("auc: tie-corrected rank-sum, nulls rank last, degenerate class null") {
    import spark.implicits._
    // pos@0.9 beats both negs (2); pos@0.7 ties neg@0.7 (0.5) + beats
    // 0.2 (1); null pos loses both -> U = 3.5, AUC = 3.5/6
    val scored = Seq((Some(0.9), true), (Some(0.7), false), (Some(0.7), true),
      (Some(0.2), false), (None, true)).toDF("quality", "y")
    val got = Classifier.auc(scored, col("quality"), col("y"))
      .as[(Double, Long, Long)].head()
    assert(got == ((0.5833, 3L, 2L)), got.toString)
    val onlyPos = Seq((0.9, true)).toDF("quality", "y")
    val d = Classifier.auc(onlyPos, col("quality"), col("y"))
      .collect()(0)
    assert(d.isNullAt(0), d.toString)
  }

  test("trainLogistic learns a separable vocabulary and scoreWith separates on it") {
    // two disjoint vocabularies, labels follow the vocabulary exactly
    val good = (1L to 10L).map(i => (i, "excellent prose reads wonderfully here", 1))
    val bad = (11L to 20L).map(i => (i, "spam junk noise garbage filler words", 0))
    val docs = (good ++ bad).toDF("id", "text", "y")
    val w = Classifier.trainLogistic(docs, "id", "text", col("y") === 1,
      bucketBits = 12, epochs = 3, lr = 20.0)
    val scored = Classifier.scoreWith(docs, "id", "text", w, bucketBits = 12)
      .select("id", "quality").as[(Long, Double)].collect().toMap
    val gq = good.map(g => scored(g._1)).toSeq
    val bq = bad.map(b => scored(b._1)).toSeq
    assert(gq.min > bq.max,
      s"trained model does not separate: good=$gq bad=$bq")
    assert(gq.forall(_ > 0.5) && bq.forall(_ < 0.5),
      s"threshold 0.5 misclassifies: good=$gq bad=$bq")
  }

  test("trainLogistic epoch-1 gradient is the hand-computed update") {
    // one doc per class, one token each, no bucket collision at 12 bits
    val docs = Seq((1L, "alpha", 1), (2L, "beta", 0)).toDF("id", "text", "y")
    val w = Classifier.trainLogistic(docs, "id", "text", col("y") === 1,
        bucketBits = 12, epochs = 1, lr = 10.0)
      .as[(Long, Long)].collect().toMap
    // features per doc: unigram only (1 token -> no bigram); x = 1.
    // r = 0.5 - y: alpha -> -0.5, beta -> +0.5; N = 2
    // w[b] = -round(10 * 1000 * r * 1 / 2) = +2500 for alpha, -2500 beta
    val aB = graft.functions.Sketches.hash60("alpha") % 4096
    val bB = graft.functions.Sketches.hash60("beta") % 4096
    assert(w(aB) == 2500L && w(bB) == -2500L, w.toString)
  }

  test("wide bucket spaces drop the forced weight broadcast (LmSpec precedent)") {
    // bucketBits 24 -> 2^24 possible rows > the ~2M broadcast budget: the
    // bucket-keyed weight probe must NOT execute as a broadcast hash join
    // (a 24-30 bit space would otherwise force up to a ~17 GB broadcast
    // bypassing AQE's size check); results must match the broadcast path
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta beta"), (3L, "alpha"))
      .toDF("id", "text")
    def bucketJoins(df: org.apache.spark.sql.DataFrame, shape: String): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains(shape) && l.contains("[bucket"))

    // scoreWith: same weights, narrow vs wide bucket space
    val wideModel = Classifier.hashModel(spark, 10, 7) // small TABLE either way
    val narrow = Classifier.scoreWith(docs, "id", "text", wideModel, bucketBits = 18)
    val wide = Classifier.scoreWith(docs, "id", "text", wideModel, bucketBits = 24)
    assert(bucketJoins(narrow, "BroadcastHashJoin") > 0,
      "in-budget bucket space should broadcast the weights")
    assert(bucketJoins(wide, "BroadcastHashJoin") == 0,
      s"wide bucket space still broadcasts:\n${wide.queryExecution.executedPlan.toString.take(2000)}")
    assert(bucketJoins(wide, "ShuffledHashJoin") > 0)

    // trainLogistic at 24 bits executes the epoch-2 probe through the
    // guarded (shuffled) shape for real — identical fitted weight VALUES
    // to an 18-bit run (no collisions among these tokens, so only bucket
    // addresses differ between the spaces)
    val labeled = Seq((1L, "good fine", 1), (2L, "bad junk", 0)).toDF("id", "text", "y")
    val fitted = Classifier.trainLogistic(labeled, "id", "text", col("y") === 1,
      bucketBits = 24, epochs = 2, lr = 10.0)
    val viaWide = fitted.as[(Long, Long)].collect().toMap
    val viaNarrowBits = Classifier.trainLogistic(labeled, "id", "text",
      col("y") === 1, bucketBits = 18, epochs = 2, lr = 10.0)
      .as[(Long, Long)].collect().toMap
    assert(viaWide.values.toSeq.sorted == viaNarrowBits.values.toSeq.sorted,
      s"guarded probe changed the fitted weights: $viaWide vs $viaNarrowBits")
  }
}
