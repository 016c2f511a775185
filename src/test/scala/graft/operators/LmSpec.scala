package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmSpec extends SparkSpec {

  test("bigramScore matches hand-computed add-1 bigram log-likelihoods") {
    import spark.implicits._
    // corpus: d1 = "a b a", d2 = "a b", d3 = "x" (too short)
    // unigrams: a:3 b:2 x:1 → V=3
    // bigrams:  "a b":2, "b a":1
    val df = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val rows = Lm.bigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val pAB = math.log((2 + 1.0) / (3 + 3.0)) // c2(a b)+1 / c1(a)+V
    val pBA = math.log((1 + 1.0) / (2 + 3.0)) // c2(b a)+1 / c1(b)+V
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1L) == ((2L, Some(r4((pAB + pBA) / 2)))))
    assert(rows(2L) == ((1L, Some(r4(pAB)))))
    assert(rows(3L) == ((0L, None)), "sub-bigram doc scores NULL with 0 bigrams")
  }

  test("bigramScore ranks a gibberish doc below in-distribution docs") {
    import spark.implicits._
    val common = (1 to 20).map(i => (i.toLong, "the quick fox jumps over the lazy dog"))
    val odd = Seq((99L, "zq qz zz qq zq qz zz qq"))
    val scores = Lm.bigramScore((common ++ odd).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(99L) < scores(1L),
      s"rare-bigram doc must score lower: ${scores(99L)} vs ${scores(1L)}")
  }

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    df.collect() // materialize so AQE finalizes its join strategy choices
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val root = finalPlan(df.queryExecution.executedPlan)
    (root +: root.collect { case a: AdaptiveSparkPlanExec => a.executedPlan })
      .map(_.treeString).mkString("\n")
  }

  test("bigramScore past maxModelRows drops the broadcast and matches the broadcast path") {
    import spark.implicits._
    val df = Seq((1L, "a b a c a b"), (2L, "b c a"), (3L, "c a b a")).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).sortBy(_._1).toSeq
    val viaBroadcast = Lm.bigramScore(df, "doc_id", "text")
    val viaShuffle = Lm.bigramScore(df, "doc_id", "text", maxModelRows = 1)
    // model (4 distinct bigrams) exceeds maxModelRows=1: the GRAM-keyed
    // model probe must NOT execute as a broadcast hash join — the 100 TB
    // guard, where a forced broadcast of an open-vocabulary model is an
    // executor OOM. (The final doc_id-keyed join of the bounded per-doc
    // aggregate may still broadcast — that side is bounded by docs, and
    // AQE is free to pick it.)
    def gramJoins(plan: String, shape: String): Int =
      plan.linesIterator.count(l => l.contains(shape) && l.contains("[__gram"))
    val plan = planString(viaShuffle)
    assert(gramJoins(plan, "BroadcastHashJoin") == 0,
      s"oversize model still broadcast on the gram key:\n${plan.take(2000)}")
    assert(gramJoins(plan, "ShuffledHashJoin") > 0, plan.take(2000))
    assert(rows(viaShuffle) == rows(viaBroadcast),
      "join strategy must not change the scores")
    val planSmall = planString(viaBroadcast)
    assert(gramJoins(planSmall, "BroadcastHashJoin") > 0,
      s"in-bounds model should broadcast:\n${planSmall.take(2000)}")
  }

  test("bigramScore minCount prunes rare grams to the unseen backoff") {
    import spark.implicits._
    // "a b" occurs twice, "b a" once → minCount=2 prunes "b a"
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // unigrams a:2 b:2 → V=2; grams: "a b"×2, "b a"×1
    val got = Lm.bigramScore(df, "doc_id", "text", minCount = 2)
      .collect().map(r => r.getDouble(2)).head
    val pAB = math.log((2 + 1.0) / (2 + 2.0))
    val pBA = math.log((0 + 1.0) / (0 + 2.0)) // pruned → unseen backoff
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == r4((pAB + pAB + pBA) / 3), s"got $got")
  }

  test("importanceWeights raw-feature path honors the maxModelRows guard") {
    import spark.implicits._
    val target = (1 to 10).map(i => (i.toLong, "alpha beta gamma delta", true))
    val raw = Seq((100L, "alpha beta gamma", false), (101L, "omega psi chi phi", false))
    val df = (target ++ raw).toDF("doc_id", "text", "t")
    def weights(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    val viaBroadcast = Lm.importanceWeights(df, "doc_id", "text", col("t"))
    val viaShuffle = Lm.importanceWeights(df, "doc_id", "text", col("t"),
      maxModelRows = 1)
    val plan = planString(viaShuffle)
    assert(!plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("[__gram")),
      s"oversize model still broadcast on the gram key:\n${plan.take(2000)}")
    assert(weights(viaShuffle) == weights(viaBroadcast))
  }

  test("hashed-feature DSIR is bounded and separates the pools like the raw estimator") {
    import spark.implicits._
    val target = (1 to 10).map(i => (i.toLong, "alpha beta gamma delta", true))
    val rawLike = Seq((100L, "alpha beta gamma", false))
    val rawFar = Seq((101L, "omega psi chi phi", false))
    val df = (target ++ rawLike ++ rawFar).toDF("doc_id", "text", "t")
    // collision-free bucket space: hashed weights EQUAL raw weights
    val raw = Lm.importanceWeights(df, "doc_id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hashed = Lm.importanceWeights(df, "doc_id", "text", col("t"),
        featureBuckets = 1 << 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hashed == raw,
      s"collision-free hashing must reproduce raw weights: $hashed vs $raw")
    // tiny bucket space (forced collisions) still executes, still scores
    // only the raw pool, and the model is bounded by the bucket count
    val tiny = Lm.importanceWeights(df, "doc_id", "text", col("t"),
      featureBuckets = 4)
    assert(tiny.collect().map(_.getLong(0)).toSet == Set(100L, 101L))
  }

  test("importanceWeights favors raw docs resembling the target") {
    import spark.implicits._
    val target = (1 to 10).map(i => (i.toLong, "alpha beta gamma delta", true))
    val rawLike = Seq((100L, "alpha beta gamma", false))
    val rawFar = Seq((101L, "omega psi chi phi", false))
    val df = (target ++ rawLike ++ rawFar).toDF("doc_id", "text", "t")
    val w = Lm.importanceWeights(df, "doc_id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set(100L, 101L), "only raw-pool docs are scored")
    assert(w(100L) > w(101L),
      s"target-resembling raw doc must rank higher: $w")
    assert(w(100L) > 0 && w(101L) < 0,
      s"log-ratio sign must separate in/out of distribution: $w")
  }

  test("knScore matches hand-computed interpolated Kneser-Ney") {
    import spark.implicits._
    // corpus: d1 = "a b a", d2 = "a b" → bigrams: "a b":2, "b a":1
    // contexts: c(a ·)=2, N1+(a ·)=1; c(b ·)=1, N1+(b ·)=1
    // continuations: N1+(· b)=1, N1+(· a)=1; bigram types = 2; D=0.75
    val df = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val rows = Lm.knScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val pAB = math.log((2 - 0.75) / 2 + (0.75 * 1 / 2) * (1.0 / 2))
    val pBA = math.log((1 - 0.75) / 1 + (0.75 * 1 / 1) * (1.0 / 2))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1L) == ((2L, Some(r4((pAB + pBA) / 2)))))
    assert(rows(2L) == ((1L, Some(r4(pAB)))))
  }

  test("knScore: KN probabilities sum to 1 over observed continuations per context") {
    import spark.implicits._
    // richer corpus where contexts have several distinct continuations.
    // Interpolated KN normalizes exactly when every w2 of the vocabulary
    // is an observed continuation somewhere: Σ_w2∈cont P(w2|w1) =
    // (c(w1·) − D·N1+(w1·))/c(w1·) + D·N1+(w1·)/c(w1·) · Σ N1+(·w2)/types
    // and Σ_w2 N1+(· w2) = types. Verify numerically per context.
    val docs = Seq((1L, "a b a c a b b c a"), (2L, "c a b c b a")).toDF("doc_id", "text")
    val grams = docs.select(explode(TextOps.shingles(
        TextOps.tokens(lower(col("text"))), 2)).as("g"))
      .groupBy("g").count().as[(String, Long)].collect()
      .map { case (g, c) => val Array(w1, w2) = g.split(" "); (w1, w2, c) }
    val types = grams.length.toDouble
    val byW1 = grams.groupBy(_._1)
    val n1back = grams.groupBy(_._2).map { case (w2, g) => w2 -> g.length }
    val d = 0.75
    val vocab2 = grams.map(_._2).distinct
    byW1.foreach { case (w1, g) =>
      val cctx = g.map(_._3).sum.toDouble
      val n1fwd = g.length
      val total = vocab2.map { w2 =>
        val c2 = g.find(_._2 == w2).map(_._3).getOrElse(0L).toDouble
        math.max(c2 - d, 0) / cctx + (d * n1fwd / cctx) * (n1back(w2) / types)
      }.sum
      assert(math.abs(total - 1.0) < 1e-12,
        s"KN must normalize over the continuation vocabulary for '$w1': $total")
    }
  }
}
