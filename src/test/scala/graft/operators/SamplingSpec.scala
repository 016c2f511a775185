package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("hash sample is deterministic and close to the target fraction") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same data, same key, same fraction → identical sample")
    val n = docs.count().toDouble
    assert(a.size > n * 0.15 && a.size < n * 0.35,
      s"${a.size} of $n sampled; expected ~25%")
  }

  test("hash sample is monotone in fraction (smaller sample is a subset)") {
    val small = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(docs, col("doc_id"), 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large),
      "threshold sampling must nest: keep(0.1) ⊆ keep(0.4)")
  }

  test("fraction edge cases fold to constants") {
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0).count() == docs.count())
    assert(Sampling.hashSample(docs, col("doc_id"), 0.0).count() == 0)
  }

  test("stratified sample applies per-stratum rates") {
    val sampled = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.0), defaultRate = 1.0)
    assert(sampled.where(col("lang") === "en").count() == 0)
    assert(sampled.where(col("lang") =!= "en").count() ==
      docs.where(col("lang") =!= "en").count())
  }

  test("tokenBudgetMix keeps under-budget strata whole, lands over-budget near target") {
    import org.apache.spark.sql.functions.size
    // docs-based strata are tiny at test SF (tens of docs), so kept-token
    // variance there swamps any tight bound; properties that need
    // statistics use a synthetic 2000-row stratum where a ±20% band is
    // >5 sigma for independent per-row hash keeps.
    import spark.implicits._
    val big = (1 to 2000).map(i => ("big", i.toLong, 10L))
      .toDF("source", "doc_id", "n")
    val small = (1 to 10).map(i => ("small", 10000L + i, 10L))
      .toDF("source", "doc_id", "n")
    val data = big.unionByName(small)
    val budget = 5000L // big: 20000 tokens → rate ~0.25; small: 100 → whole
    val mixed = Sampling.tokenBudgetMix(data, "source", col("doc_id"), "n", budget)
    val kept = mixed.groupBy("source").agg(sum("n").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100L, "under-budget stratum must pass through whole")
    val k = kept("big").toDouble
    assert(k > budget * 0.8 && k < budget * 1.2,
      s"big: kept $k tokens for budget $budget (total 20000)")
    // deterministic: same data, same budget → identical kept set (real table)
    val withN = docs.select(col("source"), col("doc_id"),
      size(TextOps.tokens(col("text"))).as("n"))
    val docBudget = 600L
    val once = Sampling.tokenBudgetMix(withN, "source", col("doc_id"), "n", docBudget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.tokenBudgetMix(withN, "source", col("doc_id"), "n", docBudget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again)
  }

  test("groupSplit never splits a group and respects the weight order") {
    val split = Sampling.groupSplit(docs, col("source"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val perGroup = split.groupBy("source")
      .agg(countDistinct("split").as("k")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L),
      "a provenance group must map to exactly one split")
    val labels = split.select("split").distinct().collect()
      .map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
    // every row is labeled; re-run is identical (pure function of the data)
    assert(split.where(col("split").isNull).count() == 0)
    val again = Sampling.groupSplit(docs, col("source"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.select("doc_id", "split").collect()
      .forall(r => again(r.getLong(0)) == r.getString(1)))
  }

  test("groupSplit statistics: synthetic groups land near their weights") {
    import spark.implicits._
    // 2000 groups of 1 row: binomial bounds are tight (>5 sigma at ±8%)
    val data = (1 to 2000).map(i => (s"g$i", i.toLong)).toDF("grp", "id")
    val n = Sampling.groupSplit(data, col("grp"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("train") > 2000 * 0.72 && n("train") < 2000 * 0.88, n.toString)
    assert(n("val") > 2000 * 0.05 && n("val") < 2000 * 0.15, n.toString)
    assert(n("test") > 2000 * 0.05 && n("test") < 2000 * 0.15, n.toString)
  }

  test("mixtureSample tames the head stratum and boosts the tail") {
    val kept = Sampling.mixtureSample(docs, "lang", col("doc_id"), budgetRows = 200)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt temperature: the head's keep RATE must drop below the tail's
    val headRate = kept("en").toDouble / full("en")
    val tailRate = kept.filter(_._1 != "en").map { case (l, k) =>
      k.toDouble / full(l)
    }
    assert(tailRate.forall(_ > headRate),
      s"alpha=0.5 must downsample the head hardest: en=$headRate vs $tailRate")
    // rates derive from integer arithmetic → exact reproducibility
    val again = Sampling.mixtureSample(docs, "lang", col("doc_id"), budgetRows = 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == Sampling.mixtureSample(docs, "lang", col("doc_id"), 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("mixtureSample honors the budget in expectation and the zero edge") {
    assert(Sampling.mixtureSample(docs, "lang", col("doc_id"), 0L).count() == 0)
    val n = Sampling.mixtureSample(docs, "lang", col("doc_id"), 200L).count()
    assert(n > 200 * 0.75 && n < 200 * 1.25, s"kept $n for budget 200")
    // a budget at/above the corpus keeps everything (rate folds to 2^16)
    val all = docs.count()
    assert(Sampling.mixtureSample(docs, "lang", col("doc_id"), all * 2).count() == all)
  }

  test("mixtureEpochs upsamples the tail with repeats and respects the cap") {
    val out = Sampling.mixtureEpochs(docs, "lang", col("doc_id"),
      budgetRows = 1000, maxEpochs = 4)
    // epoch indexes are dense 0..copies-1 per doc
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
      .collect()
    assert(perDoc.forall(r => r.getLong(3) == 0L && r.getLong(2) == r.getLong(1) - 1))
    assert(perDoc.forall(_.getLong(1) <= 4L), "maxEpochs cap")
    // total lands near the budget
    val n = out.count()
    assert(n > 750 && n < 1250, s"emitted $n rows for budget 1000")
    // tail languages repeat more than the head in EXPECTATION (mean epochs)
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val emitted = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val headRate = emitted("en").toDouble / full("en")
    assert(full.keys.filter(_ != "en")
      .forall(l => emitted(l).toDouble / full(l) > headRate),
      s"tail must out-repeat the head: $emitted vs $full")
  }

  test("mixtureEpochs edges: zero budget empties, downsampling budget never repeats") {
    assert(Sampling.mixtureEpochs(docs, "lang", col("doc_id"), 0L).count() == 0)
    val small = Sampling.mixtureEpochs(docs, "lang", col("doc_id"), 100L)
    assert(small.agg(max("epoch")).head.getLong(0) == 0L,
      "a sub-corpus budget must only downsample")
    // deterministic: identical multiset on re-run
    val a = Sampling.mixtureEpochs(docs, "lang", col("doc_id"), 1000L)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.mixtureEpochs(docs, "lang", col("doc_id"), 1000L)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("exactSample: exact size, deterministic, nested under a larger sample") {
    val s100 = Sampling.exactSample(docs, col("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s100.size == 100)
    val s50 = Sampling.exactSample(docs, col("doc_id"), 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // hash-order prefix property: the 50-sample is a subset of the 100-sample
    assert(s50.subsetOf(s100), "smaller exact sample must nest in the larger")
    // n >= corpus keeps everything; n = 0 keeps nothing
    assert(Sampling.exactSample(docs, col("doc_id"), 100000).count() == docs.count())
    assert(Sampling.exactSample(docs, col("doc_id"), 0).count() == 0)
  }

  test("capPerKey keeps exactly min(n, group size) rows per key, deterministically") {
    val capped = Sampling.capPerKey(docs, "lang", "doc_id", 5)
    val sizes = capped.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("∅") -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("∅") -> r.getLong(1)).toMap
    full.foreach { case (k, n) =>
      assert(sizes(k) == math.min(5L, n), s"lang=$k: ${sizes.get(k)} vs full $n")
    }
    val again = Sampling.capPerKey(docs, "lang", "doc_id", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("curriculumBins: equal-mass tiers with quantile_cont boundary semantics") {
    import spark.implicits._
    // scores 1..8, 4 bins: boundaries (n-1)*q interpolation = 2.75 / 4.5
    // / 6.25 → bins {1,2} {3,4} {5,6} {7,8}
    val df = (1 to 8).map(i => (i.toLong, i.toLong)).toDF("id", "score")
    val bins = Sampling.curriculumBins(df, col("score"), 4)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_score"), r.getAs[Long]("max_score"))).toMap
    assert(bins == Map(1 -> ((2L, 1L, 2L)), 2 -> ((2L, 3L, 4L)),
      3 -> ((2L, 5L, 6L)), 4 -> ((2L, 7L, 8L))))
  }

  test("curriculumBins: a score equal to an integer boundary falls in the lower bin") {
    import spark.implicits._
    // [1,2,2,3] median = 2.0 exactly → the 2s are NOT > 2.0 → lower bin
    val df = Seq(1L, 2L, 2L, 3L).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
    val bins = Sampling.curriculumBins(df, col("score"), 2)
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n_docs")).toMap
    assert(bins == Map(1 -> 3L, 2 -> 1L))
  }
}
