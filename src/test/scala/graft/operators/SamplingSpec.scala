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
}
