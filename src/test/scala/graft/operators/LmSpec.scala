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
}
