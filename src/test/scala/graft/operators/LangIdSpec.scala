package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // three "languages" with disjoint character distributions
  private val labeled = Seq(
    (1L, "aaa bbb aab aba abba baab", "aa"),
    (2L, "aab aab abb aaa bba abab", "aa"),
    (3L, "xxx yyy xxy xyx xyyx yxxy", "xy"),
    (4L, "xyy xyx yyx xxx yxy xyxy", "xy"),
    (5L, "123 321 112 233 1221 3112", "nm"),
    (6L, "221 131 323 121 3232 1123", "nm")).toDF("doc_id", "text", "lang")

  test("profiles are bounded and rank-deterministic") {
    val p = LangId.profiles(labeled, "text", "lang", k = 10)
    val rows = p.collect()
    assert(rows.length <= 30)
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.keySet == Set("aa", "xy", "nm"))
    byLang.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
    }
    // deterministic across recomputation
    val again = LangId.profiles(labeled, "text", "lang", k = 10)
      .orderBy("lang", "rl").collect().toSeq
    assert(p.orderBy("lang", "rl").collect().toSeq == again)
  }

  test("unlabeled documents predict their character distribution") {
    val prof = LangId.profiles(labeled, "text", "lang", k = 50)
    val unlabeled = Seq(
      (10L, "abab baba aabb abba", null.asInstanceOf[String]),
      (11L, "yxyx xyxy yxx xxy", null.asInstanceOf[String]),
      (12L, "1212 2121 311 223", null.asInstanceOf[String]),
      (13L, "zq", null.asInstanceOf[String])) // too short after norm? len 2 -> no trigram
      .toDF("doc_id", "text", "lang")
    val got = LangId.predict(unlabeled, "doc_id", "text", prof)
      .select("doc_id", "predicted_lang").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((10L, "aa"), (11L, "xy"), (12L, "nm"), (13L, "und")))
  }

  test("labeled corpus self-classifies (sanity) and ties break by language") {
    val prof = LangId.profiles(labeled, "text", "lang", k = 50)
    val got = LangId.predict(labeled, "doc_id", "text", prof)
      .select("lang", "predicted_lang").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"doc labeled ${r.getString(0)} predicted ${r.getString(1)}"))
    // a doc equally distant from two profiles lands on the lexicographically
    // smaller language — pin the tie-break with an empty-overlap doc whose
    // every gram misses every profile (all distances = docGrams * penalty)
    val alien = Seq((20L, "qqq www qqww wwqq", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    val p = LangId.predict(alien, "doc_id", "text", prof)
      .select("predicted_lang").head().getString(0)
    assert(p == "aa") // min lang name among equal distances
  }
}
