package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubwordSpec extends SparkSpec {
  import spark.implicits._

  test("learnVocabulary ranks prefixes by count then lexicographically") {
    // 'abc' x3 contributes ab,abc x3; 'abd' x1 contributes ab,abd
    val docs = Seq((1L, "abc abc abc abd")).toDF("doc_id", "text")
    val v = Subword.learnVocabulary(docs, "text", vocabSize = 3, maxLen = 6)
    assert(v == Seq("ab", "abc", "abd"), s"vocab was $v")
  }

  test("pieceCounter is greedy longest-match with single-char fallback") {
    val count = Subword.pieceCounter(Seq("abc", "ab", "cd"), maxLen = 3)
    val out = Seq("abcd", "abx", "zz", "abccd", "a")
      .toDF("w").select(col("w"), count(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("abcd") == 2, "abc + d")        // longest wins over ab|cd
    assert(out("abx") == 2, "ab + x")
    assert(out("zz") == 2, "two fallback chars")
    assert(out("abccd") == 2, "abc + cd")
    assert(out("a") == 1)
  }

  test("subwordTokens weights piece counts by occurrence") {
    // vocab learns 'aa' (from 'aaa' x4: prefixes aa x4, aaa x4 -> tie,
    // 'aa' < 'aaa'); encoding 'aaa' = aaa (whole, len3 prefix in vocab)
    val docs = Seq(("g1", "aaa aaa"), ("g2", "aaa b")).toDF("lang", "text")
    val out = Subword.subwordTokens(docs, "text", "lang", vocabSize = 8, maxLen = 6)
      .orderBy("lang").collect().map(r => (r.getString(0), r.getLong(1)))
    // vocab = {aa, aaa}; 'aaa' -> 1 piece, 'b' -> 1 fallback piece
    assert(out.toSeq == Seq(("g1", 2L), ("g2", 2L)), s"got ${out.toSeq}")
  }

  test("oovReport counts exactly the 1-char fallback pieces") {
    import spark.implicits._
    // vocabulary will learn prefixes of the repeated word "abab" etc.;
    // use a controlled corpus: "ab" dominates → vocab contains "ab".
    val docs = (Seq.fill(10)(("A", "abab")) ++ Seq(("B", "xy"), ("B", "abab")))
      .toDF("src", "text")
    val got = Subword.oovReport(docs, "text", "src", vocabSize = 3, maxLen = 4)
      .orderBy("src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // vocab (top-3 prefixes) = {ab, aba, abab}: "abab" encodes clean;
    // "xy" misses entirely → 2 fallback singles
    val a = got(0); val b = got(1)
    assert(a._1 == "A" && a._3 == 0L && a._4 == 0.0, got.mkString(", "))
    assert(b._1 == "B" && b._3 == 2L, got.mkString(", "))
  }
}
