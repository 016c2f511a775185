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
}
