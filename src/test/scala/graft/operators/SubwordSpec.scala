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

  test("fertilityReport: pieces per word and bytes per piece, null-safe groups") {
    import spark.implicits._
    // vocab = {aa, aaa} (see subwordTokens case); 'aaa' = 1 piece,
    // 'b' = 1 fallback piece. g1: 2 words / 2 pieces / 7 bytes;
    // null group: 2 words ('aaa','b') / 2 pieces / 5 bytes — the
    // null-safe join must keep it.
    val docs = Seq(("g1", "aaa aaa"), (null, "aaa b")).toDF("lang", "text")
    val out = Subword.fertilityReport(docs, "text", "lang", vocabSize = 8,
        maxLen = 6)
      .orderBy(org.apache.spark.sql.functions.asc_nulls_first("lang"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (None, 2L, 5L, 2L, 1.0, 2.5),
      (Some("g1"), 2L, 7L, 2L, 1.0, 3.5)), out.toSeq.toString)
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

  // forced-pair-count dictionary: qz x900, qzx x700, vv x600, vvv x100
  // round 1: (q,z)=1600 beats (z,x)=700, (v,v)=800      -> merge (q,z)
  // round 2: (qz,x)=700 vs (v,v)=800                    -> merge (v,v)
  // round 3: (qz,x)=700 vs (vv,v)=100                   -> merge (qz,x)
  // round 4: only (vv,v)=100                            -> merge (vv,v)
  // round 5: every word is a single symbol              -> early stop
  private def bpeCorpus = {
    val rows = Seq(("qz", 900), ("qzx", 700), ("vv", 600), ("vvv", 100))
    rows.toDF("w", "n")
      .select(explode(sequence(lit(1), col("n"))).as("__i"), col("w"))
      .select(col("w").as("text"))
  }

  test("learnBpeMerges reproduces the hand-computed merge sequence") {
    val m = Subword.learnBpeMerges(bpeCorpus, "text", nMerges = 6)
    assert(m == Seq((1, "q", "z"), (2, "v", "v"), (3, "qz", "x"),
      (4, "vv", "v")), m.toString)
  }

  test("self-pair merges apply leftmost-first non-overlapping") {
    val count = Subword.bpePieceCounter(Seq((1, "v", "v")))
    val out = Seq("vvv", "vvvv", "v", "vv")
      .toDF("w").select(col("w"), count(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("vvv") == 2, "vv + v")
    assert(out("vvvv") == 2, "vv + vv")
    assert(out("v") == 1)
    assert(out("vv") == 1)
  }

  test("bpeTokens weights encoded piece counts by occurrence") {
    val labeled = bpeCorpus.withColumn("src",
      when(col("text").startsWith("q"), "A").otherwise("B"))
    val got = Subword.bpeTokens(labeled, "text", "src", nMerges = 6)
      .orderBy("src")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // qz -> [qz] x900, qzx -> [qzx] x700; vv -> [vv] x600, and vvv -> [vvv]
    // x100 (merge 4 = (vv, v) collapses it at encode time)
    assert(got == Map("A" -> 1600L, "B" -> 700L), got.toString)
  }
}
