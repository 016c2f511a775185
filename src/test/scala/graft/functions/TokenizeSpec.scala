package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The single-pass [[Tokenize]] kernels must equal their regex
  * formulations exactly — values AND schema — because the DuckDB
  * oracles replay the regex spelling, and every text operator keys off
  * `TextOps.tokens`. The tricky Java-split edges are pinned explicitly:
  * leading/trailing empty tokens, whitespace-only input, `trim`
  * stripping 0x20 only, vertical tab being Java-`\s`, and multi-byte
  * UTF-8 (incl. surrogate pairs) tokenizing per code point in the
  * BPE-ish walk.
  */
class TokenizeSpec extends SparkSpec {

  private def bothForms(values: Seq[String]): Unit = {
    import spark.implicits._
    val df = values.toDF("text")
    val sel = df.select(
      TextOps.tokens(col("text")).as("ws_fast"),
      TextOps.tokensRegex(col("text")).as("ws_regex"),
      TextOps.bpeishTokens(col("text")).as("bp_fast"),
      TextOps.bpeishTokensRegex(col("text")).as("bp_regex"))
    // schema parity: same element type and containsNull as the builtins
    val f = sel.schema.fields
    assert(f(0).dataType == f(1).dataType,
      s"ws schema mismatch: ${f(0).dataType} vs ${f(1).dataType}")
    assert(f(2).dataType == f(3).dataType,
      s"bpeish schema mismatch: ${f(2).dataType} vs ${f(3).dataType}")
    sel.collect().zip(values).foreach { case (r, in) =>
      val show = in.take(80).replace("\n", "\\n").replace("\t", "\\t")
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"ws mismatch for '$show': ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"bpeish mismatch for '$show': ${r.getSeq[String](2)} vs ${r.getSeq[String](3)}")
    }
  }

  test("edge cases: empties, leading/trailing ws, vtab, unicode, runs") {
    bothForms(Seq(
      "", " ", "   ", "\t", "\t\n\u000b\f\r", "hello world",
      "  leading spaces", "trailing spaces  ", " both ",
      "\tleading tab", "trailing tab\t", "\ttab both\t",
      "a\tb\nc\u000bd\fe\rf", "many     spaces   between    words",
      "one", "..!!..", "a.b,c;d", "camelCase PascalCase snake_case",
      "digits123mixed456", "42", "3.14159", "x>=y && a||b",
      "ünïcödé ÉTÉ İstanbul ΣΙΣΥΦΟΣ", "中文 分词 测试",
      "emoji 😀 and 🎉🎊 pairs", "mixed中abc文123",
      "a" * 5000, ("word " * 500).trim, "\u00a0nbsp is not java ws\u00a0"))
  }

  test("property: byte-walk kernels equal the regex formulations") {
    val pieceGen = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      3 -> Gen.oneOf(" ", "\t", "\n", "\u000b", "\f", "\r", ".", ",", "!", "-", "_"),
      1 -> Gen.oneOf("\u00c4", "\u00e9", "\u03c2", "\u4e2d", "\u00a0", "\ud83d\ude00"))
    // surrogate pairs are generated as complete PAIRS (the emoji piece)
    // so every string is well-formed UTF-16 and the regex baseline (which
    // operates on the decoded String) and the byte walk see the same bytes
    val strGen = Gen.listOf(pieceGen).map(_.mkString)
    val batch = Gen.listOfN(60, strGen)
    (0 until 20).foreach { i =>
      bothForms(batch.pureApply(Gen.Parameters.default, Seed(0x70C3L + i)))
    }
  }

  test("surrogate pairs are one bpeish token each") {
    import spark.implicits._
    val df = Seq("\ud83d\ude00\ud83c\udf89 hi").toDF("text")
    val r = df.select(TextOps.bpeishTokens(col("text")).as("t"),
      TextOps.bpeishTokensRegex(col("text")).as("r")).head()
    assert(r.getSeq[String](0) == Seq("\ud83d\ude00", "\ud83c\udf89", "hi"))
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }

  test("null passes through as null") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("x y")).toDF("text")
    val out = df.select(TextOps.tokens(col("text")),
      TextOps.bpeishTokens(col("text"))).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getSeq[String](0) == Seq("x", "y"))
  }
}
