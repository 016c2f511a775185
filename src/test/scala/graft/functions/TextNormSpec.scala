package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The single-pass [[TextNorm]] kernel must equal the two-regex
  * formulation byte for byte — the DuckDB oracles replay the regex
  * spelling, so any divergence is a silent gate mismatch.
  */
class TextNormSpec extends SparkSpec {

  private def bothForms(values: Seq[String]): Unit = {
    import spark.implicits._
    val df = values.toDF("text")
    val rows = df.select(
        TextOps.normalizeText(col("text")).as("fast"),
        TextOps.normalizeTextRegex(col("text")).as("regex"))
      .collect()
    rows.zip(values).foreach { case (r, in) =>
      assert(r.getAs[String]("fast") == r.getAs[String]("regex"),
        s"mismatch for input ${in.take(80).replace("\n", "\\n")}: " +
          s"fast='${r.getAs[String]("fast")}' regex='${r.getAs[String]("regex")}'")
    }
  }

  test("edge cases: empty, whitespace-only, punctuation, unicode, case, runs") {
    bothForms(Seq(
      "", " ", "\t\n\f\r", "hello world", "  Hello,   WORLD!!  ",
      "a\tb\nc\fd\re", "....", "ünïcödé ÉTÉ İstanbul ΣΙΣΥΦΟΣ",
      "KK kelvin sign", "emoji 😀 mixed 123", "a" * 5000,
      "MiXeD CaSe 42 withvertical tab", "trailing space ",
      " leading", "many     spaces   between    words",
      "digits0123456789 and UPPER", "ß sharp s", "Àà accents"))
  }

  test("property: single-pass normalize equals the regex formulation") {
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', '\f', '\r', '.', ',', '!', '-', '_'),
      1 -> Gen.oneOf('Ä', 'é', 'ς', '中', '', ' ', 'K'))
    val batch = Gen.listOfN(60, Gen.listOf(charGen).map(_.mkString))
    (0 until 20).foreach { i =>
      bothForms(batch.pureApply(Gen.Parameters.default, Seed(0x7E47L + i)))
    }
  }

  test("null passes through as null") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("x")).toDF("text")
    val out = df.select(TextOps.normalizeText(col("text"))).collect()
    assert(out(0).isNullAt(0) && out(1).getString(0) == "x")
  }
}
