package graft.aql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Array function edge semantics per the reference's functors
  * (functor.hpp:519-573; array item nulls per data_type.go:585-616,
  * exercised by integration/test-data/queries/array_query_*.aql):
  * 0-based indexing, negative index from the end, out-of-range -> null,
  * null items preserved.
  */
class ArrayFuncSpec extends SparkSpec {
  import spark.implicits._

  private def eval(text: String, df: org.apache.spark.sql.DataFrame) =
    df.select(ExprCompiler.compile(ExprParser.parse(text),
      ExprCompiler.Ctx(col(_))).as("r"))

  private lazy val arrs = Seq(
    (1L, Seq[Integer](10, 20, null, 40)),
    (2L, Seq[Integer](5)),
    (3L, Seq.empty[Integer])
  ).toDF("id", "arr")

  test("element_at is 0-based with null items and null out-of-range") {
    assert(eval("element_at(arr, 0)", arrs).collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(10), Some(5), None))
    assert(eval("element_at(arr, 2)", arrs).collect().map(r => Option(r.get(0))).toSeq ==
      Seq(None, None, None)) // null item, out-of-range, empty
    assert(eval("element_at(arr, 3)", arrs).collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(40), None, None))
  }

  test("negative index counts from the end") {
    assert(eval("element_at(arr, -1)", arrs).collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(40), Some(5), None))
    assert(eval("element_at(arr, -4)", arrs).collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(10), None, None))
    assert(eval("element_at(arr, -5)", arrs).collect().map(r => Option(r.get(0))).toSeq ==
      Seq(None, None, None))
  }

  test("length and contains") {
    assert(eval("length(arr)", arrs).collect().map(_.getInt(0)).toSeq == Seq(4, 1, 0))
    assert(eval("contains(arr, 20)", arrs).collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, false, false))
  }
}
