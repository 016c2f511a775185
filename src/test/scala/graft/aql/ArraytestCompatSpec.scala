package graft.aql

import scala.io.Source

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Compat suite: the reference's array integration queries
  * (integration/test-data/queries/array_query_{length,contains,elementat}.aql)
  * parsed VERBATIM and executed through the front end over an
  * arraytest-shaped fixture (schema integration/test-data/schema/
  * arraytest.json) built with the reference generator's exact array rules
  * (examples/utils/example_utils.go:101-164): arraySize cycles j%5 per
  * row — 0 → null array, k → items index 1..k-1 with value itemNo*10 and
  * item 3 null. So int arrays cycle: null, [], [10], [10,20], [10,20,null].
  */
class ArraytestCompatSpec extends SparkSpec {

  private val QueriesDir = "/root/reference/integration/test-data/queries"
  private val NowEpoch = 1706659200L

  // 5 rows inside the "24 hours ago" window + 5 older rows ({time-2d})
  // that the time filter must exclude
  private def intArray(j: Int): Seq[Integer] = j % 5 match {
    case 0 => null
    case k => (1 until k).map(i => if (i == 3) null.asInstanceOf[Integer]
      else Integer.valueOf(i * 10))
  }

  private lazy val arraytest: DataFrame = {
    import spark.implicits._
    val rows = (0 until 10).map { j =>
      val at = if (j < 5) NowEpoch - 43200 + j else NowEpoch - 36 * 3600 + j
      (at, j.toLong, intArray(j), intArray(j))
    }
    rows.toDF("request_at", "row_id", "array_int16", "array_int32")
  }

  private def catalog = Catalog(Map(
    "arraytest" -> TableDef("arraytest", isFact = true, Some("request_at"),
      load = _ => arraytest)))

  private def runAql(file: String): Array[org.apache.spark.sql.Row] = {
    val src = Source.fromFile(s"$QueriesDir/$file")
    val json = try src.mkString finally src.close()
    val q = AqlJson.parseRequest(json).queries.head.copy(now = Some(NowEpoch))
    new AqlCompiler(catalog, spark).compile(q).df.collect()
  }

  test("array_query_length.aql: day bucket x array length, null array -> null dim") {
    val got = runAql("array_query_length.aql")
      .map(r => (if (r.isNullAt(1)) -1 else r.getInt(1)) -> r.getLong(2)).toMap
    // in-window rows have lengths null, 0, 1, 2, 3 — one each
    assert(got == Map(-1 -> 1L, 0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("array_query_contains.aql: contains(array_int16, 20)") {
    val got = runAql("array_query_contains.aql")
    // [10,20] and [10,20,null] match; older rows excluded by the time filter
    assert(got.length == 1 && got.head.getLong(1) == 2L)
  }

  test("array_query_elementat.aql: element_at(array_int16, 0) = 10 (0-based)") {
    val got = runAql("array_query_elementat.aql")
    // [10], [10,20], [10,20,null] have element 0 == 10
    assert(got.length == 1 && got.head.getLong(1) == 3L)
  }
}
