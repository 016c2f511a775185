package graft.aql

import scala.io.Source

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Compat suite: the reference's OWN example AQL files
  * (total_trips.aql / total_fare.aql under
  * /root/reference/examples/1k_trips/queries) parsed and executed through
  * our front end over a trips-shaped fixture built from the example's CSV
  * (examples/1k_trips/data/trips.csv; schema trips.json).
  *
  * The CSV's `{1d}` request_at placeholder means "random instant within the
  * last day" (examples/utils/example_utils.go:40-55); the fixture resolves
  * it DETERMINISTICALLY (row-index hash spread over the day) against a
  * pinned now, and `now` is injected into the parsed query (the
  * AQLQuery.Now override, query/common/aql.go:141-142). Expected results
  * are computed with a plain Scala fold over the same rows — no Spark — so
  * the assertion crosses engines.
  */
class Trips1kCompatSpec extends SparkSpec {

  private val QueriesDir = "/root/reference/examples/1k_trips/queries"
  private val TripsCsv = "/root/reference/examples/1k_trips/data/trips.csv"

  private val NowEpoch = 1706659200L // 2024-01-31T00:00:00Z

  // (request_at, uuid, city_id, status, fare)
  private lazy val trips: Seq[(Long, String, Int, String, Float)] = {
    val src = Source.fromFile(TripsCsv)
    try {
      src.getLines().drop(1).zipWithIndex.map { case (line, i) =>
        val f = line.split(",")
        // deterministic stand-in for the example's random spread in [now-1d, now)
        val at = NowEpoch - 86400 + ((i.toLong * 7919) % 86400)
        (at, f(1), f(2).toInt, f(3), f(4).toFloat)
      }.toVector
    } finally src.close()
  }

  private lazy val tripsDf: DataFrame = {
    import spark.implicits._
    trips.toDF("request_at", "uuid", "city_id", "status", "fare")
  }

  private def tripsCatalog = Catalog(Map(
    "trips" -> TableDef("trips", isFact = true, Some("request_at"),
      primaryKey = Seq("uuid"), load = _ => tripsDf)))

  private def runAql(file: String): DataFrame = {
    val src = Source.fromFile(s"$QueriesDir/$file")
    val json = try src.mkString finally src.close()
    val q = AqlJson.parseRequest(json).queries.head.copy(now = Some(NowEpoch))
    new AqlCompiler(tripsCatalog, spark).compile(q).df
  }

  // "24 hours ago" -> hour-aligned now-24h; "this quarter-hour" end > now
  private val From = NowEpoch - 86400

  test("total_trips.aql: completed-trip counts per hour") {
    val got = runAql("total_trips.aql").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = trips
      .filter(t => t._4 == "completed" && t._1 >= From)
      .groupBy(t => t._1 - t._1 % 3600)
      .view.mapValues(_.size.toLong).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("total_fare.aql: completed-trip fare sums per hour") {
    val got = runAql("total_fare.aql").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = trips
      .filter(t => t._4 == "completed" && t._1 >= From)
      .groupBy(t => t._1 - t._1 % 3600)
      .view.mapValues(_.map(_._5.toDouble).sum).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-6 * math.max(1.0, expected(k).abs),
        s"bucket $k: $v vs ${expected(k)}")
    }
  }

  test("total_trips.sql: the SQL twin produces the same result as the AQL form") {
    // the reference's SQL file wraps the statement in {"queries": ["..."]}
    val src = Source.fromFile(s"$QueriesDir/total_trips.sql")
    val json = try src.mkString finally src.close()
    val stmts = org.json4s.jackson.JsonMethods.parse(json) \ "queries"
    val sql = stmts.children.head.values.toString
    val sqlDf = SqlFront.compile(sql, tripsCatalog, spark, now = Some(NowEpoch)).df
    val sqlRes = sqlDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val aqlRes = runAql("total_trips.aql").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // the SQL twin buckets in America/New_York (UTC-5 across the Jan
    // fixture, a whole-hour offset): same row groups, labels shifted by
    // the offset (shift-then-floor, time_bucketizer.go:72-146)
    assert(sqlRes.map { case (k, v) => (k + 18000) -> v } == aqlRes)
    assert(sqlRes.nonEmpty)
  }
}
