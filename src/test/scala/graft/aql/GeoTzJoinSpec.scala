package graft.aql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQL geo join (join→filter conversion with the reference's constraint
  * surface, aql_compiler.go:199-266) and the timezone-table join
  * (timezone(column), aql_compiler.go:439-465). Fixtures in memory.
  */
class GeoTzJoinSpec extends SparkSpec {
  import spark.implicits._

  // rides at known coordinates; loc = struct(lat, lng)
  private lazy val rides = Seq(
    (1L, 0.5, 0.5),   // inside f1
    (2L, 0.6, 0.4),   // inside f1
    (3L, 10.5, 10.5), // inside f2
    (4L, 50.0, 50.0), // inside neither
    (5L, 20.5, 20.5)  // inside f3 (not selected by the geo filter)
  ).toDF("ride_id", "lat", "lng")
    .select(col("ride_id"), struct(col("lat"), col("lng")).as("loc"))

  // unit squares as single-ring shapes: ring of [lat, lng] points
  private def square(lat0: Double, lng0: Double) =
    Seq(Seq(Seq(lat0, lng0), Seq(lat0 + 1, lng0), Seq(lat0 + 1, lng0 + 1),
      Seq(lat0, lng0 + 1)))

  private lazy val geofences = Seq(
    ("f1", square(0, 0)),
    ("f2", square(10, 10)),
    ("f3", square(20, 20))
  ).toDF("fence_id", "shape")

  private def geoCatalog = Catalog(Map(
    "rides" -> TableDef("rides", isFact = false, load = _ => rides),
    "geofences" -> TableDef("geofences", isFact = false,
      primaryKey = Seq("fence_id"), load = _ => geofences)))

  private def compile(json: String) =
    new AqlCompiler(geoCatalog, spark).compile(AqlJson.parseQuery(json))

  test("geo join converts to point-in-polygon filter + shape dimension") {
    val df = compile("""{
      "table": "rides",
      "joins": [{"table": "geofences", "alias": "g",
                 "conditions": ["geography_intersects(g.shape, rides.loc)"]}],
      "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
      "dimensions": [{"alias": "fence", "sqlExpression": "g.fence_id"}],
      "rowFilters": ["g.fence_id in ('f1', 'f2')"]
    }""").df
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("f1" -> 2, "f2" -> 1)) // f3 filtered out, ride 4 matches nothing
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "shape set must broadcast")
  }

  test("geo constraint surface: missing geo filter, >100 shapes, non-string ids, measures") {
    // no geo filter at all
    intercept[ParseException](compile("""{
      "table": "rides",
      "joins": [{"table": "geofences",
                 "conditions": ["geography_intersects(geofences.shape, rides.loc)"]}],
      "measures": [{"sqlExpression": "count(*)"}]
    }""").df.collect())
    // more than GeoShapeLimit shapes
    val tooMany = (1 to 101).map(i => s"'f$i'").mkString(", ")
    intercept[ParseException](compile(s"""{
      "table": "rides",
      "joins": [{"table": "geofences", "alias": "g",
                 "conditions": ["geography_intersects(g.shape, rides.loc)"]}],
      "measures": [{"sqlExpression": "count(*)"}],
      "rowFilters": ["g.fence_id in ($tooMany)"]
    }"""))
    // numeric shape ids rejected
    intercept[ParseException](compile("""{
      "table": "rides",
      "joins": [{"table": "geofences", "alias": "g",
                 "conditions": ["geography_intersects(g.shape, rides.loc)"]}],
      "measures": [{"sqlExpression": "count(*)"}],
      "rowFilters": ["g.fence_id in (1, 2)"]
    }"""))
    // geo fields banned from measures
    intercept[ParseException](compile("""{
      "table": "rides",
      "joins": [{"table": "geofences", "alias": "g",
                 "conditions": ["geography_intersects(g.shape, rides.loc)"]}],
      "measures": [{"sqlExpression": "count(g.fence_id)"}],
      "rowFilters": ["g.fence_id = 'f1'"]
    }"""))
  }

  // ---- timezone-table join ------------------------------------------------

  // two cities, same UTC instants: NY is UTC-5 in January
  private val T0 = 1704672000L // 2024-01-08T00:00:00Z
  private lazy val checkins = Seq(
    (1L, T0 + 3600, 1L),  // 01:00 UTC -> 20:00 NY (prev day)
    (2L, T0 + 3600, 2L),  // 01:00 UTC -> 01:00 UTC
    (3L, T0 + 7200, 1L),  // 02:00 UTC -> 21:00 NY
    (4L, T0 + 7200, 2L)
  ).toDF("id", "t", "city_id")

  private lazy val cityTz = Seq(
    (1L, "America/New_York"),
    (2L, "UTC")
  ).toDF("city_id", "tz")

  private def tzCatalog = Catalog(
    Map(
      "checkins" -> TableDef("checkins", isFact = true, Some("t"), load = _ => checkins),
      "city_tz" -> TableDef("city_tz", isFact = false,
        primaryKey = Seq("city_id"), load = _ => cityTz)),
    timezoneTable = Some(TimezoneTableDef("city_tz", "tz")))

  test("timezone(column) joins the timezone table and shifts buckets per row") {
    val df = new AqlCompiler(tzCatalog, spark).compile(AqlJson.parseQuery(s"""{
      "table": "checkins",
      "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
      "dimensions": [{"alias": "h", "sqlExpression": "t", "timeBucketizer": "hour"}],
      "timeFilter": {"from": "${T0 - 86400}", "to": "${T0 + 86400}"},
      "timezone": "timezone(city_id)",
      "now": ${T0 + 86400}
    }""")).df
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NY rows land on local 20:00/21:00 of Jan 7 (shifted epoch = t - 5h);
    // UTC rows stay on 01:00/02:00 of Jan 8
    assert(got == Map(
      (T0 - 14400) -> 1L, // 2024-01-07T20:00 NY as local epoch
      (T0 - 10800) -> 1L, // 2024-01-07T21:00 NY
      (T0 + 3600) -> 1L,
      (T0 + 7200) -> 1L))
  }
}
