package graft.queries

import graft.{QueryDef, Tables}
import graft.aql.{AqlCompiler, AqlJson, Catalog, TableDef}
import graft.functions.{Geo, Hll}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gate queries for the custom function surface: HLL distinct-count
  * aggregation (§2.4), the geo intersection join-as-filter (§2.3), and the
  * per-row timezone join (§2.3). HLL values are engine-specific, so those
  * entries emit exact pinnable values plus in-query tolerance/invariant
  * flags the DuckDB oracle asserts; bitwise exactness lives in HllSpec.
  */
object FunctionQueries {

  /** Test shapes: lat/lng rectangles with bounds chosen off the synthetic
    * point lattice (x.25/x.75 vs point x.5) so no point sits on an edge.
    */
  val shapes: Seq[(Int, Seq[Seq[Seq[Double]]])] = Seq(
    (1, Seq(Seq(Seq(-89.75, -150.25), Seq(-89.75, -60.25), Seq(-30.25, -60.25),
      Seq(-30.25, -150.25), Seq(-89.75, -150.25)))),
    (2, Seq(Seq(Seq(-30.25, -60.25), Seq(-30.25, 10.25), Seq(20.25, 10.25),
      Seq(20.25, -60.25), Seq(-30.25, -60.25)))),
    (3, Seq(Seq(Seq(-20.25, -179.75), Seq(-20.25, -100.25), Seq(60.25, -100.25),
      Seq(60.25, -179.75), Seq(-20.25, -179.75)))))

  private def geoOracleRect(id: Int, latLo: Double, latHi: Double,
      lngLo: Double, lngHi: Double): String =
    s"""SELECT $id AS shape_id, CAST(COUNT(*) FILTER (
       |  lat > $latLo AND lat < $latHi AND lng > $lngLo AND lng < $lngHi
       |) AS BIGINT) AS cnt FROM pts""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // countDistinctHLL(x): the estimate itself is engine-specific, so the
    // gate emits the EXACT distinct count (oracle-checkable) plus an
    // in-query ±2% tolerance flag comparing the HLL estimate against it —
    // a hash-matchable accuracy assertion instead of a rows-only check.
    QueryDef("q_hll_count_distinct",
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS hll_within_2pct
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      val exact = count_distinct(col("user_id"))
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(exact.as("exact_users"),
          (abs(Hll.hllEstimate(col("user_id")) - exact) <= exact * 0.02)
            .as("hll_within_2pct"))
        .orderBy("event_type")
    },

    // two-level sketch → merge, the broker's partial/final HLL algebra:
    // register-max merge of per-day sketches must reproduce the single-pass
    // estimate EXACTLY (same registers), and stay within ±2% of exact.
    QueryDef("q_hll_sketch_merge",
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS merge_matches_direct, TRUE AS hll_within_2pct
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val merged = ev
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(Hll.hllSketch(col("user_id")).as("sketch"))
        .groupBy("event_type")
        .agg(Hll.hllMergeEstimate(col("sketch")).as("merged_est"))
      val direct = ev.groupBy("event_type")
        .agg(Hll.hllEstimate(col("user_id")).as("direct_est"),
          count_distinct(col("user_id")).as("exact_users"))
      merged.join(direct, "event_type")
        .select(col("event_type"), col("exact_users"),
          (col("merged_est") === col("direct_est")).as("merge_matches_direct"),
          (abs(col("merged_est") - col("exact_users")) <=
            col("exact_users") * 0.02).as("hll_within_2pct"))
        .orderBy("event_type")
    },

    // get_hll_value(x): precomputed register column (hll() fast path
    // input). Register values are hash-specific, but the packed layout is
    // checkable: index = reg & 0xFFFF < 2^14, rho = reg >> 16 in [1, 51]
    // (p=14 leaves 50 hash bits + 1), one non-null register per non-null
    // input. The oracle pins the row count and asserts the layout flags.
    QueryDef("q_hll_value_column",
      """SELECT CAST(COUNT(user_id) AS BIGINT) AS n_regs,
        |  TRUE AS index_in_range, TRUE AS rho_in_range
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(Hll.getHllValue(col("user_id")).as("reg"))
        .agg(count(col("reg")).as("n_regs"),
          min(col("reg").bitwiseAND(0xFFFF) < 16384).as("index_in_range"),
          (min(shiftright(col("reg"), 16)) >= 1 &&
            max(shiftright(col("reg"), 16)) <= 51).as("rho_in_range"))
    },

    // geo join: point-in-polygon against ≤100 broadcast shapes, counted per
    // shape (the reference's join→filter conversion, aql_compiler.go:199-266)
    QueryDef("q_geo_intersects",
      """WITH pts AS (
        |  SELECT (CAST(l_suppkey * 7 AS BIGINT) % 180) - 90 + 0.5 AS lat,
        |         (CAST(l_partkey AS BIGINT) % 360) - 180 + 0.5 AS lng
        |  FROM lineitem)
        |SELECT * FROM (
        |""".stripMargin +
        geoOracleRect(1, -89.75, -30.25, -150.25, -60.25) + "\nUNION ALL\n" +
        geoOracleRect(2, -30.25, 20.25, -60.25, 10.25) + "\nUNION ALL\n" +
        geoOracleRect(3, -20.25, 60.25, -179.75, -100.25) +
        "\n) ORDER BY shape_id NULLS FIRST") { (s, d) =>
      import s.implicits._
      val pts = Tables.lineitem(s, d).select(
        ((col("l_suppkey") * 7) % 180 - 90 + 0.5).cast(DoubleType).as("lat"),
        (col("l_partkey") % 360 - 180 + 0.5).cast(DoubleType).as("lng"))
      // shapes baked into the UDF closure: one evaluation per point, all
      // matching shape ids at once (join semantics via explode)
      val matcher = Geo.matchingShapes(shapes.map { case (id, sh) =>
        (id.toString, sh.map(_.map(p => (p(0), p(1)))))
      })
      val matched = pts
        .select(explode(matcher(col("lat"), col("lng"))).as("sid"))
        .groupBy("sid").agg(count(lit(1)).as("cnt"))
      shapes.map(_._1.toString).toDF("sid")
        .join(matched, Seq("sid"), "left_outer")
        .select(col("sid").cast("int").as("shape_id"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("shape_id")
    },

    // GeoPoint literal coercion (query_context_helper.go:317-334 +
    // data_type.go GeoPointFromString): `loc = 'Point(lng,lat)'` parses
    // the WKT-ish literal into a (lat,lng) point value — full AQL path
    // over a catalog declaring the column's GeoPoint type; the oracle
    // restates the point equality on the generating columns
    QueryDef("q_geo_point_literal",
      """SELECT CAST(COUNT(*) AS BIGINT) AS value FROM lineitem
        |WHERE l_suppkey % 10 = 3 AND l_partkey % 20 = 5""".stripMargin) { (s, d) =>
      val pts = Tables.lineitem(s, d).select(
        struct(((col("l_suppkey") % 10) + lit(0.5)).cast(DoubleType).as("lat"),
          ((col("l_partkey") % 20) + lit(0.5)).cast(DoubleType).as("lng")).as("loc"))
      val cat = Catalog(Map("geo_pts" -> TableDef("geo_pts", isFact = false,
        columnTypes = Map("loc" -> "GeoPoint"), load = _ => pts)))
      // WKT order is (lng, lat): lng 5.5 ↔ l_partkey%20=5, lat 3.5 ↔ l_suppkey%10=3
      new AqlCompiler(cat, s).compile(AqlJson.parseQuery("""{
        "table": "geo_pts",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "rowFilters": ["loc = 'Point(5.5, 3.5)'"]
      }""")).df
    },

    // UUID literal coercion (data_type.go UUIDFromString): equality
    // normalizes case and dashes — stored UPPERCASE-dashed text matches a
    // lowercase dash-less literal
    QueryDef("q_uuid_eq",
      """SELECT CAST(COUNT(*) AS BIGINT) AS value FROM orders
        |WHERE md5(CAST(o_orderkey AS VARCHAR)) = 'eccbc87e4b5ce2fe28308fd9f2a7baf3'""".stripMargin) { (s, d) =>
      val h = md5(col("o_orderkey").cast(StringType))
      val rows = Tables.orders(s, d).select(upper(concat_ws("-",
        substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
        substring(h, 17, 4), substring(h, 21, 12))).as("trace_uuid"))
      val cat = Catalog(Map("traces" -> TableDef("traces", isFact = false,
        columnTypes = Map("trace_uuid" -> "UUID"), load = _ => rows)))
      new AqlCompiler(cat, s).compile(AqlJson.parseQuery("""{
        "table": "traces",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "rowFilters": ["trace_uuid = 'eccbc87e4b5ce2fe28308fd9f2a7baf3'"]
      }""")).df
    },

    // per-row timezone join (the reference's auto-appended timezone-table
    // join, aql_compiler.go:439-465): offset comes from a dimension row
    QueryDef("q_tz_join",
      """SELECT CAST(hour(ts + to_hours(n_nationkey % 25 - 12)) AS INT) AS local_hour,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events LEFT JOIN nation ON n_nationkey = user_id % 25
        |GROUP BY 1 ORDER BY local_hour NULLS FIRST""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val na = Tables.nation(s, d)
      ev.join(broadcast(na), na("n_nationkey") === ev("user_id") % 25, "left_outer")
        .withColumn("local_ts", col("ts") + make_interval(
          lit(0), lit(0), lit(0), lit(0), col("n_nationkey") % 25 - 12))
        .groupBy(hour(col("local_ts")).as("local_hour"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("local_hour")
    }
  )
}
