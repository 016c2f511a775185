package graft.aql

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** End-to-end AQL → DataFrame compilation over the testdata catalog.
  * Each compiled result is checked against an equivalent hand-built
  * DataFrame program (the round-1 oracle-verified idiom).
  */
class AqlCompilerSpec extends SparkSpec {

  private def compiler = new AqlCompiler(Catalog.testdata(sfDir), spark)

  // events cover 2024-01-01 .. 2024-01-30 UTC; pin now at Jan 31 midnight
  private val NowEpoch = 1706659200L // 2024-01-31T00:00:00Z

  private def run(json: String) = compiler.compile(AqlJson.parseQuery(json)).df

  test("aggregate query: count(*) with filter + hour bucketizer + time filter") {
    val df = run(s"""{
      "table": "events",
      "measures": [{"sqlExpression": "count(*)",
                    "rowFilters": ["event_type='click'"]}],
      "dimensions": [{"alias": "ts_hour", "sqlExpression": "ts",
                      "timeBucketizer": "hour"}],
      "timeFilter": {"column": "ts", "from": "24 hours ago", "to": "now"},
      "now": $NowEpoch
    }""")
    val expected = Tables.events(spark, sfDir)
      .where(col("ts") >= timestamp_seconds(lit(NowEpoch - 86400)) &&
        col("ts") < timestamp_seconds(lit(NowEpoch)) &&
        col("event_type") === "click")
      .groupBy((unix_timestamp(col("ts")) - pmod(unix_timestamp(col("ts")), lit(3600)))
        .as("ts_hour"))
      .agg(count(lit(1)).as("value"))
    assert(df.columns.toSeq == Seq("ts_hour", "value"))
    assert(df.count() > 0)
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
  }

  test("sum measure over a calendar week bucketizer in a named timezone") {
    val df = run(s"""{
      "table": "events",
      "measures": [{"alias": "total", "sqlExpression": "sum(value)"}],
      "dimensions": [{"alias": "wk", "sqlExpression": "ts", "timeBucketizer": "week"}],
      "timeFilter": {"from": "2024-01-01", "to": "2024-01-28"},
      "timezone": "America/Los_Angeles",
      "now": $NowEpoch
    }""")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("wk", "total"))
    // every bucket label is a Monday 00:00 LA wall-time epoch (shifted epoch % 86400 == 0 and Monday index)
    rows.foreach { r =>
      val wk = r.getLong(0)
      assert(wk % 86400 == 0, s"bucket $wk not midnight-aligned")
      assert(((wk / 86400) + 3) % 7 == 0, s"bucket $wk not a Monday")
    }
  }

  test("non-aggregate projection with limit and wildcard expansion") {
    val df = run(s"""{
      "table": "events",
      "measures": [{"sqlExpression": "1"}],
      "dimensions": [{"sqlExpression": "*"}],
      "timeFilter": {"from": "1704067200", "to": "1706659200"},
      "limit": 7,
      "now": $NowEpoch
    }""")
    assert(df.count() == 7)
    assert(df.columns.toSeq == Tables.events(spark, sfDir).columns.toSeq)
  }

  test("default limit 1000 for non-agg queries") {
    val df = run(s"""{
      "table": "events",
      "measures": [{"sqlExpression": "1"}],
      "dimensions": [{"alias": "uid", "sqlExpression": "user_id"}],
      "timeFilter": {"from": "1704067200"},
      "now": $NowEpoch
    }""")
    assert(df.count() == 1000)
  }

  test("broadcast dimension join (left outer, many-to-one)") {
    val df = run(s"""{
      "table": "lineitem",
      "joins": [{"table": "part", "conditions": ["lineitem.l_partkey = part.p_partkey"]}],
      "measures": [{"alias": "cnt", "sqlExpression": "count(*)"}],
      "dimensions": [{"alias": "brand", "sqlExpression": "part.p_brand"}]
    }""")
    val expected = Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)),
        col("l_partkey") === col("p_partkey"), "left_outer")
      .groupBy(col("p_brand").as("brand")).agg(count(lit(1)).as("cnt"))
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim join must broadcast")
  }

  test("row-filter to time-filter promotion on the fact table") {
    val df = run(s"""{
      "table": "events",
      "measures": [{"alias": "cnt", "sqlExpression": "count(*)"}],
      "rowFilters": ["ts >= 1704585600", "ts < 1704672000"],
      "now": $NowEpoch
    }""")
    val expected = Tables.events(spark, sfDir)
      .where(col("ts") >= timestamp_seconds(lit(1704585600L)) &&
        col("ts") < timestamp_seconds(lit(1704672000L)))
      .count()
    assert(df.collect().head.getLong(0) == expected)
  }

  test("fact table query without time filter is rejected") {
    intercept[ParseException] {
      run("""{
        "table": "events",
        "measures": [{"sqlExpression": "count(*)"}]
      }""")
    }
  }

  test("measure filters AND into the query filters") {
    val df = run(s"""{
      "table": "events",
      "measures": [{"alias": "cnt", "sqlExpression": "count(*)",
                    "rowFilters": ["event_type in ('click','view')", "value > 10"]}],
      "timeFilter": {"from": "1704067200"},
      "now": $NowEpoch
    }""")
    val expected = Tables.events(spark, sfDir)
      .where(col("ts") >= timestamp_seconds(lit(1704067200L)) &&
        col("ts") < timestamp_seconds(lit(NowEpoch)) &&
        col("event_type").isin("click", "view") && col("value") > 10)
      .count()
    assert(df.collect().head.getLong(0) == expected)
  }

  test("countdistincthll measure compiles to the HLL aggregate") {
    val df = run(s"""{
      "table": "events",
      "measures": [{"alias": "users", "sqlExpression": "countDistinctHLL(user_id)"}],
      "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
      "timeFilter": {"from": "1704067200"},
      "now": $NowEpoch
    }""")
    val rows = df.collect()
    assert(rows.length == 5)
    // sf0.001 has ~few hundred distinct users per type: estimate within 2%
    val exact = Tables.events(spark, sfDir)
      .where(col("ts") >= timestamp_seconds(lit(1704067200L)) &&
        col("ts") < timestamp_seconds(lit(NowEpoch)))
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val est = r.getLong(1)
      val ex = exact(r.getString(0))
      assert(math.abs(est - ex) <= math.max(1L, (ex * 0.02).toLong), s"$est vs $ex")
    }
  }

  test("count(distinct x) survives the parser (exact distinct, not count(x))") {
    // regression: the parser used to DROP the distinct keyword, silently
    // compiling count(distinct user_id) as count(user_id)
    val df = run(s"""{
      "table": "events",
      "measures": [{"alias": "users", "sqlExpression": "count(distinct user_id)"}],
      "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
      "timeFilter": {"from": "1704067200"},
      "now": $NowEpoch
    }""")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = Tables.events(spark, sfDir)
      .where(col("ts") >= timestamp_seconds(lit(1704067200L)) &&
        col("ts") < timestamp_seconds(lit(NowEpoch)))
    val exact = base.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = base.groupBy("event_type")
      .agg(count(col("user_id")).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"distinct count wrong: $got vs $exact")
    assert(got != plain, "fixture degenerate: count == count distinct")
    // render→parse round-trip preserves distinct
    val e = ExprParser.parse("count(distinct user_id)")
    assert(e == Expr.Call("countdistinct", Seq(Expr.VarRef("user_id"))))
    assert(ExprParser.parse(Render(e)) == e)
    // distinct is count-only
    assert(intercept[ParseException] { ExprParser.parse("sum(distinct value)") }
      .getMessage.contains("DISTINCT"))
  }

  test("scalar surface: case/in/floor/div inside dimensions") {
    val df = run(s"""{
      "table": "lineitem",
      "measures": [{"alias": "cnt", "sqlExpression": "count(*)"}],
      "dimensions": [
        {"alias": "qbucket", "sqlExpression": "floor(l_quantity, 10)"},
        {"alias": "flag", "sqlExpression": "case when l_discount > 0.05 then 'hi' else 'lo' end"}
      ]
    }""")
    val expected = Tables.lineitem(spark, sfDir)
      .groupBy(
        (col("l_quantity") - pmod(col("l_quantity"), lit(10))).as("qbucket"),
        when(col("l_discount") > 0.05, "hi").otherwise("lo").as("flag"))
      .agg(count(lit(1)).as("cnt"))
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
  }

  test("supporting measures/dimensions inline by alias; derived measure arithmetic") {
    val df = run(s"""{
      "table": "events",
      "supportingMeasures": [
        {"alias": "clicks", "sqlExpression": "sum(case when event_type = 'click' then 1 else 0 end)"},
        {"alias": "total", "sqlExpression": "count(*)"}
      ],
      "supportingDimensions": [
        {"alias": "uid_bucket", "sqlExpression": "floor(user_id, 100)"}
      ],
      "measures": [{"alias": "click_rate", "sqlExpression": "clicks / total"}],
      "dimensions": [{"alias": "ub", "sqlExpression": "uid_bucket"}],
      "timeFilter": {"from": "1704067200"},
      "now": $NowEpoch
    }""")
    val expected = Tables.events(spark, sfDir)
      .where(col("ts") >= timestamp_seconds(lit(1704067200L)) &&
        col("ts") < timestamp_seconds(lit(NowEpoch)))
      .groupBy((col("user_id") - pmod(col("user_id"), lit(100))).as("ub"))
      .agg((sum(when(col("event_type") === "click", 1).otherwise(0)).cast("double") /
        count(lit(1)).cast("double")).as("click_rate"))
    assert(df.columns.toSeq == Seq("ub", "click_rate"))
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
    assert(df.count() > 0)
  }

  test("cyclic supporting definitions are rejected") {
    intercept[ParseException] {
      run(s"""{
        "table": "events",
        "supportingMeasures": [
          {"alias": "a", "sqlExpression": "b + 1"},
          {"alias": "b", "sqlExpression": "a + 1"}
        ],
        "measures": [{"sqlExpression": "sum(a)"}],
        "timeFilter": {"from": "1704067200"},
        "now": $NowEpoch
      }""")
    }
  }

  test("sorts + limit on non-agg queries execute as top-k") {
    val df = run(s"""{
      "table": "events",
      "measures": [{"sqlExpression": "1"}],
      "dimensions": [
        {"alias": "event_id", "sqlExpression": "event_id"},
        {"alias": "v", "sqlExpression": "value"}
      ],
      "sorts": [{"name": "v", "order": "desc"}, {"name": "event_id", "order": "asc"}],
      "limit": 5,
      "timeFilter": {"from": "1704067200"},
      "now": $NowEpoch
    }""")
    val got = df.collect().map(_.getDouble(1))
    assert(got.length == 5)
    assert(got.zip(got.tail).forall { case (a, b) => a >= b }, "descending by value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k operator expected:\n$plan")
  }

  test("SQL WITH subquery executes end-to-end through the merged AQL") {
    val compiled = SqlFront.compile(
      """WITH e AS (SELECT event_type AS et, value FROM events WHERE value > 50)
        | SELECT count(*) AS value FROM e
        | WHERE aql_time_filter(ts, "1704067200", "1706659200", UTC)
        | GROUP BY et""".stripMargin,
      Catalog.testdata(sfDir), spark, now = Some(NowEpoch))
    val got = compiled.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Tables.events(spark, sfDir)
      .where(col("ts") >= timestamp_seconds(lit(1704067200L)) &&
        col("ts") < timestamp_seconds(lit(1706659200L)) && col("value") > 50)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("1k_trips example queries compile and execute (AQL surface compat)") {
    // the reference's own flagship AQL bodies
    // (/root/reference/examples/1k_trips/queries/total_trips.aql), retargeted
    // at the events fixture: same structure, same time expressions.
    val df = run(s"""{
      "table": "events",
      "measures": [{"alias": "value", "sqlExpression": "count(*)",
                    "rowFilters": ["event_type='click'"]}],
      "timeFilter": {"column": "ts", "from": "24 hours ago", "to": "this quarter-hour"},
      "dimensions": [{"alias": "ts", "sqlExpression": "ts", "timeBucketizer": "hour"}],
      "joins": [],
      "now": $NowEpoch
    }""")
    assert(df.columns.toSeq == Seq("ts", "value"))
    assert(df.count() > 0)
  }

  // ---- strictCompat matrix (SURVEY §7.4.3) --------------------------------

  /** Hourly rows across the 2024-03-10 America/Los_Angeles spring-forward
    * switch (10:00 UTC). strict OFF buckets with per-row DST-correct
    * offsets; strict ON replicates the reference's piecewise window offset
    * (time_bucketizer.go:93-146) exactly.
    */
  private def dstCatalog: Catalog = {
    import spark.implicits._
    val rows = (0 until 72).map { h =>
      (1709949600L + h * 3600L, h.toLong) // 2024-03-09T02:00:00Z .. +72h
    }.toDF("t", "k")
    Catalog(Map("dst" -> TableDef("dst", isFact = true, Some("t"),
      load = _ => rows)))
  }

  private val DstQuery = """{
      "table": "dst",
      "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
      "dimensions": [{"alias": "d", "sqlExpression": "t", "timeBucketizer": "day"}],
      "timeFilter": {"from": "1709949600", "to": "1710208800"},
      "timezone": "America/Los_Angeles",
      "now": 1710208800
    }"""

  test("strictCompat OFF: day buckets use per-row DST-correct offsets") {
    val df = new AqlCompiler(dstCatalog, spark).compile(AqlJson.parseQuery(DstQuery)).df
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-row correct: ts < 10:00Z shifts -8h, ts >= 10:00Z shifts -7h;
    // local Mar 10 = [08:00Z Mar 10, 07:00Z Mar 11) = 2h PST + 21h PDT = 23 rows
    val correct = (0 until 72).map(h => 1709949600L + h * 3600L).groupBy { ts =>
      val off = java.time.ZoneId.of("America/Los_Angeles").getRules
        .getOffset(java.time.Instant.ofEpochSecond(ts)).getTotalSeconds
      val local = ts + off
      local - local % 86400
    }.map { case (k, v) => k -> v.size.toLong }
    assert(got == correct, s"got $got expected $correct")
    assert(got(1710028800L) == 23L) // the 23-hour spring-forward day
  }

  test("strictCompat ON: reference piecewise window-offset buckets, bit-for-bit") {
    val df = new AqlCompiler(dstCatalog, spark, strictCompat = true)
      .compile(AqlJson.parseQuery(DstQuery)).df
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replicate the reference formula independently:
    // fromOffset = -28800 (PST), toOffset = -25200 (PDT), diff = -3600,
    // switchTs = hour-aligned DST switch = 1710064800 (10:00Z Mar 10)
    val expected = (0 until 72).map(h => 1709949600L + h * 3600L).groupBy { ts =>
      val local = ts - 28800L + (if (ts >= 1710064800L) -3600L else 0L)
      local - local % 86400
    }.map { case (k, v) => k -> v.size.toLong }
    assert(got == expected, s"got $got expected $expected")
    // and it genuinely differs from the DST-correct bucketing
    val correct = new AqlCompiler(dstCatalog, spark).compile(AqlJson.parseQuery(DstQuery))
      .df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got != correct)
  }

  test("strictCompat ON: same results as OFF when the window has one offset") {
    val jan = DstQuery.replace("1709949600", "1704672000")
      .replace("1710208800", "1704844800")
    import spark.implicits._
    val rows = (0 until 48).map(h => (1704672000L + h * 3600L, h.toLong)).toDF("t", "k")
    val cat = Catalog(Map("dst" -> TableDef("dst", isFact = true, Some("t"),
      load = _ => rows)))
    val off = new AqlCompiler(cat, spark).compile(AqlJson.parseQuery(jan)).df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val on = new AqlCompiler(cat, spark, strictCompat = true)
      .compile(AqlJson.parseQuery(jan)).df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(on == off && off.nonEmpty)
  }

  test("strictCompat ON rejects numeric ops on >4-byte columns; OFF allows") {
    import spark.implicits._
    val rows = Seq((1L, 10L, 5)).toDF("t", "big", "small")
    val cat = Catalog(Map("w" -> TableDef("w", isFact = false,
      columnTypes = Map("big" -> "Int64", "small" -> "Int32"), load = _ => rows)))
    val q = """{
      "table": "w",
      "measures": [{"alias": "value", "sqlExpression": "count(*)",
                    "rowFilters": ["big + 1 > 0"]}]
    }"""
    // OFF: silent superset — runs fine
    assert(new AqlCompiler(cat, spark).compile(AqlJson.parseQuery(q)).df.count() == 1)
    // ON: the reference's rejection (query_context_helper.go:72-91)
    val e = intercept[ParseException] {
      new AqlCompiler(cat, spark, strictCompat = true).compile(AqlJson.parseQuery(q))
    }
    assert(e.getMessage.contains("over 4 bytes"))
    // comparisons are NOT numeric transformations: allowed in strict mode
    val cmp = q.replace("big + 1 > 0", "big > 0")
    assert(new AqlCompiler(cat, spark, strictCompat = true)
      .compile(AqlJson.parseQuery(cmp)).df.count() == 1)
  }

  // ---- GeoPoint / UUID literal coercion -----------------------------------

  test("geo point literal: WKT parse, order, IN membership, malformed rejection") {
    import spark.implicits._
    val rows = Seq((3.5, 5.5, "a"), (5.5, 3.5, "b"), (0.0, 0.0, "c"))
      .map { case (lat, lng, id) => (id, lat, lng) }
      .toDF("id", "lat", "lng")
      .select(col("id"), struct(col("lat"), col("lng")).as("loc"))
    val cat = Catalog(Map("g" -> TableDef("g", isFact = false,
      columnTypes = Map("loc" -> "GeoPoint"), load = _ => rows)))
    def count(filter: String): Long =
      new AqlCompiler(cat, spark).compile(AqlJson.parseQuery(s"""{
        "table": "g",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "rowFilters": [${filter}]
      }""")).df.collect()(0).getLong(0)
    // WKT is Point(lng, lat): lng 5.5 / lat 3.5 matches row "a" only
    assert(count("\"loc = 'Point(5.5, 3.5)'\"") == 1L)
    // tolerant parse: case-insensitive, space-separated
    assert(count("\"loc = 'POINT (5.5 3.5)'\"") == 1L)
    // IN expands to point-equality membership
    assert(count("\"loc in ('point(5.5,3.5)', 'point(0.0,0.0)')\"") == 2L)
    // != negates
    assert(count("\"loc != 'Point(5.5, 3.5)'\"") == 2L)
    // malformed WKT and out-of-range coordinates are rejected
    assert(intercept[ParseException] { count("\"loc = 'Point(5.5)'\"") }
      .getMessage.contains("invalid point"))
    assert(intercept[ParseException] { count("\"loc = 'Point(200.0, 3.5)'\"") }
      .getMessage.contains("longitude"))
    assert(intercept[ParseException] { count("\"loc = 'Point(5.5, 95.0)'\"") }
      .getMessage.contains("latitude"))
  }

  test("uuid literal: case/dash-insensitive equality; malformed rejection") {
    import spark.implicits._
    val rows = Seq("123E4567-E89B-12D3-A456-426614174000", "00000000-0000-0000-0000-000000000001")
      .toDF("u")
    val cat = Catalog(Map("uu" -> TableDef("uu", isFact = false,
      columnTypes = Map("u" -> "UUID"), load = _ => rows)))
    def count(filter: String): Long =
      new AqlCompiler(cat, spark).compile(AqlJson.parseQuery(s"""{
        "table": "uu",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "rowFilters": [${filter}]
      }""")).df.collect()(0).getLong(0)
    assert(count("\"u = '123e4567e89b12d3a456426614174000'\"") == 1L)
    assert(count("\"u = '123e4567-e89b-12d3-a456-426614174000'\"") == 1L)
    assert(count("\"u != '123E4567-E89B-12D3-A456-426614174000'\"") == 1L)
    assert(intercept[ParseException] { count("\"u = 'not-a-uuid'\"") }
      .getMessage.contains("invalid UUID"))
  }
}
