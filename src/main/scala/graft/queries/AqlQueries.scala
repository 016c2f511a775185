package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.aql.{AqlCompiler, AqlJson, Catalog}

/** Gate queries that run END TO END through the AQL front end: JSON →
  * parser → compiler → DataFrame. These are the reference's primary entry
  * point (/root/reference/query/aql_compiler.go:43-102; the .aql files in
  * examples/1k_trips/queries) — the DuckDB oracle re-states each query's
  * semantics independently in SQL.
  *
  * `now` is pinned (AQLQuery.Now, ref query/common/aql.go:141-142) at
  * 2024-01-31T00:00:00Z so natural-language time expressions resolve
  * deterministically against the Jan-2024 events fixture.
  *
  * Float-measure outputs are normalized (DECIMAL cast / ROUND) on BOTH
  * sides per the cross-engine compare convention (CoreQueries scaladoc) —
  * a result-serialization concern, not a compiler one.
  */
object AqlQueries {

  /** 2024-01-31T00:00:00Z — one day past the last events row. */
  val NowEpoch = 1706659200L

  private def aql(json: String)(s: SparkSession, d: String): DataFrame =
    new AqlCompiler(Catalog.testdata(d), s).compile(AqlJson.parseQuery(json)).df

  // time expressions below, resolved against the pinned now:
  //   "24 hours ago"       -> 1706572800 (2024-01-30T00:00Z, hour-aligned)
  //   "this quarter-hour"  -> end 1706660100
  //   "7 days ago"         -> 1706054400 (2024-01-24T00:00Z)

  val defs: Seq[QueryDef] = Seq(

    // the reference's flagship total_trips.aql shape: count over a filtered
    // day with an hour bucketizer and natural-language time bounds
    QueryDef("q_aql_total_trips",
      """SELECT CAST(epoch(ts) - epoch(ts) % 3600 AS BIGINT) AS ts,
        |  CAST(COUNT(*) AS BIGINT) AS value
        |FROM events
        |WHERE epoch(ts) >= 1706572800 AND epoch(ts) < 1706660100
        |  AND event_type = 'click'
        |GROUP BY 1 ORDER BY ts NULLS FIRST""".stripMargin) { (s, d) =>
      aql(s"""{
        "table": "events",
        "measures": [{"alias": "value", "sqlExpression": "count(*)",
                      "rowFilters": ["event_type='click'"]}],
        "timeFilter": {"column": "ts", "from": "24 hours ago", "to": "this quarter-hour"},
        "dimensions": [{"alias": "ts", "sqlExpression": "ts", "timeBucketizer": "hour"}],
        "joins": [],
        "now": $NowEpoch
      }""")(s, d).orderBy("ts")
    },

    // total_fare.aql shape: sum measure (float) over the same window
    QueryDef("q_aql_total_fare",
      """SELECT CAST(epoch(ts) - epoch(ts) % 3600 AS BIGINT) AS ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value
        |FROM events
        |WHERE epoch(ts) >= 1706572800 AND epoch(ts) < 1706660100
        |  AND event_type = 'purchase'
        |GROUP BY 1 ORDER BY ts NULLS FIRST""".stripMargin) { (s, d) =>
      val df = aql(s"""{
        "table": "events",
        "measures": [{"alias": "value", "sqlExpression": "sum(value)",
                      "rowFilters": ["event_type='purchase'"]}],
        "timeFilter": {"column": "ts", "from": "24 hours ago", "to": "this quarter-hour"},
        "dimensions": [{"alias": "ts", "sqlExpression": "ts", "timeBucketizer": "hour"}],
        "now": $NowEpoch
      }""")(s, d)
      // decimal normalization on the Spark side for cross-engine float compare
      df.select(col("ts"),
        col("value").cast("decimal(18,6)").cast("double").as("value"))
        .orderBy("ts")
    },

    // non-agg projection: window sized under the limit so the row set is
    // deterministic; limit semantics themselves are covered by specs
    QueryDef("q_aql_nonagg",
      """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ets
        |FROM events
        |WHERE epoch(ts) >= 1706572800 AND epoch(ts) < 1706659200
        |ORDER BY event_id NULLS FIRST""".stripMargin) { (s, d) =>
      aql(s"""{
        "table": "events",
        "measures": [{"sqlExpression": "1"}],
        "dimensions": [
          {"alias": "event_id", "sqlExpression": "event_id"},
          {"alias": "user_id", "sqlExpression": "user_id"},
          {"alias": "ets", "sqlExpression": "ts"}
        ],
        "timeFilter": {"from": "24 hours ago", "to": "now"},
        "limit": 1000000,
        "now": $NowEpoch
      }""")(s, d).orderBy("event_id")
    },

    // broadcast dimension join through the AQL join block
    QueryDef("q_aql_join_dim",
      """SELECT p.p_brand AS brand,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
        |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY brand NULLS FIRST""".stripMargin) { (s, d) =>
      val df = aql("""{
        "table": "lineitem",
        "joins": [{"table": "part",
                   "conditions": ["lineitem.l_partkey = part.p_partkey"]}],
        "measures": [{"alias": "value", "sqlExpression": "sum(l_quantity)"}],
        "dimensions": [{"alias": "brand", "sqlExpression": "part.p_brand"}]
      }""")(s, d)
      df.select(col("brand"),
        col("value").cast("decimal(18,2)").cast("double").as("value"))
        .orderBy("brand")
    },

    // scalar expression dimensions: CASE WHEN + floor(x, n) + IN filter
    QueryDef("q_aql_expr_dims",
      """SELECT l_quantity - (l_quantity % 10) AS qbucket,
        |  CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS flag,
        |  CAST(COUNT(*) AS BIGINT) AS value
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R')
        |GROUP BY 1, 2 ORDER BY qbucket NULLS FIRST, flag NULLS FIRST""".stripMargin) { (s, d) =>
      aql("""{
        "table": "lineitem",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "rowFilters": ["l_returnflag in ('A', 'R')"],
        "dimensions": [
          {"alias": "qbucket", "sqlExpression": "floor(l_quantity, 10)"},
          {"alias": "flag", "sqlExpression": "case when l_discount > 0.05 then 'hi' else 'lo' end"}
        ]
      }""")(s, d).orderBy("qbucket", "flag")
    },

    // named-timezone week bucketizer: shift-then-floor, Monday-based weeks
    QueryDef("q_aql_tz_week",
      """SELECT CAST(epoch(date_trunc('week',
        |    timezone('America/Los_Angeles', timezone('UTC', ts)))) AS BIGINT) AS wk,
        |  CAST(COUNT(*) AS BIGINT) AS value
        |FROM events
        |WHERE epoch(ts) >= 1706054400 AND epoch(ts) < 1706659200
        |GROUP BY 1 ORDER BY wk NULLS FIRST""".stripMargin) { (s, d) =>
      aql(s"""{
        "table": "events",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "dimensions": [{"alias": "wk", "sqlExpression": "ts", "timeBucketizer": "week"}],
        "timeFilter": {"from": "1706054400", "to": "1706659200"},
        "timezone": "America/Los_Angeles",
        "now": $NowEpoch
      }""")(s, d).orderBy("wk")
    },

    // row-filter → time-filter promotion: epoch comparisons on the fact
    // table's time column become the time filter (aql_compiler.go:104-166)
    QueryDef("q_aql_promoted_timefilter",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS value
        |FROM events
        |WHERE epoch(ts) >= 1704585600 AND epoch(ts) < 1704672000
        |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      aql(s"""{
        "table": "events",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "dimensions": [{"alias": "event_type", "sqlExpression": "event_type"}],
        "rowFilters": ["ts >= 1704585600", "ts < 1704672000"],
        "now": $NowEpoch
      }""")(s, d).orderBy("event_type")
    },

    // SQL front end end-to-end: SQL text -> AQLQuery -> DataFrame
    // (ref query/sql/sql_parser.go:108-121 translation subset)
    QueryDef("q_sql_flagship",
      """SELECT CAST(epoch(ts) - epoch(ts) % 3600 AS BIGINT) AS ts,
        |  CAST(COUNT(*) AS BIGINT) AS value
        |FROM events
        |WHERE epoch(ts) >= 1706572800 AND epoch(ts) < 1706660100
        |  AND event_type = 'click'
        |GROUP BY 1 ORDER BY ts NULLS FIRST""".stripMargin) { (s, d) =>
      graft.aql.SqlFront.compile(
        """SELECT count(*) AS value FROM events
          | WHERE event_type = 'click'
          |   AND aql_time_filter(ts, "24 hours ago", "this quarter-hour", UTC)
          | GROUP BY aql_time_bucket_hour(ts, "", UTC)""".stripMargin,
        Catalog.testdata(d), s, now = Some(NowEpoch))
        .df.orderBy("ts")
    },

    QueryDef("q_sql_join_nonagg",
      """SELECT l_orderkey, o.o_orderpriority AS prio
        |FROM lineitem JOIN orders o ON lineitem.l_orderkey = o.o_orderkey
        |WHERE l_quantity > 45 AND l_orderkey < 3000
        |ORDER BY l_orderkey NULLS FIRST, prio NULLS FIRST""".stripMargin) { (s, d) =>
      graft.aql.SqlFront.compile(
        """SELECT l_orderkey, o.o_orderpriority AS prio FROM lineitem
          | JOIN orders o ON lineitem.l_orderkey = o.o_orderkey
          | WHERE l_quantity > 45 AND l_orderkey < 3000
          | LIMIT 100000""".stripMargin,
        Catalog.testdata(d), s).df.orderBy("l_orderkey", "prio")
    },

    // hll(col) over a PRECOMPUTED register column (the isHLLColumn fast
    // path, helper.go:540-577): registers built by get_hll_value via a
    // supporting dimension; the estimate must equal countDistinctHLL over
    // the raw column EXACTLY (identical registers) and stay within 2% of
    // the exact count — both asserted as oracle-pinned flags
    QueryDef("q_aql_hll_measure",
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS matches_countdistinct, TRUE AS within_2pct
        |FROM events
        |WHERE epoch(ts) >= 1704067200 AND epoch(ts) < 1706659200
        |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      val fromRegisters = aql(s"""{
        "table": "events",
        "supportingDimensions": [{"alias": "reg", "sqlExpression": "get_hll_value(user_id)"}],
        "measures": [{"alias": "est", "sqlExpression": "hll(reg)"}],
        "dimensions": [{"alias": "event_type", "sqlExpression": "event_type"}],
        "timeFilter": {"from": "1704067200", "to": "1706659200"},
        "now": $NowEpoch
      }""")(s, d)
      val direct = aql(s"""{
        "table": "events",
        "measures": [{"alias": "direct_est", "sqlExpression": "countDistinctHLL(user_id)"}],
        "dimensions": [{"alias": "event_type", "sqlExpression": "event_type"}],
        "timeFilter": {"from": "1704067200", "to": "1706659200"},
        "now": $NowEpoch
      }""")(s, d)
      val exact = Tables.events(s, d)
        .where(col("ts") >= timestamp_seconds(lit(1704067200L)) &&
          col("ts") < timestamp_seconds(lit(1706659200L)))
        .groupBy("event_type").agg(count_distinct(col("user_id")).as("exact_users"))
      fromRegisters.join(direct, "event_type").join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          (col("est") === col("direct_est")).as("matches_countdistinct"),
          (abs(col("est") - col("exact_users")) <= col("exact_users") * 0.02)
            .as("within_2pct"))
        .orderBy("event_type")
    },

    // derived measure: arithmetic over aggregates with supporting-measure
    // aliases (the broker's post-merge algebra, inline)
    // count(DISTINCT x) — the parser carries DISTINCT into the AST
    // (Expr.Call("countdistinct")) instead of silently compiling count(x);
    // exact-distinct is single-instance only (the broker rejects it and
    // points at countdistincthll)
    QueryDef("q_aql_count_distinct",
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        |FROM events
        |WHERE epoch(ts) >= 1704067200 AND epoch(ts) < 1706659200
        |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      aql(s"""{
        "table": "events",
        "measures": [{"alias": "users", "sqlExpression": "count(distinct user_id)"}],
        "dimensions": [{"alias": "event_type", "sqlExpression": "event_type"}],
        "timeFilter": {"from": "1704067200", "to": "1706659200"},
        "now": $NowEpoch
      }""")(s, d).orderBy("event_type")
    },

    QueryDef("q_aql_derived_measure",
      """SELECT event_type,
        |  ROUND(CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS hi_rate
        |FROM events
        |WHERE epoch(ts) >= 1704067200 AND epoch(ts) < 1706659200
        |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      val df = aql(s"""{
        "table": "events",
        "supportingMeasures": [
          {"alias": "hi", "sqlExpression": "sum(case when value > 50 then 1 else 0 end)"},
          {"alias": "total", "sqlExpression": "count(*)"}
        ],
        "measures": [{"alias": "hi_rate", "sqlExpression": "hi / total"}],
        "dimensions": [{"alias": "event_type", "sqlExpression": "event_type"}],
        "timeFilter": {"from": "1704067200", "to": "1706659200"},
        "now": $NowEpoch
      }""")(s, d)
      df.select(col("event_type"), round(col("hi_rate"), 6).as("hi_rate"))
        .orderBy("event_type")
    },

    // SQL WITH subquery merged into the single AQL (1 level)
    QueryDef("q_sql_with",
      """SELECT event_type AS et, CAST(COUNT(*) AS BIGINT) AS value
        |FROM events
        |WHERE value > 50
        |  AND epoch(ts) >= 1704067200 AND epoch(ts) < 1706659200
        |GROUP BY 1 ORDER BY et NULLS FIRST""".stripMargin) { (s, d) =>
      graft.aql.SqlFront.compile(
        """WITH hot AS (SELECT event_type AS et, value FROM events WHERE value > 50)
          | SELECT count(*) AS value FROM hot
          | WHERE aql_time_filter(ts, "1704067200", "1706659200", UTC)
          | GROUP BY et""".stripMargin,
        Catalog.testdata(d), s, now = Some(NowEpoch)).df.orderBy("et")
    },

    // nested subselect in FROM: query level 2 of the reference's two-level
    // grammar (sql_parser.go:34-47), merged into the single AQL
    QueryDef("q_sql_nested",
      """SELECT event_type AS et, CAST(COUNT(*) AS BIGINT) AS value
        |FROM events
        |WHERE value <= 50
        |  AND epoch(ts) >= 1704067200 AND epoch(ts) < 1706659200
        |GROUP BY 1 ORDER BY et NULLS FIRST""".stripMargin) { (s, d) =>
      graft.aql.SqlFront.compile(
        """SELECT count(*) AS value
          | FROM (SELECT event_type AS et, value FROM events WHERE value <= 50) cold
          | WHERE aql_time_filter(ts, "1704067200", "1706659200", UTC)
          | GROUP BY et""".stripMargin,
        Catalog.testdata(d), s, now = Some(NowEpoch)).df.orderBy("et")
    },

    // honored sorts: ORDER BY + LIMIT on a non-agg query = top-k
    QueryDef("q_aql_sorted_topk",
      """SELECT event_id, ROUND(value, 6) AS v FROM events
        |WHERE epoch(ts) >= 1704067200 AND epoch(ts) < 1706659200
        |ORDER BY value DESC, event_id ASC LIMIT 20""".stripMargin) { (s, d) =>
      val df = aql(s"""{
        "table": "events",
        "measures": [{"sqlExpression": "1"}],
        "dimensions": [
          {"alias": "event_id", "sqlExpression": "event_id"},
          {"alias": "v", "sqlExpression": "value"}
        ],
        "sorts": [{"name": "v", "order": "desc"}, {"name": "event_id", "order": "asc"}],
        "limit": 20,
        "timeFilter": {"from": "1704067200", "to": "1706659200"},
        "now": $NowEpoch
      }""")(s, d)
      df.select(col("event_id"), round(col("v"), 6).as("v"))
    },

    // convert_tz scalar: compile-time fold to ts + offsetDelta
    // (query_context_helper.go:348-387); -5:00 is DST-free so the fold is
    // exact for the whole fixture
    QueryDef("q_aql_convert_tz",
      """WITH e AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) - 18000 AS le FROM events
        |  WHERE epoch(ts) >= 1704067200 AND epoch(ts) < 1706659200)
        |SELECT le - le % 86400 AS local_day, CAST(COUNT(*) AS BIGINT) AS value
        |FROM e GROUP BY 1 ORDER BY local_day NULLS FIRST""".stripMargin) { (s, d) =>
      aql(s"""{
        "table": "events",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "dimensions": [{"alias": "local_day",
                        "sqlExpression": "floor(convert_tz(ts, 'UTC', '-5:00'), 86400)"}],
        "timeFilter": {"from": "1704067200", "to": "1706659200"},
        "now": $NowEpoch
      }""")(s, d).orderBy("local_day")
    },

    // recurring bucketizer via AQL: Monday-based day-of-week index
    QueryDef("q_aql_day_of_week",
      """SELECT CAST((CAST(epoch(ts) AS BIGINT) // 86400 + 3) % 7 AS BIGINT) AS dow,
        |  CAST(COUNT(*) AS BIGINT) AS value
        |FROM events
        |WHERE epoch(ts) >= 1704067200 AND epoch(ts) < 1706659200
        |GROUP BY 1 ORDER BY dow NULLS FIRST""".stripMargin) { (s, d) =>
      aql(s"""{
        "table": "events",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "dimensions": [{"alias": "dow", "sqlExpression": "ts", "timeBucketizer": "day of week"}],
        "timeFilter": {"from": "1704067200", "to": "1706659200"},
        "now": $NowEpoch
      }""")(s, d).orderBy("dow")
    }
  )
}
