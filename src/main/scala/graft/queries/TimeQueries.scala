package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-bucketizer dimension surface (SURVEY §2.5), covering the reference's
  * regular, irregular (calendar-aware) and recurring bucketizers
  * (/root/reference/query/time_bucketizer.go:36-299) plus fixed-offset
  * timezone handling, re-expressed with Spark's native date functions.
  *
  * Bucket labels follow the reference: regular buckets are the bucket-start
  * epoch seconds; recurring buckets are small integers (day-of-week is
  * Monday-based = 1, matching the reference's −4d epoch shift trick).
  */
object TimeQueries {
  private val dec = DecimalType(18, 2)

  val defs: Seq[QueryDef] = Seq(
    // regular "<n> minutes" bucket = floor(ts, n*60) on epoch seconds
    QueryDef("q_bucket_minutes15",
      """SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events
        |WHERE ts < TIMESTAMP '2024-01-01 08:00:00'
        |GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .where(col("ts") < lit("2024-01-01 08:00:00").cast(TimestampType))
        .groupBy((floor(unix_timestamp(col("ts")) / 900) * 900)
          .cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },

    QueryDef("q_bucket_hour",
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"))
        .agg(sum(col("value").cast(dec)).cast(DoubleType).as("total"))
        .orderBy("bucket")
    },

    QueryDef("q_bucket_day",
      """SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },

    // irregular calendar-aware buckets on the multi-year orders table
    QueryDef("q_bucket_week",
      """SELECT CAST(floor(epoch(date_trunc('week', o_orderdate))) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderdate") < lit("1996-01-01").cast(TimestampType))
        .groupBy(unix_timestamp(date_trunc("week", col("o_orderdate"))).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },

    QueryDef("q_bucket_month",
      """SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS bucket,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(unix_timestamp(date_trunc("month", col("o_orderdate"))).as("bucket"))
        .agg(sum(col("o_totalprice").cast(dec)).cast(DoubleType).as("total"))
        .orderBy("bucket")
    },

    QueryDef("q_bucket_quarter",
      """SELECT CAST(floor(epoch(date_trunc('quarter', o_orderdate))) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(unix_timestamp(date_trunc("quarter", col("o_orderdate"))).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },

    QueryDef("q_bucket_year",
      """SELECT CAST(floor(epoch(date_trunc('year', o_orderdate))) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(unix_timestamp(date_trunc("year", col("o_orderdate"))).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },

    // recurring bucketizers ------------------------------------------------
    QueryDef("q_bucket_minutes_of_day",
      """SELECT CAST((CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 1800 AS BIGINT) AS half_hour_of_day,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY half_hour_of_day NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(expr("(unix_timestamp(ts) % 86400) div 1800").as("half_hour_of_day"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("half_hour_of_day")
    },

    QueryDef("q_bucket_hour_of_day",
      """SELECT CAST(hour(ts) AS INT) AS hour_of_day, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY hour_of_day NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(hour(col("ts")).as("hour_of_day"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("hour_of_day")
    },

    QueryDef("q_bucket_hour_of_week",
      """SELECT CAST((isodow(ts) - 1) * 24 + hour(ts) AS INT) AS hour_of_week,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY hour_of_week NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy((weekday(col("ts")) * 24 + hour(col("ts"))).as("hour_of_week"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("hour_of_week")
    },

    // Monday-based day of week = 1, as the reference's (ts/86400+4)%7+1
    QueryDef("q_bucket_day_of_week",
      """SELECT CAST(isodow(o_orderdate) AS INT) AS day_of_week,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1 ORDER BY day_of_week NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy((weekday(col("o_orderdate")) + 1).as("day_of_week"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("day_of_week")
    },

    QueryDef("q_bucket_day_of_month",
      """SELECT CAST(day(o_orderdate) AS INT) AS day_of_month,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1 ORDER BY day_of_month NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(dayofmonth(col("o_orderdate")).as("day_of_month"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("day_of_month")
    },

    QueryDef("q_bucket_day_of_year",
      """SELECT CAST(dayofyear(o_orderdate) AS INT) AS day_of_year,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1 ORDER BY day_of_year NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderdate") < lit("1996-01-01").cast(TimestampType))
        .groupBy(dayofyear(col("o_orderdate")).as("day_of_year"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("day_of_year")
    },

    QueryDef("q_bucket_month_of_year",
      """SELECT CAST(month(o_orderdate) AS INT) AS month_of_year,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1 ORDER BY month_of_year NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(month(col("o_orderdate")).as("month_of_year"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("month_of_year")
    },

    QueryDef("q_bucket_quarter_of_year",
      """SELECT CAST(quarter(o_orderdate) AS INT) AS quarter_of_year,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1 ORDER BY quarter_of_year NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(quarter(col("o_orderdate")).as("quarter_of_year"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("quarter_of_year")
    },

    // timezone: fixed offset = compile-time offset add (the reference folds
    // convert_tz to `+ offset`, query_context_helper.go:348-387)
    QueryDef("q_tz_fixed_offset",
      """SELECT CAST(hour(ts - INTERVAL 8 HOUR) AS INT) AS local_hour,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY local_hour NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(hour(col("ts") - expr("INTERVAL 8 HOURS")).as("local_hour"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("local_hour")
    },

    // named timezone: Spark is DST-correct natively. The DuckDB oracle uses
    // the two-arg timezone() both ways (naive→TIMESTAMPTZ at UTC, then
    // TIMESTAMPTZ→LA naive) so it is independent of the driver session tz.
    // DST behavior itself (Jan=UTC-8 vs Jul=UTC-7) is asserted in TimezoneSpec.
    QueryDef("q_tz_named",
      """SELECT CAST(hour(timezone('America/Los_Angeles', timezone('UTC', ts))) AS INT) AS la_hour,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY la_hour NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(hour(from_utc_timestamp(col("ts"), "America/Los_Angeles"))
          .as("la_hour"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("la_hour")
    },

    // numeric bucketizers (§2.5; declared-but-unimplemented in the reference
    // — aql.go:25-45, TODO at aql_compiler.go:1271 — implemented here)
    QueryDef("q_bucket_numeric_width",
      """SELECT CAST(floor(p_retailprice / 10) * 10 AS BIGINT) AS price_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM part GROUP BY 1 ORDER BY price_bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .groupBy((floor(col("p_retailprice") / 10) * 10)
          .cast(LongType).as("price_bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("price_bucket")
    },

    QueryDef("q_bucket_numeric_manual",
      """SELECT CASE WHEN c_acctbal < 0 THEN -999999 WHEN c_acctbal < 1000 THEN 0
        |            WHEN c_acctbal < 5000 THEN 1000 ELSE 5000 END AS bal_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM customer GROUP BY 1 ORDER BY bal_bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(when(col("c_acctbal") < 0, -999999)
          .when(col("c_acctbal") < 1000, 0)
          .when(col("c_acctbal") < 5000, 1000)
          .otherwise(5000).as("bal_bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bal_bucket")
    },

    // log-width bucket. libm log() may differ in the last ulp across engines
    // at exact powers of the base, so both sides add a 1e-9 epsilon before
    // floor — values are bucket-stable unless within 1e-9 of a power of 2,
    // which real measures never are. This makes the bucket oracle-exact.
    QueryDef("q_bucket_numeric_log",
      """SELECT CAST(pow(2, floor(log2(l_quantity) + 1e-9)) AS BIGINT) AS qty_log_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY qty_log_bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(pow(lit(2.0), floor(log(2.0, col("l_quantity")) + 1e-9))
          .cast(LongType).as("qty_log_bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("qty_log_bucket")
    },

    // --- sort / top-k of groups (§2.6, extension over the reference) -------
    QueryDef("q_topk_groups",
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY revenue DESC NULLS LAST, p_brand NULLS FIRST LIMIT 10""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(col("l_extendedprice").cast(dec)).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc_nulls_last, col("p_brand").asc_nulls_first)
        .limit(10)
    },

    // --- hopping (sliding) windows (r10): 1h windows every 15min — each
    // event lands in 4 windows via Spark's native window() Expand with
    // map-side partial agg; the oracle replays the fan-out in exact
    // microsecond integer arithmetic (window starts align to epoch 0).
    QueryDef("q_bucket_hopping",
      """WITH e AS (SELECT epoch_us(ts) AS t, value FROM events),
        |w AS (SELECT (t // 900000000 - j) * 900000000 AS ws, value
        |      FROM e CROSS JOIN unnest([0, 1, 2, 3]) AS u(j)
        |      WHERE (t // 900000000 - j) * 900000000 > t - 3600000000)
        |SELECT CAST(ws // 1000000 AS BIGINT) AS window_start,
        |  CAST(ws // 1000000 + 3600 AS BIGINT) AS window_end,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM w GROUP BY ws
        |ORDER BY window_start NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Sessions.hoppingAgg(Tables.events(s, d), "ts",
          sizeSec = 3600, strideSec = 900,
          Seq(count(lit(1)).as("cnt"),
            sum(col("value").cast(dec)).cast(DoubleType).as("total")))
        .select("window_start", "window_end", "cnt", "total")
        .orderBy("window_start")
    },

    // --- gap (sampling) windows (r11): 15min windows every 1h — the
    // stride > size regime Spark's window() rejects, served by the
    // floor-bucketing branch: an event belongs iff its offset within the
    // stride is under the window size, 3/4 of events fall in gaps
    QueryDef("q_bucket_hopping_gap",
      """WITH e AS (SELECT epoch_us(ts) // 1000000 AS t, value FROM events
        |           WHERE (epoch_us(ts) // 1000000) % 3600 < 900)
        |SELECT CAST((t // 3600) * 3600 AS BIGINT) AS window_start,
        |  CAST((t // 3600) * 3600 + 900 AS BIGINT) AS window_end,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM e GROUP BY 1, 2
        |ORDER BY window_start NULLS FIRST""".stripMargin) { (s, d) =>
      graft.operators.Sessions.hoppingAgg(Tables.events(s, d), "ts",
          sizeSec = 900, strideSec = 3600,
          Seq(count(lit(1)).as("cnt"),
            sum(col("value").cast(dec)).cast(DoubleType).as("total")))
        .select("window_start", "window_end", "cnt", "total")
        .orderBy("window_start")
    }
  )
}
