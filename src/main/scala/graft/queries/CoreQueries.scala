package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core AresDB query surface re-expressed Spark-first: single-measure
  * aggregation over group-by dimensions, ANDed row filters, time filters,
  * broadcast dimension joins, non-aggregated projection with limit.
  *
  * Reference semantics: /root/reference/query/aql_compiler.go (filter
  * classification 797-892, measure 1139-1216, joins 168-342) — re-expressed
  * as declarative DataFrame plans so Catalyst handles pushdown, pruning,
  * partial aggregation and broadcast selection.
  *
  * Oracle-compat conventions (driver hash-compares against DuckDB):
  *  - money/qty sums go through DECIMAL(18,2) so both engines aggregate
  *    exactly, then cast back to DOUBLE for a canonical output type;
  *  - avg is rounded to 4 decimals;
  *  - every query is fully ordered on its key columns (nulls first, the
  *    Spark default) so row order can never affect the compare;
  *  - timestamps are emitted as epoch-second BIGINTs or formatted strings.
  */
object CoreQueries {
  private val dec = DecimalType(18, 2)

  val defs: Seq[QueryDef] = Seq(
    // --- aggregates (§2.4): count(*) is sum(1) in the reference -----------
    QueryDef("q_agg_count_star",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    },

    QueryDef("q_agg_sum",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    QueryDef("q_agg_avg",
      """SELECT l_linestatus, ROUND(AVG(l_extendedprice), 4) AS avg_price
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(round(avg("l_extendedprice"), 4).as("avg_price"))
        .orderBy("l_linestatus")
    },

    QueryDef("q_agg_min",
      """SELECT o_orderpriority, MIN(o_totalprice) AS min_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority").agg(min("o_totalprice").as("min_price"))
        .orderBy("o_orderpriority")
    },

    QueryDef("q_agg_max",
      """SELECT o_orderpriority, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority").agg(max("o_totalprice").as("max_price"))
        .orderBy("o_orderpriority")
    },

    QueryDef("q_count_distinct_exact",
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin) { (s, d) =>
      // the grouped result is one row per event_type (single digits): a
      // global orderBy range-partitions it — a whole extra sampling
      // stage to sort 5 rows (the round-11 sort-placement trap in
      // miniature; measured 0.38 s -> 0.22 s at sf0.1). Sort the tiny
      // frame in one partition instead — same ORDER BY contract, one
      // fewer exchange, and at 100 TB the group count is still tiny.
      Tables.events(s, d)
        .groupBy("event_type").agg(count_distinct(col("user_id")).as("n_users"))
        .coalesce(1).sortWithinPartitions("event_type")
    },

    // --- filters (§2.2): ANDed row filters, pushed to the parquet scan ----
    QueryDef("q_filter_rows",
      """SELECT l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity > 30
        |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_returnflag") === "R" && col("l_quantity") > 30 &&
          col("l_shipdate") >= lit("1995-01-01 00:00:00").cast(TimestampType))
        .groupBy("l_linestatus")
        .agg(sum(col("l_extendedprice").cast(dec)).cast(DoubleType).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_linestatus")
    },

    // --- time filter (§2.2): ts >= from && ts < to on the event-time col --
    QueryDef("q_time_filter",
      """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-05 00:00:00'
        |GROUP BY 1 ORDER BY day_bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .where(col("ts") >= lit("2024-01-02 00:00:00").cast(TimestampType) &&
          col("ts") < lit("2024-01-05 00:00:00").cast(TimestampType))
        .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("day_bucket")
    },

    // --- TPC-H-shaped multi-join aggregations: the canonical OLAP join
    // plans a migrating user brings along. Revenue terms multiply in
    // EXACT DECIMAL (price and discount are 2-dp money — the product is
    // exact, the SUM is exact, the output cast to double is canonical),
    // so no ROUND is needed anywhere. Q3: one broadcast dim (customer
    // filter) + the orders⋈lineitem fact join on the order key + top-10
    // by revenue.
    QueryDef("q_tpch_q3",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cutoff = lit("1996-03-15 00:00:00").cast(TimestampType)
      Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d).where(col("o_orderdate") < cutoff),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).where(col("l_shipdate") > cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).cast(DoubleType).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // Q5: the six-table local-supplier-volume join — region/nation/
    // supplier/customer broadcast as dims, orders⋈lineitem is the one
    // fact shuffle, the customer-nation = supplier-nation equality rides
    // as a post-join predicate exactly like the reference's join→filter
    // geo path.
    QueryDef("q_tpch_q5",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name NULLS FIRST""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d).where(
        col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      Tables.lineitem(s, d)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, asc_nulls_first("n_name"))
    },

    // Q1: the wide multi-measure pricing summary — 8 aggregates over ONE
    // scan (the single-measure AQL surface never exercises a multi-measure
    // plan; this is the plan family a reporting workload runs hourly at
    // 100 TB). All sums decimal-exact; averages derive as exact-decimal
    // sum cast to double over the bigint count, IEEE-identical in both
    // engines. OperatorPlanSpec asserts the single scan.
    QueryDef("q_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2))) *
        |           (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |    AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |    AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |    AS avg_disc,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      val disc1 = lit(1) - col("l_discount").cast(dec)
      val price = col("l_extendedprice").cast(dec)
      val n = count(lit(1))
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"),
          sum(price).cast(DoubleType).as("sum_base_price"),
          sum(price * disc1).cast(DoubleType).as("sum_disc_price"),
          sum(price * disc1 * (lit(1) + col("l_tax").cast(dec)))
            .cast(DoubleType).as("sum_charge"),
          (sum(col("l_quantity").cast(dec)).cast(DoubleType) / n).as("avg_qty"),
          (sum(price).cast(DoubleType) / n).as("avg_price"),
          (sum(col("l_discount").cast(DecimalType(18, 4))).cast(DoubleType) / n)
            .as("avg_disc"),
          n.as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q18: the group-HAVING-semi-join top-k (large-volume customers).
    // The textbook formulation aggregates lineitem TWICE (once for the
    // HAVING set, once for the output quantity); here the per-order
    // quantity IS the HAVING aggregate, so the plan runs ONE lineitem
    // shuffle and carries the sum through the joins — at 60M lineitems
    // that is the difference between one and two scans+exchanges of the
    // fact table. Qualifying keys are rare (HAVING prunes hard), so AQE
    // broadcasts them into orders; customer stays a broadcast dim.
    QueryDef("q_tpch_q18",
      """WITH big AS (SELECT l_orderkey FROM lineitem
        |             GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_ep, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate_ep, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(sum("l_quantity").as("__sq"),
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("total_qty"))
        .where(col("__sq") > 250)
        .select(col("l_orderkey").as("o_orderkey"), col("total_qty"))
      Tables.orders(s, d)
        .join(big, Seq("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("o_orderdate_ep"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },

    // Q18 over the orderkey-co-bucketed fact pair: same query, same
    // oracle, ZERO hash exchanges — the HAVING aggregate groups on the
    // bucket key so it folds into the sorted bucketed scan, and the
    // orders⋈big join co-locates bucket-to-bucket (Tables.lineitemByOrder
    // scaladoc: pre-pay the fact shuffle once at ingest instead of per
    // query). The plan audit pins no Exchange hashpartitioning anywhere;
    // the bench delta vs q_tpch_q18 is the receipt for what the layout
    // buys at query time.
    QueryDef("q_tpch_q18_bucketed",
      """WITH big AS (SELECT l_orderkey FROM lineitem
        |             GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_ep, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate_ep, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val big = Tables.lineitemByOrder(s, d).groupBy("l_orderkey")
        .agg(sum("l_quantity").as("__sq"),
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("total_qty"))
        .where(col("__sq") > 250)
        .select(col("l_orderkey").as("o_orderkey"), col("total_qty"))
      Tables.ordersByOrder(s, d)
        .join(big, Seq("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("o_orderdate_ep"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },

    // Q4 shape: the EXISTS-semi order-priority count. The correlated
    // EXISTS is a left-semi join — the date filter prunes orders first,
    // the semi side carries only the matching flag's orderkeys. No
    // row duplication ever reaches the aggregate (the semi join's whole
    // point vs an inner join + distinct).
    QueryDef("q_tpch_q4",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
        .join(Tables.lineitem(s, d).where(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q13 shape: the customer-order-count distribution — a LEFT OUTER
    // join with a NON-KEY predicate on the right side (customers with no
    // qualifying orders must survive as c_count=0) under a two-level
    // aggregation. The histogram is the classic \"how many customers
    // placed k orders\" report.
    QueryDef("q_tpch_q13",
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q16 shape: supplier-count-per-part-group with a NOT-IN exclusion —
    // an anti join (the excluded supplier set broadcasts; a naive NOT IN
    // with a nullable subquery degrades to a null-aware BNLJ, which the
    // plan audit forbids) under a COUNT(DISTINCT) aggregate.
    QueryDef("q_tpch_q16",
      """SELECT p_brand, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_size IN (1, 5, 9, 13)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 3000)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand NULLS FIRST, p_size NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d).where(col("s_acctbal") < 3000)
          .select(col("s_suppkey").as("l_suppkey")),
          Seq("l_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, d)
          .where(col("p_brand") =!= "Brand#13" &&
            col("p_size").isin(1, 5, 9, 13))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc,
          asc_nulls_first("p_brand"), asc_nulls_first("p_size"))
    },

    // Q10 shape: returned-item reporting — the top-20 customers by lost
    // revenue in a quarter. Three-table plan: date-pruned orders shuffle
    // against the returnflag-pruned lineitem on the order key; customer
    // and nation ride as broadcast dims; top-20 via sort+limit.
    QueryDef("q_tpch_q10",
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
        .join(Tables.lineitem(s, d).where(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).cast(DoubleType).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // Q10 over the orderkey-co-bucketed fact pair. The raw-layout q10 is
    // the suite's one CONFIRMED shuffle-bound TPC-H gate at sf10 (BENCH_
    // NOTES r14: the returnflag-pruned 20M-row lineitem side must shuffle
    // against the date-pruned orders — near-linear is the honest cost of
    // that join at fixed cores). The bucketed layout removes exactly that
    // movement: the join co-locates bucket-to-bucket, so the only hash
    // exchange left is the customer-grain aggregate — which moves
    // map-side PARTIAL aggregates, not fact rows. Same oracle as
    // q_tpch_q10; the bench delta is the receipt.
    QueryDef("q_tpch_q10_bucketed",
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.ordersByOrder(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
        .join(Tables.lineitemByOrder(s, d).where(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).cast(DoubleType).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // Q14 shape: the promo-revenue ratio — a conditional aggregate over
    // one broadcast join, output a single percentage. Both sums are
    // exact decimals cast to double; their quotient is one IEEE double
    // division of identical operands in both engines, rounded to 4dp.
    QueryDef("q_tpch_q14",
      """SELECT ROUND(100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
        |  4) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin) { (s, d) =>
      val revenue = col("l_extendedprice").cast(dec) *
        (lit(1) - col("l_discount").cast(dec))
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0).cast(dec))).cast(DoubleType) /
          sum(revenue).cast(DoubleType), 4).as("promo_revenue"))
    },

    // Q19 shape: the disjunctive join predicate — one equi-key
    // (l_partkey = p_partkey) carries the join; the OR-of-ANDs over
    // (brand, size range, quantity range) brackets is a post-join
    // residual, NOT a join condition, or the plan degrades to a
    // nested loop (the audit forbids BNLJ).
    QueryDef("q_tpch_q19",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND (
        |     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |      AND l_quantity BETWEEN 1 AND 20)
        |  OR (p_brand = 'Brand#7' AND p_size BETWEEN 5 AND 25
        |      AND l_quantity BETWEEN 10 AND 35)
        |  OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 40
        |      AND l_quantity BETWEEN 20 AND 50))""".stripMargin) { (s, d) =>
      val bracket =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(5, 25) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(20, 40) &&
          col("l_quantity").between(20, 50))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .where(bracket)
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // Q17 shape: the correlated SCALAR subquery — per-part average
    // quantity compared back to each row ("revenue lost to small
    // orders"). Catalyst plans the correlation as aggregate + rejoin;
    // here that shape is written out directly: the brand part
    // subset broadcasts into lineitem FIRST (so the per-part aggregate
    // runs over the pruned fact, not 60M rows), the per-part thresholds
    // aggregate in one partial/final shuffle, and the tiny threshold
    // table broadcasts BACK into the same pruned fact — fact rows
    // themselves never shuffle. Threshold follows the Q1 avg
    // convention (exact decimal sum cast to double over the bigint
    // count) so the boundary comparison is IEEE-identical per row in
    // both engines.
    QueryDef("q_tpch_q17",
      """WITH pq AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
        |li AS (SELECT l_partkey, l_quantity, l_extendedprice
        |       FROM lineitem JOIN pq ON l_partkey = p_partkey),
        |th AS (SELECT l_partkey,
        |         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |                / COUNT(*)) AS t
        |       FROM li GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM li JOIN th USING (l_partkey)
        |WHERE l_quantity < t""".stripMargin) { (s, d) =>
      val pq = broadcast(Tables.part(s, d)
        .where(col("p_brand") === "Brand#23").select(col("p_partkey")))
      def li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(pq, col("l_partkey") === col("p_partkey"))
        .drop("p_partkey")
      val th = li.groupBy("l_partkey")
        .agg((lit(0.2) * (sum(col("l_quantity").cast(dec)).cast(DoubleType) /
          count(lit(1)))).as("__t"))
      li.join(broadcast(th), Seq("l_partkey"))
        .where(col("l_quantity") < col("__t"))
        .agg((sum(col("l_extendedprice").cast(dec)).cast(DoubleType) / 7.0)
          .as("avg_yearly"))
    },

    // Q2 shape: the min-cost supplier — the OTHER correlated-scalar
    // family (per-group MIN equality-joined back to the row, surviving
    // ties included). The fixture has no partsupp, so the class is
    // expressed over lineitem as supply events: for each small part,
    // the European supplier rows achieving the minimum discounted
    // price. Same aggregate-rejoin discipline as Q17: the supplier ×
    // nation × region dim chain broadcasts into the fact, per-part
    // minima aggregate in one partial/final shuffle, and the minima
    // broadcast back — the equality join keeps EXACT decimals so a tie
    // can never flip on fp. At a scale where the per-part minima table
    // outgrows broadcast, drop the hint and AQE falls back to a shuffle
    // rejoin — the shape stays valid.
    QueryDef("q_tpch_q2",
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, n_name, s_acctbal
        |  FROM supplier, nation, region
        |  WHERE n_nationkey = s_nationkey AND r_regionkey = n_regionkey
        |    AND r_name = 'EUROPE'),
        |eligible AS (
        |  SELECT l_partkey, s_name, n_name, s_acctbal,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2))) AS cost
        |  FROM lineitem
        |  JOIN eu ON s_suppkey = l_suppkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_size <= 5),
        |mins AS (SELECT l_partkey AS mk, MIN(cost) AS min_cost
        |         FROM eligible GROUP BY 1)
        |SELECT l_partkey AS p_partkey, s_name, n_name, s_acctbal,
        |  CAST(cost AS DOUBLE) AS cost
        |FROM eligible JOIN mins ON l_partkey = mk AND cost = min_cost
        |ORDER BY s_acctbal DESC, n_name NULLS FIRST, s_name NULLS FIRST,
        |  p_partkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val eu = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "EUROPE")),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          col("s_acctbal")))
      val smallParts = broadcast(Tables.part(s, d)
        .where(col("p_size") <= 5).select(col("p_partkey")))
      def eligible = Tables.lineitem(s, d)
        .join(eu, col("s_suppkey") === col("l_suppkey"))
        .join(smallParts, col("p_partkey") === col("l_partkey"))
        .select(col("l_partkey"), col("s_name"), col("n_name"),
          col("s_acctbal"),
          (col("l_extendedprice").cast(dec) *
            (lit(1) - col("l_discount").cast(dec))).as("cost"))
      val mins = eligible.groupBy(col("l_partkey").as("__mk"))
        .agg(min("cost").as("__min_cost"))
      eligible.join(broadcast(mins),
          col("l_partkey") === col("__mk") && col("cost") === col("__min_cost"))
        .select(col("l_partkey").as("p_partkey"), col("s_name"), col("n_name"),
          col("s_acctbal"), col("cost").cast(DoubleType).as("cost"))
        .orderBy(col("s_acctbal").desc, asc_nulls_first("n_name"),
          asc_nulls_first("s_name"), col("p_partkey").asc)
        .limit(100)
    },

    // Q21 shape: the double-correlated EXISTS / NOT-EXISTS self-join
    // family ("suppliers who were the SOLE late shipper of a
    // multi-supplier order" — late = shipped >90 days after the order
    // date, the fixture's analogue of receipt>commit). The textbook
    // formulation self-joins the fact THREE times (base + EXISTS semi +
    // NOT-EXISTS anti); here both correlations fold into ONE grouped
    // pass over the orders⋈lineitem pair — per order key, count distinct
    // suppliers and distinct LATE suppliers, keep n_supp > 1 &&
    // n_late_supp == 1, and the sole late supplier is then the MAX over
    // the late rows (well-defined exactly because the count is 1). One
    // fact-pair shuffle + an agg that REUSES its partitioning, instead
    // of three orderkey exchanges — the Q18 single-pass discipline
    // applied to the heaviest TPC-H join query. The oracle replays the
    // textbook EXISTS/NOT-EXISTS, so the gate proves the rewrite.
    QueryDef("q_tpch_q21",
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name NULLS FIRST
        |LIMIT 50""".stripMargin) { (s, d) =>
      val isLate = col("l_shipdate") >
        (col("o_orderdate") + expr("INTERVAL 90 DAY"))
      // two-level aggregate instead of countDistinct: a multi-distinct
      // aggregate plans through Expand+gid (THREE exchanges measured);
      // pre-aggregating per (orderkey, suppkey) then per orderkey keeps
      // every phase keyed on the orderkey prefix, so both levels reuse
      // the join's partitioning — zero additional exchanges
      val perSupp = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        // numwait counts l1 ROWS, not orders: a sole-late supplier with
        // two late lineitems in one order scores twice (the textbook
        // EXISTS semantics the oracle replays)
        .agg(sum(when(isLate, 1L).otherwise(0L)).as("__late_rows_s"))
      val soleLate = perSupp
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("__n_supp"),
          count(when(col("__late_rows_s") > 0, lit(1))).as("__n_late"),
          max(when(col("__late_rows_s") > 0, col("l_suppkey"))).as("__late_supp"),
          sum(when(col("__late_rows_s") > 0, col("__late_rows_s"))
            .otherwise(0L)).as("__late_rows"))
        .where(col("__n_supp") > 1 && col("__n_late") === 1)
      soleLate
        .join(broadcast(Tables.supplier(s, d)),
          col("s_suppkey") === col("__late_supp"))
        .groupBy("s_name")
        .agg(sum("__late_rows").cast("bigint").as("numwait"))
        .orderBy(col("numwait").desc, asc_nulls_first("s_name"))
        .limit(50)
    },

    // Q21 over the orderkey-co-bucketed fact pair: the single-pass fold
    // groups on the bucket key, so BOTH the pair join and the grouped
    // correlation aggregate fold into the bucketed scans — the only hash
    // exchange left is the |suppliers|-sized s_name rollup. The heaviest
    // TPC-H join query (two fact shuffles raw) reduced to near-zero data
    // movement; same oracle as q_tpch_q21.
    QueryDef("q_tpch_q21_bucketed",
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name NULLS FIRST
        |LIMIT 50""".stripMargin) { (s, d) =>
      val isLate = col("l_shipdate") >
        (col("o_orderdate") + expr("INTERVAL 90 DAY"))
      // same two-level aggregate discipline as the raw gate (countDistinct
      // would plan through Expand and forfeit the bucketed partitioning)
      val perSupp = Tables.lineitemByOrder(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.ordersByOrder(s, d).select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(sum(when(isLate, 1L).otherwise(0L)).as("__late_rows_s"))
      val soleLate = perSupp
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("__n_supp"),
          count(when(col("__late_rows_s") > 0, lit(1))).as("__n_late"),
          max(when(col("__late_rows_s") > 0, col("l_suppkey"))).as("__late_supp"),
          sum(when(col("__late_rows_s") > 0, col("__late_rows_s"))
            .otherwise(0L)).as("__late_rows"))
        .where(col("__n_supp") > 1 && col("__n_late") === 1)
      soleLate
        .join(broadcast(Tables.supplier(s, d)),
          col("s_suppkey") === col("__late_supp"))
        .groupBy("s_name")
        .agg(sum("__late_rows").cast("bigint").as("numwait"))
        .orderBy(col("numwait").desc, asc_nulls_first("s_name"))
        .limit(50)
    },

    // Q22 shape: the GLOBAL scalar subquery + anti join ("rich customers
    // with no urgent order in the quarter", grouped by nation in place
    // of the reference's phone country code; the fixture generator gives
    // every customer SOME order, so the textbook never-ordered anti set
    // is vacuous — the priority+date-filtered anti side keeps the
    // identical plan family with load-bearing output). The global
    // average is one broadcast scalar — computed decimal-exact /
    // bigint-count so the boundary comparison is IEEE-identical in both
    // engines — and the NOT EXISTS is an anti join against the filtered
    // orders' customer keys.
    QueryDef("q_tpch_q22",
      """WITH avg_bal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*) AS ab
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, nation, avg_bal
        |WHERE c_nationkey = n_nationkey AND c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT'
        |                    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |                    AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00')
        |GROUP BY n_name
        |ORDER BY n_name NULLS FIRST""".stripMargin) { (s, d) =>
      val avgBal = Tables.customer(s, d).where(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast(dec)).cast(DoubleType) /
          count(lit(1))).as("__ab"))
      val urgent = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
        .select(col("o_custkey").as("c_custkey"))
      Tables.customer(s, d)
        .crossJoin(broadcast(avgBal)) // 1-row scalar, broadcast by design
        .where(col("c_acctbal") > col("__ab"))
        .join(urgent, Seq("c_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(dec)).cast(DoubleType).as("totacctbal"))
        .orderBy(asc_nulls_first("n_name"))
    },

    // Q6 shape: the pure scan-bound predicate aggregate — every filter
    // column is a parquet-pushable range, no join, no group-by key. The
    // plan the 100 TB case demands is exactly one scan with all three
    // predicates pushed (shipdate min/max prunes row groups on the
    // date-sorted archive layout) feeding ONE partial/final aggregate.
    // revenue multiplies two 2-dp money columns in exact decimal so the
    // sum is exact and the final double cast is canonical in both engines.
    QueryDef("q_tpch_q6",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // Q7 shape: bidirectional nation-pair volume — two independent dim
    // chains (supplier→nation, customer→nation) each pre-filtered to the
    // two nations of interest and broadcast, so the supplier probe prunes
    // the fact to ~2/25 of its rows BEFORE the one orders⋈lineitem
    // shuffle; the disjunctive (supp,cust) pair predicate rides as a
    // cheap residual after the customer broadcast. Grouping on
    // (supp_nation, cust_nation, year) keeps the output 2×2×years tiny.
    QueryDef("q_tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(volume) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation NULLS FIRST, cust_nation NULLS FIRST,
        |  l_year NULLS FIRST""".stripMargin) { (s, d) =>
      def pairNations = Tables.nation(s, d)
        .where(col("n_name").isin("NATION_1", "NATION_2"))
      val supp = broadcast(Tables.supplier(s, d)
        .join(broadcast(pairNations), col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val cust = broadcast(Tables.customer(s, d)
        .join(broadcast(pairNations), col("n_nationkey") === col("c_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation")))
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
        .join(supp, col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).cast(DoubleType).as("revenue"))
        .orderBy(asc_nulls_first("supp_nation"), asc_nulls_first("cust_nation"),
          asc_nulls_first("l_year"))
    },

    // Q8 shape: national market share — the conditional-ratio aggregate
    // over a SIX-dim star (part, supplier→nation, customer→nation→region).
    // Every dim chain broadcasts; the part filter prunes the fact hardest
    // so it probes first; the only shuffle is the orders⋈lineitem pair.
    // Numerator and denominator both sum exact decimal and cast to double
    // BEFORE the division so the share is one IEEE divide in both engines.
    QueryDef("q_tpch_q8",
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN nation = 'NATION_6' THEN volume ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
        |    n2.n_name AS nation
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n1.n_regionkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
        |GROUP BY o_year
        |ORDER BY o_year NULLS FIRST""".stripMargin) { (s, d) =>
      val promoParts = broadcast(Tables.part(s, d)
        .where(col("p_type") === "PROMO").select(col("p_partkey")))
      val suppNation = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation")))
      val amerCust = broadcast(Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "AMERICA")),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("c_custkey")))
      val vol = col("l_extendedprice").cast(dec) *
        (lit(1) - col("l_discount").cast(dec))
      Tables.lineitem(s, d)
        .join(promoParts, col("p_partkey") === col("l_partkey"))
        .join(suppNation, col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
            col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .join(amerCust, col("c_custkey") === col("o_custkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("nation") === "NATION_6", vol).otherwise(lit(0)))
            .cast(DoubleType) /
          sum(vol).cast(DoubleType)).as("mkt_share"))
        .orderBy(asc_nulls_first("o_year"))
    },

    // Q9 shape: product-type profit — group by (supplier nation, order
    // year) over a name-LIKE part subset. The fixture has no partsupp, so
    // the cost term uses the part's retail price in place of
    // ps_supplycost (same plan family: a per-row profit expression mixing
    // fact and dim columns). amount stays in exact decimal end to end —
    // (price·(1−disc)) − (retail·qty) — so the per-group sums are exact
    // and the double cast is canonical. LIKE '%gear%' cannot prune at the
    // scan, but the broadcast part probe drops ~87% of fact rows before
    // the one orders⋈lineitem shuffle.
    QueryDef("q_tpch_q9",
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2)) *
        |      CAST(l_quantity AS DECIMAL(18,2)) AS amount
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE p_name LIKE '%gear%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation NULLS FIRST, o_year DESC""".stripMargin) { (s, d) =>
      val gearParts = broadcast(Tables.part(s, d)
        .where(col("p_name").like("%gear%"))
        .select(col("p_partkey"), col("p_retailprice")))
      val suppNation = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation")))
      Tables.lineitem(s, d)
        .join(gearParts, col("p_partkey") === col("l_partkey"))
        .join(suppNation, col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1) - col("l_discount").cast(dec)) -
          col("p_retailprice").cast(dec) * col("l_quantity").cast(dec))
          .cast(DoubleType).as("sum_profit"))
        .orderBy(asc_nulls_first("nation"), col("o_year").desc)
    },

    // Q11 shape: important supply values — a grouped aggregate HAVING'd
    // against a fraction of its own GLOBAL total (the scalar-subquery-
    // over-the-same-aggregate family). Expressed without partsupp as
    // per-part shipped value for one nation's suppliers. The per-part
    // aggregate is the only fact shuffle; the global total re-aggregates
    // the (small) per-part frame and broadcasts back as a 1-row scalar —
    // never a second fact pass at the exchange level, and at 100 TB the
    // per-part frame is |parts|, not |lineitem|. The textbook's
    // FRACTION·total threshold needs per-SF retuning (0.0001/SF); here
    // the threshold is 1.5× the MEAN per-part value — scale-invariant
    // (load-bearing output at every SF), same scalar-subquery plan. Both
    // sides of the comparison are exact decimal sums cast to double
    // (mean = exact-sum / count, the house avg convention), so the
    // boundary is one IEEE compare in both engines.
    QueryDef("q_tpch_q11",
      """WITH nat_supp AS (
        |  SELECT s_suppkey FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_5'),
        |v AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS dval
        |  FROM lineitem JOIN nat_supp ON s_suppkey = l_suppkey
        |  GROUP BY l_partkey),
        |tot AS (SELECT 1.5 * (CAST(SUM(dval) AS DOUBLE) / COUNT(*)) AS thr
        |        FROM v)
        |SELECT l_partkey AS ps_partkey, CAST(dval AS DOUBLE) AS value
        |FROM v, tot WHERE CAST(dval AS DOUBLE) > thr
        |ORDER BY value DESC, ps_partkey""".stripMargin) { (s, d) =>
      val natSupp = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).where(col("n_name") === "NATION_5")),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey")))
      def perPart = Tables.lineitem(s, d)
        .join(natSupp, col("s_suppkey") === col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).as("__dval"))
      val thr = perPart
        .agg((lit(1.5) * (sum(col("__dval")).cast(DoubleType) /
          count(lit(1)))).as("__thr"))
      perPart
        .crossJoin(broadcast(thr)) // 1-row scalar, broadcast by design
        .where(col("__dval").cast(DoubleType) > col("__thr"))
        .select(col("l_partkey").as("ps_partkey"),
          col("__dval").cast(DoubleType).as("value"))
        .orderBy(col("value").desc, col("ps_partkey").asc)
    },

    // Q12 shape: shipping-mode priority counts — the two-conditional-sum
    // aggregate over a fact⋈fact join with a non-equi residual. The
    // fixture has no l_shipmode/commitdate/receiptdate, so the mode is
    // l_returnflag and "late" is shipped >60 days after the order date
    // (the q21 lateness criterion). One orderkey shuffle, residual rides
    // the join, two CASE sums in one partial/final aggregate over a
    // 2-row group space.
    QueryDef("q_tpch_q12",
      """SELECT l_returnflag AS shipmode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('A','R')
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY shipmode NULLS FIRST""".stripMargin) { (s, d) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy(col("l_returnflag").as("shipmode"))
        .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(asc_nulls_first("shipmode"))
    },

    // Q15 shape: top supplier — the correlated scalar MAX over a derived
    // view, rejoined by EXACT-decimal equality so revenue ties all
    // surface (the textbook view + max(total_revenue) subquery). The
    // quarter's per-supplier revenue aggregates in one fact shuffle; the
    // global max re-aggregates the |suppliers|-row frame and broadcasts
    // back as a 1-row scalar; supplier names ride a broadcast dim join.
    QueryDef("q_tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey),
        |mx AS (SELECT MAX(total_rev) AS m FROM revenue)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |JOIN mx ON total_rev = m
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      def revenue = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-04-01 00:00:00").cast(TimestampType))
        .groupBy(col("l_suppkey").as("__supplier_no"))
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).as("__total_rev"))
      val mx = revenue.agg(max(col("__total_rev")).as("__m"))
      revenue
        .crossJoin(broadcast(mx)) // 1-row scalar, broadcast by design
        .where(col("__total_rev") === col("__m"))
        .join(broadcast(Tables.supplier(s, d)),
          col("s_suppkey") === col("__supplier_no"))
        .select(col("s_suppkey"), col("s_name"),
          col("__total_rev").cast(DoubleType).as("total_revenue"))
        .orderBy(col("s_suppkey").asc)
    },

    // Q20 shape: the nested semi-join chain ("suppliers who dominate a
    // part's shipped volume") — per-(supplier,part) quantity compared to
    // a correlated per-part scalar, the qualifying pair set DISTINCT'd to
    // supplier keys, and suppliers of one nation SEMI-joined against it.
    // Without partsupp, "availqty > ½·shipped" becomes "pair shipped >
    // ½·part total shipped" (a majority supplier) — same plan family:
    // aggregate → correlated-threshold rejoin → distinct → semi join.
    // The (supp,part) aggregate is the only fact shuffle; the per-part
    // threshold re-aggregates the small pair frame and rejoins broadcast;
    // thresholds stay decimal-exact until one double cast per side.
    QueryDef("q_tpch_q20",
      """WITH qty AS (
        |  SELECT l_suppkey, l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dsq
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey),
        |thr AS (SELECT l_partkey AS tk, CAST(SUM(dsq) AS DOUBLE) * 0.5 AS t
        |        FROM qty GROUP BY l_partkey),
        |dom AS (SELECT DISTINCT l_suppkey FROM qty JOIN thr ON l_partkey = tk
        |        WHERE CAST(dsq AS DOUBLE) > t)
        |SELECT s_name
        |FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |WHERE n_name = 'NATION_7'
        |  AND s_suppkey IN (SELECT l_suppkey FROM dom)
        |ORDER BY s_name NULLS FIRST""".stripMargin) { (s, d) =>
      val smallParts = broadcast(Tables.part(s, d)
        .where(col("p_name").like("small%")).select(col("p_partkey")))
      def pairQty = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast(TimestampType) &&
          col("l_shipdate") < lit("1999-01-01 00:00:00").cast(TimestampType))
        .join(smallParts, col("p_partkey") === col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity").cast(dec)).as("__dsq"))
      val thr = pairQty.groupBy(col("l_partkey").as("__tk"))
        .agg((sum(col("__dsq")).cast(DoubleType) * 0.5).as("__t"))
      val dominant = pairQty
        .join(broadcast(thr), col("l_partkey") === col("__tk"))
        .where(col("__dsq").cast(DoubleType) > col("__t"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).where(col("n_name") === "NATION_7")),
          col("n_nationkey") === col("s_nationkey"))
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"))
        .orderBy(asc_nulls_first("s_name"))
    },

    // --- non-agg projection + deterministic limit (§2.2/§2.6) -------------
    QueryDef("q_nonagg_projection",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey % 100 = 3
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_orderkey") % 100 === 3)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    QueryDef("q_nonagg_limit",
      """SELECT l_orderkey, l_linenumber, l_shipdate
        |FROM lineitem
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST
        |LIMIT 1000""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    },

    // --- wildcard projection (§2.2) ----------------------------------------
    QueryDef("q_wildcard_projection",
      "SELECT * FROM nation ORDER BY n_nationkey NULLS FIRST") { (s, d) =>
      Tables.nation(s, d).orderBy("n_nationkey")
    },

    // --- joins (§2.3): broadcast dim lookup, LEFT OUTER many-to-one --------
    QueryDef("q_join_dim_broadcast",
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand NULLS FIRST""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left_outer")
        .groupBy("p_brand")
        .agg(sum(col("l_extendedprice").cast(dec)).cast(DoubleType).as("revenue"))
        .orderBy("p_brand")
    },

    QueryDef("q_join_multi_dim",
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |LEFT JOIN nation ON s_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val na = Tables.nation(s, d)
      val re = Tables.region(s, d)
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left_outer")
        .join(broadcast(na), sup("s_nationkey") === na("n_nationkey"), "left_outer")
        .join(broadcast(re), na("n_regionkey") === re("r_regionkey"), "left_outer")
        .groupBy("r_name", "n_name")
        .agg(sum(col("l_extendedprice").cast(dec)).cast(DoubleType).as("revenue"))
        .orderBy("r_name", "n_name")
    },

    // join miss → null foreign values (reference hash-lookup semantics,
    // /root/reference/query/hash_lookup.cu:73-86)
    QueryDef("q_join_miss_null",
      """SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem
        |LEFT JOIN (SELECT * FROM part WHERE p_size > 25) p ON l_partkey = p.p_partkey
        |GROUP BY p.p_brand ORDER BY p_brand NULLS FIRST""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).where(col("p_size") > 25)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left_outer")
        .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    },

    // --- scalar expression surface (§2.7) ----------------------------------
    QueryDef("q_expr_case_when",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END
        |      AS DECIMAL(18,2))) AS DOUBLE) AS discounted_rev
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))
          .otherwise(lit(0)).cast(dec)).cast(DoubleType).as("discounted_rev"))
        .orderBy("l_returnflag")
    },

    QueryDef("q_expr_in_filter",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem WHERE l_returnflag IN ('A', 'N')
        |GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("A", "N"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    QueryDef("q_expr_arith",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS charge
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).cast(DecimalType(18, 6)))
          .cast(DoubleType).as("charge"))
        .orderBy("l_returnflag")
    },

    // div always promotes to float in the reference
    // (/root/reference/query/context/query_context_helper.go:257-261)
    QueryDef("q_expr_div",
      """SELECT l_linestatus,
        |  ROUND(AVG(l_extendedprice / l_quantity), 4) AS avg_unit_price
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(round(avg(col("l_extendedprice") / col("l_quantity")), 4)
          .as("avg_unit_price"))
        .orderBy("l_linestatus")
    },

    // binary floor(x, n) = floor(x/n)*n (reference functor FloorFunctor)
    QueryDef("q_expr_floor_bucket",
      """SELECT CAST(FLOOR(l_extendedprice / 1000) * 1000 AS BIGINT) AS price_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY price_bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy((floor(col("l_extendedprice") / 1000) * 1000)
          .cast(LongType).as("price_bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("price_bucket")
    },

    QueryDef("q_expr_mod",
      """SELECT l_orderkey % 7 AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy((col("l_orderkey") % 7).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },

    QueryDef("q_expr_bitwise",
      """SELECT l_orderkey & 3 AS and_bits, (l_orderkey >> 2) & 1 AS shift_bit,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY and_bits NULLS FIRST, shift_bit NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").bitwiseAND(3).as("and_bits"),
          shiftright(col("l_orderkey"), 2).bitwiseAND(1).as("shift_bit"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("and_bits", "shift_bit")
    },

    QueryDef("q_expr_is_null",
      """SELECT NULLIF(l_returnflag, 'R') AS flag_or_null,
        |  CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'R') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY flag_or_null NULLS FIRST""".stripMargin) { (s, d) =>
      val flagOrNull = nullif(col("l_returnflag"), lit("R"))
      Tables.lineitem(s, d)
        .groupBy(flagOrNull.as("flag_or_null"))
        .agg(sum(when(flagOrNull.isNull, 1).otherwise(0)).cast(LongType).as("null_cnt"),
          count(lit(1)).as("cnt"))
        .orderBy("flag_or_null")
    }
  )
}
