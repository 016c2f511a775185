package graft.aql

import graft.SparkSpec

/** Physical-plan assertions for compiled AQL queries: the declarative plan
  * must actually get the Catalyst optimizations the design relies on
  * (SURVEY §4.1) — predicate pushdown to the parquet scan, column pruning,
  * broadcast dim joins, partial/final aggregation.
  */
class PlanSpec extends SparkSpec {

  private def compile(json: String) =
    new AqlCompiler(Catalog.testdata(sfDir), spark).compile(AqlJson.parseQuery(json)).df

  /** All file scans, descending through the AQE wrapper (whose treeString
    * truncates long filter lists — assert on scan METADATA, not strings).
    */
  private def fileScans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def go(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => (other.children ++ other.subqueries).flatMap(go)
    }
    go(df.queryExecution.executedPlan)
  }

  test("time filter and row filters push down to the parquet scan") {
    val df = compile("""{
      "table": "events",
      "measures": [{"alias": "value", "sqlExpression": "count(*)",
                    "rowFilters": ["event_type = 'click'"]}],
      "timeFilter": {"from": "1706572800", "to": "1706659200"},
      "now": 1706659200
    }""")
    val pushed = fileScans(df).map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(event_type,click)"), s"row filter not pushed: $pushed")
    // events is served from the day-partitioned archive by DEFAULT, where
    // `ts` is a stored TimestampType column: the time range pushes to the
    // parquet row groups (on the raw single-file layout the nanos→µs
    // conversion made it a computed column that could not push)
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"ts range not pushed to the archive scan: $pushed")
  }

  test("DEFAULT catalog: compiled time filter statically prunes day partitions") {
    val df = compile("""{
      "table": "events",
      "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
      "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
      "timeFilter": {"from": "1704412800", "to": "1704672000"},
      "now": 1706659200
    }""")
    val scans = fileScans(df)
    // the compiler widens the time filter to day-range predicates on the
    // archive partition column (the reference's day-range scan,
    // aql_compiler.go:1047-1056) — they must land in PartitionFilters
    val pf = scans.map(_.partitionFilters.mkString(",")).mkString
    assert(pf.contains("day"), s"day-range predicates missing from PartitionFilters: $pf")
    // and the pruned scan reads only the 3 filtered days' partitions
    val parts = scans.map(_.selectedPartitions.partitionCount)
    assert(parts.nonEmpty && parts.head == 3,
      s"expected 3 pruned day partitions, got $parts")
  }

  test("native timestamp range filters push to the scan (lineitem.l_shipdate)") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      .groupBy("l_returnflag").count()
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("GreaterThanOrEqual(l_shipdate") &&
      scan.contains("LessThan(l_shipdate"), s"range not pushed:\n$scan")
  }

  test("column pruning reaches the scan: only referenced columns are read") {
    val df = compile("""{
      "table": "events",
      "measures": [{"alias": "value", "sqlExpression": "sum(value)"}],
      "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
      "timeFilter": {"from": "1704067200"},
      "now": 1706659200
    }""")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("props"), s"unreferenced column read:\n$scan")
    assert(!scan.contains("user_id"), s"unreferenced column read:\n$scan")
  }

  test("dimension joins broadcast and aggregation is partial/final") {
    val df = compile("""{
      "table": "lineitem",
      "joins": [{"table": "part", "conditions": ["lineitem.l_partkey = part.p_partkey"]}],
      "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
      "dimensions": [{"alias": "brand", "sqlExpression": "part.p_brand"}]
    }""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim join must broadcast, not shuffle")
    assert(!plan.contains("SortMergeJoin"), "no shuffle join expected")
    // partial + final aggregation around one exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, "partial/final agg expected")
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    val df = compile("""{
      "table": "events",
      "measures": [{"alias": "value", "sqlExpression": "count(*)",
                    "rowFilters": ["value > 10"]}],
      "dimensions": [{"alias": "h", "sqlExpression": "ts", "timeBucketizer": "hour"}],
      "timeFilter": {"from": "1704067200"},
      "now": 1706659200
    }""")
    // AQE finalizes stages lazily, and only within the SAME QueryExecution:
    // collect() on the df itself (a write would plan a fresh execution)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd stages render as `*(n)` operator prefixes in the final plan
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined,
      s"bucketizer exprs must stay codegen'd:\n$plan")
  }
}
