package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Broker scatter-gather overhead receipt (diagnostic main, test scope —
  * `sbt "Test/runMain graft.BrokerOverheadProbe <sfDir>"`): the AQL gate
  * vocabulary through a 3-member in-process broker topology (each member
  * serving a disjoint day third of events) vs ONE instance serving the
  * whole table, same JVM, same session. Reported per query min-of-2 +
  * the total ratio — BrokerSpec proves the merge algebra; this prints
  * what the tier COSTS. Findings go to BENCH_NOTES (r15).
  */
object BrokerOverheadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.aql.Catalog.testdata(dir)

    // day-range thirds, the reference's shard deployment shape
    def sliced(from: Option[String], to: Option[String]): graft.aql.Catalog = {
      val ev = base.tables("events")
      val day = col(graft.ingest.Archiver.DayCol)
      val pred = (from.map(day >= lit(_)).toSeq ++ to.map(day < lit(_)))
        .reduceOption(_ && _).getOrElse(lit(true))
      base.copy(tables = base.tables +
        ("events" -> ev.copy(load = s => ev.load(s).where(pred))))
    }
    Tables.eventsArchived(spark, dir) // build the day-partitioned fixture
    val days = graft.exec.SliceBootstrap.localDays(spark,
      Tables.eventsArchivePath(dir))
    require(days.length >= 3, s"fixture too small: $days")
    val (c1, c2) = (days(days.length / 3), days(2 * days.length / 3))
    val members = Seq(
      sliced(None, Some(c1)), sliced(Some(c1), Some(c2)), sliced(Some(c2), None))
      .map { cat => val s = new graft.api.GraftServer(cat, spark); s.start(); s }
    val whole = { val s = new graft.api.GraftServer(base, spark); s.start(); s }
    val broker = new graft.exec.Broker(
      members.map(m => s"http://localhost:${m.boundPort}"))
    val wholeBroker = new graft.exec.Broker(
      Seq(s"http://localhost:${whole.boundPort}"))

    def q(measure: String, dims: String =
        """[{"alias": "et", "sqlExpression": "event_type"}]""",
        extra: String = ""): String =
      s"""{"table": "events",
          "measures": [{"alias": "value", "sqlExpression": "$measure"}],
          "dimensions": $dims,
          "timeFilter": {"from": "1704067200", "to": "1706659200"},
          "now": 1706659200$extra}"""

    // the AQL-compatible vocabulary: plain folds, avg's two-wave split,
    // derived decomposition, HLL register merge, buckets, expression
    // dims, filters, dimensionless, non-agg concat, sorted top-k
    val queries: Seq[(String, String)] = Seq(
      "count_star" -> q("count(*)"),
      "sum" -> q("sum(value)"),
      "min" -> q("min(value)"),
      "max" -> q("max(value)"),
      "avg_split" -> q("avg(value)"),
      "derived_rate" -> q("sum(value) / count(*)"),
      "hll_users" -> q("countdistincthll(user_id)"),
      "bucket_hour" -> q("count(*)",
        """[{"alias": "h", "sqlExpression": "ts", "timeBucketizer": "hour"}]"""),
      "expr_dim" -> q("sum(value)",
        """[{"alias": "b", "sqlExpression": "user_id % 10"}]"""),
      "filtered" -> q("count(*)").replace(""""dimensions"""",
        """"rowFilters": ["event_type = 'click'"], "dimensions""""),
      "dimensionless" -> q("sum(value)", "[]"),
      "nonagg_limit" ->
        s"""{"table": "events",
            "measures": [{"alias": "value", "sqlExpression": "1"}],
            "dimensions": [{"alias": "eid", "sqlExpression": "event_id"},
                           {"alias": "et", "sqlExpression": "event_type"}],
            "timeFilter": {"from": "1704067200", "to": "1706659200"},
            "now": 1706659200, "limit": 50}""",
      "sorted_topk" ->
        s"""{"table": "events",
            "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
            "dimensions": [{"alias": "u", "sqlExpression": "user_id % 100"}],
            "timeFilter": {"from": "1704067200", "to": "1706659200"},
            "now": 1706659200, "limit": 10,
            "sorts": [{"name": "value", "order": "desc"}]}""")

    def minOf2(f: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    // warm both paths (codegen, archive layout build)
    broker.aql(queries.head._2); wholeBroker.aql(queries.head._2)

    var totalB = 0.0
    var totalS = 0.0
    println(f"[broker-ovh] ${"query"}%-14s ${"broker3"}%8s ${"single"}%8s  ratio")
    queries.foreach { case (name, body) =>
      val tb = minOf2(broker.aql(body))
      val ts = minOf2(wholeBroker.aql(body))
      totalB += tb; totalS += ts
      println(f"[broker-ovh] $name%-14s $tb%8.3f $ts%8.3f  ${tb / ts}%5.2f")
    }
    println(f"[broker-ovh] TOTAL          $totalB%8.3f $totalS%8.3f  ${totalB / totalS}%5.2f")
    members.foreach(_.stop()); whole.stop()
    spark.stop()
  }
}
