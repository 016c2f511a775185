package graft.ingest

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  private def shuffles(plan: SparkPlan): Int = {
    def go(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case s: ShuffleExchangeExec => 1 + s.children.map(go).sum
      case other => other.children.map(go).sum
    }
    go(plan)
  }

  test("co-bucketed join and keyed aggregation run shuffle-free") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the join strategy that would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ev = Tables.events(spark, sfDir)
      Bucketed.write(ev.select("event_id", "user_id", "value"),
        "user_id", 4, "ev_bucketed_a")
      Bucketed.write(ev.select(col("event_id").as("eid2"), col("user_id")),
        "user_id", 4, "ev_bucketed_b")

      val joined = Bucketed.join(spark, "ev_bucketed_a", "ev_bucketed_b", "user_id")
      joined.collect()
      assert(shuffles(joined.queryExecution.executedPlan) == 0,
        joined.queryExecution.executedPlan.toString)

      // keyed aggregation on the bucket key also skips the exchange
      val agg = spark.table("ev_bucketed_a").groupBy("user_id")
        .agg(sum("value").as("v"))
      agg.collect()
      assert(shuffles(agg.queryExecution.executedPlan) == 0,
        agg.queryExecution.executedPlan.toString)

      // and the result is still correct
      val expect = ev.select("event_id").distinct().count()
      assert(joined.select("event_id").distinct().count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")
    }
  }
}
