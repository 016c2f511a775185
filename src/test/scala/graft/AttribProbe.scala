package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q_event_attribution_diff attribution (OPTIMIZATION_r15.md). */
object AttribProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_REDUCERS", cpus))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${2 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (rnd <- 1 to 2) {
      println(s"--- round $rnd ---")
      val ev = Tables.eventsByUser(spark, d)
      val withoutLate = ev.where(!(col("event_type").isin("view", "click") &&
        col("event_id") % 7 === 3))
      time("  credits(batch side)") {
        noop(graft.operators.Sessions.attributionCredits(ev, "user_id", "ts",
          "event_type", Seq("view", "click"), "purchase", 259200L, 86400L))
      }
      time("  credits(streamed sim)") {
        noop(graft.operators.Sessions.attributionCredits(withoutLate, "user_id",
          "ts", "event_type", Seq("view", "click"), "purchase", 259200L, 86400L))
      }
      val streamedSim = graft.operators.Sessions.attributionCredits(
          withoutLate, "user_id", "ts", "event_type", Seq("view", "click"),
          "purchase", 259200L, 86400L)
        .select(col("user"), col("conv_ts").as("convTs"),
          col("touch_type").as("touchType"), col("touch_ts").as("touchTs"),
          col("first_touch").as("firstTouch"), col("last_touch").as("lastTouch"),
          col("linear"), col("position_based").as("positionBased"),
          col("time_decay").as("timeDecay"))
      time("  full diff") {
        noop(graft.operators.Sessions.attributionDiff(streamedSim, ev,
          "user_id", "ts", "event_type", Seq("view", "click"), "purchase",
          259200L, 86400L, 0L, 4102444800L))
      }
    }
    spark.stop()
  }
}
