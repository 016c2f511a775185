package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event times start at t=100s and the two streams are drained in
  * separate processAllAvailable stages: Spark's join operator drops
  * input rows whose event time is <= the current global watermark, and
  * the watermark starts at epoch 0 — a t=0 event is "late" into an
  * empty stream. Staging also pins batch order, so the assertions don't
  * race the engine's per-source batch interleaving.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("interval join pairs events inside the window and matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val query = StreamJoin.runToMemory(spark,
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts", withinSec = 10,
      leftDelay = "5 seconds", rightDelay = "5 seconds",
      joinType = "inner", sinkName = "sj_inner")
    try {
      val impData = Seq((1L, ts(100)), (2L, ts(103)), (3L, ts(104)))
      // ad 1: click at +4 (in), ad 2: click at +20 (out), ad 4: no imp
      val clickData = Seq((1L, ts(104)), (2L, ts(123)), (4L, ts(105)))
      imps.addData(impData: _*)
      query.processAllAvailable() // imps buffered before any click arrives
      clicks.addData(clickData: _*)
      query.processAllAvailable()

      val streamed = spark.table("sj_inner")
        .select("ad_id", "imp_ts", "click_ts")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      val batch = impData.toDF("ad_id", "imp_ts")
        .join(clickData.toDF("ad_id", "click_ts"), "ad_id")
        .where($"click_ts" >= $"imp_ts" &&
          $"click_ts" <= $"imp_ts" + org.apache.spark.sql.functions
            .expr("INTERVAL 10 SECONDS"))
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed == Set((1L, ts(100), ts(104))), streamed.toString)
    } finally query.stop()
  }

  test("left outer emits the null row once the right watermark closes the window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val query = StreamJoin.runToMemory(spark,
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts", withinSec = 10,
      leftDelay = "5 seconds", rightDelay = "5 seconds",
      joinType = "leftOuter", sinkName = "sj_outer")
    try {
      imps.addData((1L, ts(100)), (2L, ts(101)))
      query.processAllAvailable()
      clicks.addData((1L, ts(104)))
      query.processAllAvailable()
      // the unmatched ad 2 must NOT have produced its null row while a
      // match is still possible (watermark has not passed 101+10+5)
      val early = spark.table("sj_outer")
        .as[(Long, Timestamp, Timestamp)].collect()
      assert(!early.exists(r => r._1 == 2L),
        s"null row emitted before the window closed: ${early.mkString(",")}")

      // push both watermarks far past ad 2's window, twice (watermark
      // takes effect on the batch AFTER the data that advances it)
      imps.addData((9L, ts(1000))); clicks.addData((9L, ts(1000)))
      query.processAllAvailable()
      imps.addData((9L, ts(2000))); clicks.addData((9L, ts(2000)))
      query.processAllAvailable()

      val rows = spark.table("sj_outer")
        .as[(Long, Timestamp, Timestamp)].collect()
        .filter(_._1 <= 2L).toSet
      assert(rows == Set((1L, ts(100), ts(104)), (2L, ts(101), null)),
        rows.toString)
    } finally query.stop()
  }

  test("overlapping non-key columns are rejected loudly") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Timestamp)]
    val b = MemoryStream[(Long, Timestamp)]
    val e = intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(
        a.toDF().toDF("k", "ts1"), b.toDF().toDF("k", "ts1"),
        "k", "ts1", "ts1", 10, "5 seconds", "5 seconds")
    }
    assert(e.getMessage.contains("timestamp columns"))
  }
}
