package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingHoppingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("windows fan out per event, finalize on watermark, match the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val events = source.toDF().toDF("user_id", "ts")
    val query = StreamingHopping.runToMemory(spark, events, "ts",
      sizeSec = 10, strideSec = 5, watermarkDelay = "5 seconds",
      aggs = Seq(count(lit(1)).as("cnt")), sinkName = "hop_sink")
    try {
      val data = Seq((1L, ts(0)), (1L, ts(7)), (2L, ts(10)))
      source.addData(data: _*)
      query.processAllAvailable()
      source.addData((9L, ts(1000))) // watermark far past every window end
      query.processAllAvailable()
      source.addData((9L, ts(2000))) // advance again so 1000's windows close
      query.processAllAvailable()

      val streamed = spark.table("hop_sink")
        .select("window_start", "window_end", "cnt")
        .orderBy("window_start")
        .as[(Long, Long, Long)].collect().toSeq
      val batch = graft.operators.Sessions.hoppingAgg(
          data.toDF("user_id", "ts"), "ts", 10, 5,
          Seq(count(lit(1)).as("cnt")))
        .select("window_start", "window_end", "cnt")
        .orderBy("window_start")
        .as[(Long, Long, Long)].collect().toSeq
      // every batch window is present with the same count (the 1000/2000
      // sentinel windows may trail in the stream output)
      batch.foreach(b => assert(streamed.contains(b),
        s"missing window $b in:\n${streamed.mkString("\n")}"))
      // cross-check one overlap: t=7 is in [0,10) and [5,15)
      assert(batch.contains((0L, 10L, 2L)) && batch.contains((5L, 15L, 2L)))
    } finally query.stop()
  }

  test("late events behind the watermark never update a closed window") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val events = source.toDF().toDF("user_id", "ts")
    val query = StreamingHopping.runToMemory(spark, events, "ts",
      sizeSec = 10, strideSec = 5, watermarkDelay = "5 seconds",
      aggs = Seq(count(lit(1)).as("cnt")), sinkName = "hop_late")
    try {
      source.addData((1L, ts(0)))
      query.processAllAvailable()
      source.addData((8L, ts(5000)))
      query.processAllAvailable()
      source.addData((1L, ts(1))) // behind the watermark: dropped
      source.addData((8L, ts(9000)))
      query.processAllAvailable()
      val w0 = spark.table("hop_late")
        .where(col("window_start") === 0L).select("cnt")
        .as[Long].collect().toSeq
      assert(w0 == Seq(1L), s"late event resurrected window 0: $w0")
    } finally query.stop()
  }
}
