package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("sessions close on watermark, merge across batches, split on gaps") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val events = source.toDF().toDF("user_id", "ts")
    val query = StreamingSessions.runToMemory(spark, events, "user_id", "ts",
      gap = "30 seconds", watermarkDelay = "10 seconds", sinkName = "sess_sink")
    try {
      // batch 1: two bursts for user 1, 100s apart (two sessions), and a
      // burst for user 2
      source.addData((1L, ts(100)), (1L, ts(110)), (2L, ts(105)))
      query.processAllAvailable()
      // batch 2: an event at 125 bridges nothing (within 30s of 110 —
      // MERGES into user 1's first session despite arriving later);
      // watermark-advancing far-future event closes everything old
      source.addData((1L, ts(125)))
      query.processAllAvailable()
      source.addData((9L, ts(10000)))
      query.processAllAvailable()
      source.addData((9L, ts(20000))) // advance watermark past 10000+30
      query.processAllAvailable()

      val rows = spark.table("sess_sink")
        .orderBy("user_id", "session_start")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000, r.getLong(3)))
      // user 1: ONE session 100..155 (125 merged in, end = last + gap)
      assert(rows.contains((1L, 100L, 155L, 3L)), rows.mkString("\n"))
      // user 2: single-event session 105..135
      assert(rows.contains((2L, 105L, 135L, 1L)), rows.mkString("\n"))
      // user 9's first event closed by the second
      assert(rows.contains((9L, 10000L, 10030L, 1L)), rows.mkString("\n"))
      // no split session for user 1 leaked out
      assert(rows.count(_._1 == 1L) == 1, rows.mkString("\n"))
    } finally query.stop()
  }

  test("events behind the watermark are dropped, not resurrected") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val events = source.toDF().toDF("user_id", "ts")
    val query = StreamingSessions.runToMemory(spark, events, "user_id", "ts",
      gap = "30 seconds", watermarkDelay = "10 seconds", sinkName = "sess_late")
    try {
      source.addData((1L, ts(100)))
      query.processAllAvailable()
      source.addData((8L, ts(50000)))   // watermark leaps forward
      query.processAllAvailable()
      source.addData((1L, ts(101)))     // far behind the watermark
      source.addData((8L, ts(90000)))   // closes user 8's first session
      query.processAllAvailable()
      val user1 = spark.table("sess_late").where($"user_id" === 1L)
        .collect().map(r => r.getLong(3))
      // the late event must not reopen or grow the closed session
      assert(user1.toSeq == Seq(1L), user1.mkString(", "))
    } finally query.stop()
  }
}
