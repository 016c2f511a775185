package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import StreamingFunnel.{Advance, Event}

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("stage advances emit as they happen; order chains within a batch; no regress") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val query = StreamingFunnel.runToMemory(spark, source.toDS(),
      Seq("view", "click", "purchase"), "funnel_sink")
    try {
      // u1 starts; u2's click without a view advances nothing
      source.addData(Event(1, 10, "view"), Event(2, 10, "click"))
      query.processAllAvailable()
      def rows() = spark.table("funnel_sink").as[Advance].collect().toSet
      assert(rows() == Set(Advance(1, 1, 10)))

      // one batch, events ADDED out of time order: the group replays in
      // ts order, so u1 chains straight through to stage 3
      source.addData(Event(1, 30, "purchase"), Event(1, 20, "click"),
        Event(2, 15, "view"))
      query.processAllAvailable()
      assert(rows() == Set(Advance(1, 1, 10), Advance(1, 2, 20),
        Advance(1, 3, 30), Advance(2, 1, 15)))

      // stale + regressive events are inert: an old view cannot restart
      // u1, a click BEFORE u2's view time cannot advance u2
      source.addData(Event(1, 5, "view"), Event(2, 12, "click"))
      query.processAllAvailable()
      assert(rows() == Set(Advance(1, 1, 10), Advance(1, 2, 20),
        Advance(1, 3, 30), Advance(2, 1, 15)))

      // u2 completes stage 2 at-or-after their stage-1 time
      source.addData(Event(2, 15, "click"))
      query.processAllAvailable()
      assert(rows().contains(Advance(2, 2, 15)))
    } finally query.stop()
  }

  test("ttl group function: timeout evicts state so the funnel restarts") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // drive the TTL variant deterministically via TestGroupState (the
    // StreamingUpsertSpec discipline — ProcessingTimeTimeout cannot be
    // driven from a real stream in a test)
    val fn = StreamingFunnel.advanceGroupTtl(IndexedSeq("view", "click"), 200L) _

    val timedOut = TestGroupState.create[StreamingFunnel.FunnelState](
      Optional.empty[StreamingFunnel.FunnelState],
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = true)
    assert(fn(7L, Iterator.empty, timedOut).isEmpty)

    val live = TestGroupState.create[StreamingFunnel.FunnelState](
      Optional.empty[StreamingFunnel.FunnelState],
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = false)
    val out = fn(7L, Iterator(Event(7, 10, "view")), live).toSeq
    assert(out == Seq(Advance(7, 1, 10)))
    assert(live.exists, "advancing a user must persist state")
  }
}
