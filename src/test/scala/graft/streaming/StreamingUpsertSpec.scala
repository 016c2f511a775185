package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import StreamingUpsert.Record

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("keyed state converges to the latest row per PK across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Record]
    val query = StreamingUpsert.runToMemory(spark, source.toDS(), "upsert_sink")
    try {
      source.addData(Record(1, 1, 10.0), Record(2, 1, 20.0), Record(1, 2, 11.0))
      query.processAllAvailable()
      // in-batch: key 1 seq 2 wins immediately
      val afterFirst = spark.table("upsert_sink")
        .groupBy("key").agg(max_by(struct($"seq", $"payload"), $"seq").as("s"))
        .select($"key", $"s.payload").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(afterFirst == Map(1L -> 11.0, 2L -> 20.0))

      // cross-batch: later seq overwrites, stale seq is ignored
      source.addData(Record(2, 5, 25.0), Record(1, 0, 999.0), Record(3, 1, 30.0))
      query.processAllAvailable()
      val afterSecond = spark.table("upsert_sink")
        .groupBy("key").agg(max_by(struct($"seq", $"payload"), $"seq").as("s"))
        .select($"key", $"s.payload").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(afterSecond == Map(1L -> 11.0, 2L -> 25.0, 3L -> 30.0))

      // the stale update for key 1 must not have been emitted at all
      val emittedForKey1 = spark.table("upsert_sink")
        .where($"key" === 1).collect().map(_.getDouble(2)).toSet
      assert(!emittedForKey1.contains(999.0), "stale record leaked downstream")
    } finally query.stop()
  }

  test("ttl group function: timeout evicts state; live keys re-arm the timer") {
    // deterministic unit drive via TestGroupState (the streaming-engine
    // path with ProcessingTimeTimeout cannot be driven deterministically
    // from a test — timeouts fire on wall-clock batch boundaries)
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val fn = StreamingUpsert.updateGroupTtl(200) _

    // timeout invocation: state removed, nothing emitted
    val timedOut = TestGroupState.create[Record](
      Optional.of(Record(1, 100, 1.0)), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = true)
    assert(fn(1L, Iterator.empty, timedOut).isEmpty)
    assert(timedOut.isRemoved, "timed-out key's state must be evicted")

    // normal invocation: latest-wins semantics unchanged, timer re-armed
    val live = TestGroupState.create[Record](
      Optional.of(Record(1, 100, 1.0)), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = false)
    val out = fn(1L, Iterator(Record(1, 150, 2.0), Record(1, 120, 9.9)), live).toSeq
    assert(out == Seq(Record(1, 150, 2.0)))
    assert(live.get == Record(1, 150, 2.0))
    assert(live.getTimeoutTimestampMs.isPresent,
      "live key must re-arm its eviction timer")

    // stale record against surviving state: suppressed, timer still re-armed
    val stale = TestGroupState.create[Record](
      Optional.of(Record(1, 100, 1.0)), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = false)
    assert(fn(1L, Iterator(Record(1, 50, 2.0)), stale).isEmpty)
    assert(stale.get == Record(1, 100, 1.0))
  }
}
