package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import StreamingAttribution.{Credit, Event}

class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  test("credits emit at conversion time with the batch operator's models") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val query = StreamingAttribution.runToMemory(spark, source.toDS(),
      Seq("view", "click"), "purchase",
      lookbackSeconds = 1000L, halfLifeSeconds = 400L, sinkName = "att_sink")
    try {
      def rows() = spark.table("att_sink").as[Credit].collect().toSeq

      // touches buffer silently; nothing emits before a conversion
      source.addData(Event(1, 100, "view"), Event(1, 500, "click"))
      query.processAllAvailable()
      assert(rows().isEmpty)

      // conversion in a LATER batch credits the buffered touches; a
      // third touch lands in the same batch as the conversion (ts order
      // replay puts it before) — exactly the batch operator's window:
      // view@100 first, view@900 last, click middle
      source.addData(Event(1, 900, "view"), Event(1, 1000, "purchase"))
      query.processAllAvailable()
      val c1 = rows()
      assert(c1.length == 3, s"$c1")
      val byTs = c1.map(c => c.touchTs -> c).toMap
      assert(byTs(100).firstTouch == 1.0 && byTs(100).positionBased == 0.4)
      assert(byTs(500).linear == 1.0 / 3 && byTs(500).positionBased == 0.2)
      assert(byTs(900).lastTouch == 1.0 && byTs(900).positionBased == 0.4)
      assert(math.abs(c1.map(_.timeDecay).sum - 1.0) < 1e-9,
        "each conversion distributes exactly 1.0 decay credit")

      // no double counting: a second conversion credits only touches
      // AFTER the first; single touch earns 1.0 in every model
      source.addData(Event(1, 1500, "click"), Event(1, 2000, "purchase"))
      query.processAllAvailable()
      val c2 = rows().filter(_.convTs == 2000)
      assert(c2.length == 1 && c2.head.touchTs == 1500 &&
        c2.head.firstTouch == 1.0 && c2.head.lastTouch == 1.0 &&
        c2.head.linear == 1.0 && c2.head.positionBased == 1.0)

      // out-of-lookback touch never credits; conversion with no eligible
      // touches emits nothing
      source.addData(Event(2, 0, "view"), Event(2, 5000, "purchase"))
      query.processAllAvailable()
      assert(rows().count(_.user == 2) == 0)
    } finally query.stop()
  }

  test("touch buffer bound evicts oldest; ttl evicts idle users") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // maxTouches = 2: the oldest of three touches evicts; first-touch
    // credit moves to the oldest RETAINED touch
    val fn = StreamingAttribution.creditGroup(Set("view", "click"),
      "purchase", 1000L, 400L, maxTouches = 2) _
    val st = TestGroupState.create[StreamingAttribution.AttState](
      Optional.empty[StreamingAttribution.AttState],
      GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = false)
    val out = fn(1L, Iterator(
      Event(1, 10, "view"), Event(1, 20, "click"), Event(1, 30, "view"),
      Event(1, 100, "purchase")), st).toSeq
    assert(out.map(_.touchTs).sorted == Seq(20L, 30L), s"$out")
    assert(out.find(_.touchTs == 20).get.firstTouch == 1.0)

    val timedOut = TestGroupState.create[StreamingAttribution.AttState](
      Optional.of(StreamingAttribution.AttState(List((5L, "view")), 0L)),
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long],
      hasTimedOut = true)
    val ttlFn = StreamingAttribution.creditGroupTtl(Set("view"), "purchase",
      1000L, 400L, 16, 200L) _
    assert(ttlFn(1L, Iterator.empty, timedOut).isEmpty)
    assert(timedOut.isRemoved, "timed-out user's buffer must be evicted")
  }
}
