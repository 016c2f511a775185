package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof attaches the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 205L, "t2"), (1L, 300L, "t3"),
      (2L, 150L, "t4")).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, 90L, 1L, 9.0), (1L, 200L, 2L, 10.0), (1L, 205L, 3L, 10.5),
      (2L, 400L, 4L, 20.0)).toDF("key", "ts", "seq", "px")
    val out = TemporalJoin.asof(trades, quotes, "key", "ts",
        Seq("px"), "seq").collect()
      .map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out("t1") == Some(9.0))   // 90 <= 100
    assert(out("t2") == Some(10.5))  // same-instant quote matches
    assert(out("t3") == Some(10.5))
    assert(out("t4") == None)        // no quote before 150 for key 2
  }

  test("asof right ties at one ts resolve to the highest seq") {
    val l = Seq((1L, 10L, "x")).toDF("key", "ts", "tag")
    val r = Seq((1L, 5L, 1L, 1.0), (1L, 5L, 2L, 2.0), (1L, 5L, 3L, 3.0))
      .toDF("key", "ts", "seq", "v")
    val out = TemporalJoin.asof(l, r, "key", "ts", Seq("v"), "seq").collect()
    assert(out.head.getDouble(3) == 3.0)
  }

  test("asof matches DuckDB ASOF-join semantics on the events table") {
    // events vs themselves shifted: each event as-of-joins the latest
    // strictly-earlier-or-equal event of the same user from a 'purchase'
    // reference stream
    val ev = graft.Tables.events(spark, sfDir).limit(5000)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts"),
        col("event_id"), col("value"))
    val ref = ev.where(col("event_id") % 3 === 0)
      .select(col("user_id"), col("ts"), col("event_id").as("seq"),
        col("value").as("ref_value"))
    val out = TemporalJoin.asof(ev, ref, "user_id", "ts",
      Seq("ref_value"), "seq")
    // every matched ref_value must come from a row at ts <= left ts —
    // verify via the naive (exploding) formulation on this bounded input
    val naive = ev.as("l").join(ref.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.event_id").as("event_id"))
      .agg(max_by(struct(col("r.ts"), col("r.seq"), col("r.ref_value")),
        struct(col("r.ts"), col("r.seq"))).getField("ref_value").as("ref_value"))
    val mismatches = out.select(col("event_id"), col("ref_value").as("a"))
      .join(naive.select(col("event_id"), col("ref_value").as("b")),
        Seq("event_id"), "full")
      .where(not(col("a") <=> col("b")))
      .count()
    assert(mismatches == 0)
  }

  test("rangeJoinPointInInterval equals the naive theta join") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 95L), (4L, 250L))
      .toDF("pid", "x")
    val intervals = Seq((10L, 0L, 10L), (20L, 8L, 100L), (30L, 240L, 260L))
      .toDF("iid", "s", "e")
    val out = TemporalJoin.rangeJoinPointInInterval(points, "x",
        intervals, "s", "e", bucketWidth = 16)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("x") >= col("s") && col("x") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == naive)
    assert(out == Set((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L)))
  }

  test("range join dedups nothing and misses nothing across bucket borders") {
    val points = (0L until 200L).map(x => (x, x)).toDF("pid", "x")
    val intervals = Seq((1L, 15L, 17L), (2L, 0L, 200L), (3L, 63L, 65L))
      .toDF("iid", "s", "e")
    val out = TemporalJoin.rangeJoinPointInInterval(points, "x",
        intervals, "s", "e", bucketWidth = 16)
      .groupBy("iid").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 200L, 3L -> 2L))
  }

  test("intervalOverlapJoin: exact half-open overlap, one row per pair " +
      "even across many shared buckets") {
    // left 1 spans [0,100) — 13 buckets at width 8; right 10 spans
    // [40,120) — they share buckets 5..12 and must still pair ONCE.
    // Touching endpoints ([0,10) vs [10,20)) do NOT overlap; empty
    // interval (20,20) matches nothing.
    val left = Seq((1L, 0L, 100L), (2L, 0L, 10L), (3L, 20L, 20L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 40L, 120L), (20L, 10L, 20L), (30L, 5L, 6L))
      .toDF("rid", "rs", "re")
    val got = TemporalJoin.intervalOverlapJoin(left, "ls", "le",
        right, "rs", "re", bucketWidth = 8L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val naive = left.crossJoin(right)
      .where(col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted, s"$got vs naive $naive")
    assert(got.size == got.distinct.size, s"multi-bucket pair duplicated: $got")
    assert(got.toSet == Set((1L, 10L), (1L, 20L), (1L, 30L), (2L, 30L)),
      got.toString)
  }

  test("intervalOverlapJoin: an interval past maxBucketsPerRow errors by " +
      "name instead of silently dropping matches") {
    // left 1 spans [0, 640) = 80 buckets at width 8, cap 16 — its partner
    // right 10 at [600, 610) lives past the clamp the old code applied
    val left = Seq((1L, 0L, 640L), (2L, 0L, 10L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 600L, 610L)).toDF("rid", "rs", "re")
    val ex = intercept[Exception] {
      TemporalJoin.intervalOverlapJoin(left, "ls", "le", right, "rs", "re",
        bucketWidth = 8L, maxBucketsPerRow = 16).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(ex).contains("maxBucketsPerRow"), messages(ex))
  }

  test("intervalOverlapJoin oversized=broadcast still finds every partner, " +
      "once, for intervals past the bucket cap") {
    // big left [0,640), big right [100,900): big×big, big×normal and
    // normal×normal pairs must all appear exactly once
    val left = Seq((1L, 0L, 640L), (2L, 0L, 10L), (3L, 605L, 615L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 600L, 610L), (20L, 100L, 900L), (30L, 5L, 6L))
      .toDF("rid", "rs", "re")
    val got = TemporalJoin.intervalOverlapJoin(left, "ls", "le",
        right, "rs", "re", bucketWidth = 8L, maxBucketsPerRow = 16,
        oversized = "broadcast")
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val naive = left.crossJoin(right)
      .where(col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted, s"$got vs naive $naive")
    assert(got.size == got.distinct.size, s"pair duplicated: $got")
  }

  test("rangeJoinPointInInterval: oversize interval errors by default, " +
      "matches fully under oversized=broadcast") {
    val points = Seq((1L, 5L), (2L, 500L)).toDF("pid", "x")
    val intervals = Seq((10L, 0L, 640L), (20L, 490L, 510L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      TemporalJoin.rangeJoinPointInInterval(points, "x", intervals, "s", "e",
        bucketWidth = 8L, maxBucketsPerRow = 16).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(ex).contains("maxBucketsPerRow"), messages(ex))
    val got = TemporalJoin.rangeJoinPointInInterval(points, "x",
        intervals, "s", "e", bucketWidth = 8L, maxBucketsPerRow = 16,
        oversized = "broadcast")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L)), got.toString)
  }
}
