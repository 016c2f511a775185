package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingDecaySpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(rows: (String, Long)*) =
    rows.toDF("key", "sec")
      .select(col("key"), timestamp_seconds(col("sec")).as("ts"))

  test("streamed decayed mass equals the one-shot batch aggregate") {
    val store = Files.createTempDirectory("sdec").toString
    val s = new StreamingDecay(store, "key", "ts", halfLifeSec = 100.0)
    s.update(batchDf(("a", 0L), ("a", 50L), ("b", 100L)), 0L)
    s.update(batchDf(("a", 150L), ("c", 200L)), 1L)
    s.update(batchDf(("b", 300L)), 2L)
    val got = s.current(spark).get
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // one-shot form at the same as-of (300 = the stream's max second)
    val want = graft.operators.Sessions.decayedCount(
        batchDf(("a", 0L), ("a", 50L), ("b", 100L), ("a", 150L),
          ("c", 200L), ("b", 300L)),
        "ts", Seq("key"), asOfEpoch = 300L, halfLifeSec = 100.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet == want.keySet, s"$got vs $want")
    got.foreach { case (k, (mass, n)) =>
      assert(n == want(k)._2, s"count diverged for $k: $got vs $want")
      // rebase multiplies exponentials where the batch form exponentiates
      // once — equal up to float residue, not bit-exact
      assert(math.abs(mass - want(k)._1) < 1e-9,
        s"mass diverged for $k: $got vs $want")
    }
  }

  test("late batch rebases itself; state as-of never goes backwards") {
    val store = Files.createTempDirectory("sdlate").toString
    val s = new StreamingDecay(store, "key", "ts", halfLifeSec = 100.0)
    s.update(batchDf(("a", 1000L)), 0L)
    s.update(batchDf(("b", 500L)), 1L) // entirely late batch
    val got = s.current(spark).get.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(3))).toMap
    assert(got("a")._2 == 1000L && got("b")._2 == 1000L,
      s"as-of must stay at the max seen: $got")
    assert(math.abs(got("a")._1 - 1.0) < 1e-12, s"$got")
    // b's event is 500s (= 5 half-lives) before the state as-of
    assert(math.abs(got("b")._1 - math.pow(2.0, -5.0)) < 1e-12, s"$got")
  }

  test("replaying a batch does not double-count") {
    val store = Files.createTempDirectory("sdrp").toString
    val s = new StreamingDecay(store, "key", "ts", halfLifeSec = 100.0)
    s.update(batchDf(("a", 0L)), 0L)
    s.update(batchDf(("a", 100L)), 1L)
    val before = s.current(spark).get.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    s.update(batchDf(("a", 100L)), 1L) // exactly-once replay
    val after = s.current(spark).get.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(before == after, s"replay changed the state: $before vs $after")
  }

  test("minMass bounds the state: idle keys decay out") {
    val store = Files.createTempDirectory("sdttl").toString
    val s = new StreamingDecay(store, "key", "ts", halfLifeSec = 100.0,
      minMass = 0.1)
    s.update(batchDf(("idle", 0L)), 0L)
    // 10 half-lives later: idle's mass 2^-10 ≈ 0.001 < 0.1 → dropped
    s.update(batchDf(("hot", 1000L)), 1L)
    val keys = s.current(spark).get.collect().map(_.getString(0)).toSet
    assert(keys == Set("hot"), s"idle key must decay out of state: $keys")
  }

  test("empty batches carry state forward and stay replay-aligned") {
    val store = Files.createTempDirectory("sdempty").toString
    val s = new StreamingDecay(store, "key", "ts", halfLifeSec = 100.0)
    s.update(batchDf(), 0L) // empty first batch, no prior state
    assert(s.current(spark).get.isEmpty)
    s.update(batchDf(("a", 100L)), 1L)
    s.update(batchDf(), 2L) // empty mid-stream batch
    val got = s.current(spark).get.collect()
    assert(got.length == 1 && got.head.getString(0) == "a")
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-12)
  }
}
