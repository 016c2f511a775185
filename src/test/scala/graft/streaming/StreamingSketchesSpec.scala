package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.functions.Sketches

class StreamingSketchesSpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(lo: Int, hi: Int) =
    (lo until hi).map(i => s"tok_${i % 97}_${i % 7}").toDF("item")

  test("streamed state equals the one-shot aggregate, array-for-array") {
    val store = Files.createTempDirectory("sksk").toString
    val s = new StreamingSketches(store, "item")
    s.update(batchDf(0, 400), 0L)
    s.update(batchDf(400, 900), 1L)
    s.update(batchDf(900, 1200), 2L)
    val got = s.current(spark).get
    val oneShot = batchDf(0, 1200).agg(
      Sketches.kmv(col("item"), 128),
      Sketches.bloom(col("item"), 8192, 3),
      Sketches.cms(col("item"), 1024, 4)).head()
    assert(got.getSeq[Long](0) == oneShot.getSeq[Long](0), "kmv diverged")
    assert(got.getSeq[Int](1) == oneShot.getSeq[Int](1), "bloom diverged")
    assert(got.getSeq[Long](2) == oneShot.getSeq[Long](2), "cms diverged")
  }

  test("replaying a batch does not double-count") {
    val store = Files.createTempDirectory("skrp").toString
    val s = new StreamingSketches(store, "item")
    s.update(batchDf(0, 300), 0L)
    s.update(batchDf(300, 600), 1L)
    val before = s.current(spark).get
    s.update(batchDf(300, 600), 1L) // exactly-once replay
    val after = s.current(spark).get
    assert(before.getSeq[Long](2) == after.getSeq[Long](2),
      "replay inflated the CMS counters")
    assert(before.getSeq[Long](0) == after.getSeq[Long](0))
  }

  test("prune keeps the newest states only") {
    val store = Files.createTempDirectory("skpr").toString
    val s = new StreamingSketches(store, "item")
    (0 until 5).foreach(b => s.update(batchDf(b * 100, b * 100 + 100), b.toLong))
    s.prune(spark, keep = 2)
    val dirs = new java.io.File(store).listFiles().map(_.getName)
      .filter(_.startsWith("state=")).sorted
    assert(dirs.toSeq == Seq("state=3", "state=4"), dirs.mkString(", "))
    // current still answers from the surviving newest state
    assert(s.current(spark).isDefined)
  }
}
