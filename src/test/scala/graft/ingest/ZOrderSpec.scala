package graft.ingest

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave bit layout: column 0 owns the higher lane") {
    // ranges [0, 65535] make scaling the identity
    val m = Array(0L, 0L); val x = Array(65535L, 65535L)
    assert(ZOrder.compute(Array(1L, 0L), m, x) == 2L)
    assert(ZOrder.compute(Array(0L, 1L), m, x) == 1L)
    assert(ZOrder.compute(Array(1L, 1L), m, x) == 3L)
    assert(ZOrder.compute(Array(2L, 0L), m, x) == 8L)
    assert(ZOrder.compute(Array(65535L, 0L), m, x) == 0xAAAAAAAAL)
    assert(ZOrder.compute(Array(0L, 65535L), m, x) == 0x55555555L)
  }

  test("scaling is exact integer arithmetic and range-guarded") {
    // v=50, range [0,100]: 50*65535/100 = 32767 (floor)
    val z = ZOrder.compute(Array(50L), Array(0L), Array(100L))
    assert(z == {
      var acc = 0L
      (0 until 16).foreach(i => acc |= ((32767L >> i) & 1) << i)
      acc
    })
    intercept[IllegalArgumentException] {
      ZOrder.compute(Array(0L), Array(0L), Array(1L << 47))
    }
  }

  test("column expression matches the reference compute") {
    val df = Seq((7L, 9000L), (123L, 456L)).toDF("a", "b")
    val got = df.select(ZOrder.zValue(Seq(col("a"), col("b")),
      Seq(0L, 0L), Seq(200L, 10000L))).as[Long].collect()
    val want = Seq(
      ZOrder.compute(Array(7L, 9000L), Array(0L, 0L), Array(200L, 10000L)),
      ZOrder.compute(Array(123L, 456L), Array(0L, 0L), Array(200L, 10000L)))
    assert(got.toSeq == want)
  }

  test("z-ordered files bound BOTH columns; a linear sort only the first") {
    // deterministic scatter over a 10000x10000 value square
    val rows = (0 until 20000).map { i =>
      ((i.toLong * 7919) % 10000, (i.toLong * 104729) % 10000)
    }
    val df = rows.toDF("x", "y")
    val dir = Files.createTempDirectory("zorder").toString
    val nFiles = 16

    ZOrder.clusterToFiles(df, Seq("x", "y"), nFiles)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")

    def spans(path: String, c: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
        .select(avg("span")).head().getDouble(0)
      perFile
    }
    // row multiset preserved
    val back = spark.read.parquet(s"$dir/z").as[(Long, Long)].collect().sorted
    assert(back.toSeq == rows.sorted, "z rewrite must not change the rows")

    val zx = spans(s"$dir/z", "x"); val zy = spans(s"$dir/z", "y")
    val lx = spans(s"$dir/linear", "x"); val ly = spans(s"$dir/linear", "y")
    // linear layout: x tightly bounded, y spans ~the whole domain
    assert(lx < 1500, s"linear x span $lx")
    assert(ly > 8000, s"linear y span $ly (should be unclustered)")
    // z layout: BOTH columns bounded well below the domain; y at least
    // 2x tighter than the linear layout's full-domain spread
    assert(zx < 6000 && zy < 6000, s"z spans x=$zx y=$zy")
    assert(zy * 2 < ly, s"z-order y span $zy not better than linear $ly")
  }

  test("compactor zorderCols restores two-column clustering on rewrite") {
    val dir = Files.createTempDirectory("zcompact").toString
    val day = "2024-01-05"
    // 12 fragment files of an interleaved (x, y) scatter
    val rows = (0 until 6000).map { i =>
      ((i.toLong * 7919) % 5000, (i.toLong * 104729) % 5000)
    }
    rows.grouped(500).zipWithIndex.foreach { case (chunk, _) =>
      chunk.toDF("x", "y").coalesce(1)
        .write.mode("append").parquet(s"$dir/${Archiver.DayCol}=$day")
    }
    val reports = Compactor.compact(spark, dir, sortCols = Nil,
      maxFiles = 4, targetFiles = 4, zorderCols = Seq("x", "y"))
    assert(reports.map(_.day) == Seq(day))
    assert(reports.head.filesAfter == 4)
    val back = spark.read.parquet(dir).select("x", "y")
      .as[(Long, Long)].collect().sorted
    assert(back.toSeq == rows.sorted, "compaction must preserve the multiset")
    Seq("x", "y").foreach { c =>
      val span = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("s"))
        .select(avg("s")).head().getDouble(0)
      assert(span < 4000, s"column $c span $span not clustered after z rewrite")
    }
  }
}
