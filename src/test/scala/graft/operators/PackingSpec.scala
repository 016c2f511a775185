package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("pack offsets are the exclusive prefix sum in id order") {
    import spark.implicits._
    val df = Seq((1L, 5), (2L, 3), (3L, 0), (4L, 10), (5L, 2))
      .toDF("id", "n")
    val rows = Packing.packOffsets(df, "id", "n", budget = 8)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, 5L, 0L, 0L, 0L),   // tokens 0-4 → seq 0
      (2L, 3L, 5L, 0L, 0L),   // tokens 5-7 → seq 0
      (3L, 0L, 8L, 1L, 1L),   // empty doc sits at offset 8 → seq 1
      (4L, 10L, 8L, 1L, 2L),  // tokens 8-17 → spans seqs 1..2
      (5L, 2L, 18L, 2L, 2L)))
  }

  test("offsets are partition-count invariant (two-phase scan correctness)") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, (i % 7).toInt)).toDF("id", "n")
    def run(parts: Int) =
      Packing.packOffsets(df.repartition(13), "id", "n", budget = 16, numPartitions = parts)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val one = run(1)
    assert(run(4) == one && run(32) == one,
      "global prefix sum must not depend on the partitioning")
    // spot-check the closed form: sum of (i % 7) for i < k
    val expectedStart = (1L until 500L).map(_ % 7).sum
    assert(one(499) == (500L, expectedStart))
  }

  test("no-split packing matches a sequential next-fit simulation") {
    import spark.implicits._
    val budget = 16
    val nShards = 4
    val df = (1L to 300L).map(i => (i, (i % 23).toInt)).toDF("id", "n")
    val got = Packing.packBinsNoSplit(df.repartition(7), "id", "n", budget, nShards)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    // driver-side simulation over the same shard function + id order
    def shard(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % nShards).toInt
    }
    val state = scala.collection.mutable.Map[Int, (Long, Long)]()
    val want = (1L to 300L).map { id =>
      val n = (id % 23).toInt
      val s = shard(id)
      val (bin, fill) = state.get(s) match {
        case None => (0L, n.toLong)
        case Some((b, f)) if f + n <= budget => (b, f + n)
        case Some((b, _)) => (b + 1, n.toLong)
      }
      state(s) = (bin, fill)
      (id, s, bin, n.toLong)
    }
    assert(got.toSeq == want)
    // no bin over budget unless it holds a single oversized doc
    got.groupBy(r => (r._2, r._3)).foreach { case (_, docs) =>
      val total = docs.map(_._4).sum
      assert(total <= budget || docs.length == 1,
        s"overfull bin with ${docs.length} docs, $total tokens")
    }
  }

  test("no-split packing oversized docs get a bin alone") {
    import spark.implicits._
    val df = Seq((1L, 50), (2L, 3), (3L, 4)).toDF("id", "n")
    // single shard so the order is 1,2,3
    val rows = Packing.packBinsNoSplit(df, "id", "n", budget = 8, nShards = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("packingEfficiency: hand-computed sweep, exact ceil-div counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // lengths 10, 25, 7, 0: T = 42
    val df = Seq(10L, 25L, 7L, 0L).toDF("n")
    val got = Packing.packingEfficiency(df, col("n"), Seq(8, 16))
      .orderBy("seq_len")
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    // L=8:  packed = ceil(42/8) = 6; padded = 2+4+1+0 = 7; waste = (56-42)/56
    // L=16: packed = ceil(42/16) = 3; padded = 1+2+1+0 = 4; waste = (64-42)/64
    assert(got == Seq(
      (8, 4L, 42L, 6L, 7L, 0.25),
      (16, 4L, 42L, 3L, 4L, 0.3438)), got.toString)
  }
}
