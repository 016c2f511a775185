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
}
