package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training data: concatenate all documents in a
  * deterministic global order and cut the token stream into fixed-budget
  * training sequences (the GPT-style concat-and-chunk pack). Each document
  * is assigned its absolute token offset and the range of sequence ids it
  * lands in; a document whose tokens straddle a cut boundary spans
  * `first_seq .. last_seq`.
  *
  * Scale design (100 TB): the global exclusive prefix sum over token
  * counts runs as the classic two-phase scan — range-partition by the id
  * column, per-partition local sums, a driver-side prefix over ONE LONG
  * PER PARTITION (thousands of longs, not rows), then a map-side pass
  * adds each partition's base offset. No global sort on a single node, no
  * windows over an unpartitioned frame (a naive
  * `sum().over(Window.orderBy(id))` collapses to one task at scale).
  */
object Packing {

  /** Per-document pack offsets: (idCol, n_tokens, start_tok, first_seq,
    * last_seq) with sequences of `budget` tokens cut from the
    * concatenation of all documents ordered by `idCol`. Documents with
    * zero tokens get first_seq = last_seq = the sequence their offset
    * falls in.
    */
  def packOffsets(df: DataFrame, idCol: String, nTokCol: String,
      budget: Int, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(idCol).cast("long").as("__id"), col(nTokCol).cast("long").as("__n"))
      .repartitionByRange(parts, col("__id"))
      .sortWithinPartitions("__id")
    // phase 1: one local token sum per partition (tiny driver collect —
    // O(#partitions) longs, independent of row count)
    val partSums = sorted.queryExecution.toRdd
      .mapPartitionsWithIndex { (idx, iter) =>
        var s = 0L
        while (iter.hasNext) s += iter.next().getLong(1)
        Iterator((idx, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val bases = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val basesB = spark.sparkContext.broadcast(bases)
    // phase 2: local running sum + the partition's base offset
    val rows = sorted.queryExecution.toRdd.mapPartitionsWithIndex { (idx, iter) =>
      var acc = basesB.value(idx)
      iter.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val start = acc
        acc += n
        val lastTok = if (n > 0) start + n - 1 else start
        Row(id, n, start, start / budget, lastTok / budget)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("start_tok", LongType, nullable = false),
      StructField("first_seq", LongType, nullable = false),
      StructField("last_seq", LongType, nullable = false))))
  }
}
