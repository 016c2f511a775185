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
    // InternalRow getters read SQL NULL as 0 silently — a null id or token
    // count would corrupt offsets instead of failing, so both passes guard.
    val partSums = sorted.queryExecution.toRdd
      .mapPartitionsWithIndex { (idx, iter) =>
        var s = 0L
        while (iter.hasNext) {
          val r = iter.next()
          if (r.isNullAt(0) || r.isNullAt(1))
            throw new IllegalArgumentException(
              "packOffsets: null id or token count (clean the corpus first)")
          s += r.getLong(1)
        }
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
        // phase 2 re-executes the scan (nothing is persisted), so it needs
        // its own null guard — a source that turned null between passes
        // would otherwise read as 0 and corrupt every later offset
        if (r.isNullAt(0) || r.isNullAt(1))
          throw new IllegalArgumentException(
            "packOffsets: null id or token count (clean the corpus first)")
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

  /** No-split sequence packing: documents never straddle a sequence
    * boundary (the padded-pack form — the complement of [[packOffsets]]'s
    * concat-and-chunk). Bin packing is inherently sequential, so the
    * scalable shape is per-shard packing: each document hash-shards by
    * content-independent id hash (md5 prefix, the [[Sampling]]
    * reproducibility contract — DuckDB computes the identical shard), and
    * within a shard documents pack next-fit in id order: stay in the
    * current bin while the fill fits `budget`, else open a new bin. A
    * document larger than `budget` occupies a bin alone (oversized — never
    * split). Waste is bounded by one partial bin per shard; global bin ids
    * are (shard, bin).
    *
    * Determinism: shard is a pure function of the id and the per-shard
    * scan order is total (id), so the output is independent of cluster
    * size and input partitioning — unlike range-sampled partitioning,
    * which would move shard boundaries between runs. Each shard's
    * sequential scan parallelizes across shards (`nShards` ≫ executors at
    * scale).
    *
    * Output: (idCol, shard, bin, n_tokens).
    */
  def packBinsNoSplit(df: DataFrame, idCol: String, nTokCol: String,
      budget: Int, nShards: Int): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(nShards > 0, s"nShards $nShards must be positive")
    val spark = df.sparkSession
    val sharded = df
      .select(col(idCol).cast("long").as("__id"), col(nTokCol).cast("long").as("__n"))
      .withColumn("__shard",
        (conv(substring(md5(col("__id").cast("string")), 1, 8), 16, 10)
          .cast("long") % nShards).cast("int"))
      .repartition(col("__shard"))
      .sortWithinPartitions("__shard", "__id")
    val rows = sharded.queryExecution.toRdd.mapPartitions { iter =>
      var shard = -1
      var bin = 0L
      var fill = 0L
      iter.map { r =>
        // InternalRow getters read SQL NULL as 0 silently — fail instead
        if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))
          throw new IllegalArgumentException(
            "packBinsNoSplit: null id or token count (clean the corpus first)")
        val id = r.getLong(0)
        val n = r.getLong(1)
        val s = r.getInt(2)
        if (s != shard) { shard = s; bin = 0L; fill = n }
        else if (fill + n <= budget) fill += n
        else { bin += 1; fill = n }
        Row(id, s, bin, n)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("shard", IntegerType, nullable = false),
      StructField("bin", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false))))
  }

  /** Sequence-length sweep: for each candidate training sequence length,
    * how many sequences concat-and-chunk packing produces versus naive
    * one-doc-per-sequence padding, and the fraction of padded slots
    * wasted — the report that picks the sequence length (and justifies
    * packing) before a training run.
    *
    *   packed_seqs = ⌈T / L⌉         (T = total corpus tokens)
    *   padded_seqs = Σ_docs ⌈n / L⌉  (docs longer than L wrap)
    *   pad_waste   = (padded_seqs·L − T) / (padded_seqs·L)
    *
    * All integer arithmetic until the one output ratio. One corpus pass:
    * every per-L padded count folds as a conditional sum inside a single
    * aggregate, then the 1-row result explodes into |seqLens| rows —
    * map-side everything, one scalar shuffle.
    */
  def packingEfficiency(df: DataFrame, nTok: org.apache.spark.sql.Column,
      seqLens: Seq[Int], roundTo: Int = 4): DataFrame = {
    require(seqLens.nonEmpty && seqLens.forall(_ > 0),
      s"sequence lengths must be positive, got ${seqLens.mkString(",")}")
    require(seqLens.distinct.size == seqLens.size,
      s"sequence lengths must be distinct, got ${seqLens.mkString(",")}")
    val lens = df.select(nTok.cast("long").as("__n"))
    val perL = seqLens.map(l =>
      sum(expr(s"(__n + ${l - 1}) div $l")).as(s"__p$l"))
    val aggCols = Seq(sum(col("__n")).as("total_tokens")) ++ perL
    val one = lens.agg(count(lit(1)).as("n_docs"), aggCols: _*)
    one.select(col("n_docs"), col("total_tokens"),
        explode(array(seqLens.map(l =>
          struct(lit(l.toLong).as("seq_len"), col(s"__p$l").as("padded_seqs"))): _*))
          .as("__s"))
      .select(col("__s.seq_len").cast("int").as("seq_len"), col("n_docs"),
        col("total_tokens"), col("__s.padded_seqs").as("padded_seqs"))
      // integer ceil-div (not a double round-trip — T can exceed 2^53)
      .withColumn("packed_seqs",
        expr("(total_tokens + seq_len - 1) div seq_len"))
      .withColumn("pad_waste",
        round((col("padded_seqs") * col("seq_len") - col("total_tokens"))
          .cast("double") / (col("padded_seqs") * col("seq_len")), roundTo))
      .select("seq_len", "n_docs", "total_tokens", "packed_seqs",
        "padded_seqs", "pad_waste")
  }
}
