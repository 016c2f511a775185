package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sinks.TrainingShards

/** Streaming token-shard sink — the continuous face of
  * [[graft.sinks.TrainingShards]]: a `foreachBatch` body that lands each
  * micro-batch of packed token sequences as a complete shard-pair
  * directory `batch=<id>/`, so a crawl→curate→tokenize→pack stream feeds
  * a training loader directly, with no terminal batch job.
  *
  * Exactly-once argument (the [[BucketStore]] discipline, applied to a
  * sink with its OWN manifest protocol): Structured Streaming replays a
  * failed micro-batch under the SAME batch id, and
  * `TrainingShards.write` into `batch=<id>/` is idempotent — every shard
  * pair is rewritten via temp+rename and the per-batch `_manifest.json`
  * is written LAST. A batch directory without a manifest is a torn write
  * by definition and [[read]] skips it; the replay then overwrites it
  * whole. Readers therefore see each batch's data exactly once,
  * regardless of crash timing.
  *
  * Scale shape: shards are written map-side by the batch's own executors
  * (one pair per range partition; the driver collects only O(#shards)
  * manifest rows per trigger). Shard COUNT is per batch — size
  * `shardsPerBatch` to the trigger volume, not the corpus: a day-long
  * stream at 1k batches × 8 shards is 8k mmap-able files, the same
  * inventory a batch export of the same corpus would produce.
  */
object StreamingShards {

  /** The `foreachBatch` body. Empty micro-batches write nothing (no
    * empty directories — Spark triggers with no data are routine).
    */
  def writeBatch(batch: DataFrame, batchId: Long, idCol: String,
      tokensCol: String, outDir: String, vocabSize: Int,
      shardsPerBatch: Int = 0): Unit =
    if (!batch.isEmpty) {
      val dst = new Path(outDir, s"batch=$batchId")
      // a REPLAY rewrites the directory whole: drop any previous (possibly
      // torn) attempt first — Hadoop rename refuses to overwrite shards in
      // place. The delete de-certifies the batch (its manifest goes with
      // it), so a crash anywhere in the rewrite leaves a manifest-less
      // directory that [[read]] skips and the next replay overwrites.
      val fs = dst.getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(dst)) fs.delete(dst, true)
      TrainingShards.write(batch, idCol, tokensCol, dst.toString, vocabSize,
        shardsPerBatch)
      ()
    }

  /** Attach the sink to a streaming frame:
    * `sink(stream, ...).start()` — callers pick trigger/checkpoint on the
    * returned writer (checkpointLocation is REQUIRED for the replay
    * contract to mean anything across restarts).
    */
  def sink(stream: DataFrame, idCol: String, tokensCol: String,
      outDir: String, vocabSize: Int,
      shardsPerBatch: Int = 0): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, idCol, tokensCol, outDir, vocabSize,
          shardsPerBatch)
    }

  /** Every COMPLETE batch's sequences — (batch_id, shard, seq_idx,
    * tokens); a `batch=` directory without its manifest (torn write) is
    * skipped, matching what a replay will overwrite. Listed through the
    * path's own Hadoop filesystem (s3a/hdfs-ready), like [[BucketStore]].
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches =
      if (!fs.exists(root)) Array.empty[(Long, String)]
      else fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        .filter(st => fs.exists(new Path(st.getPath, "_manifest.json")))
        .map(st => (st.getPath.getName.stripPrefix("batch=").toLong,
          st.getPath.toString))
        .sortBy(_._1)
    batches.map { case (id, p) =>
      TrainingShards.read(spark, p).withColumn("batch_id", lit(id))
    }.reduceOption(_.unionByName(_)).getOrElse {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("shard", StringType, nullable = false),
          StructField("seq_idx", LongType, nullable = false),
          StructField("tokens", ArrayType(IntegerType, containsNull = false),
            nullable = false),
          StructField("batch_id", LongType, nullable = false))))
    }
  }
}
