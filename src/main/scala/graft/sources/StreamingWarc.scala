package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming WARC ingestion over a crawl LANDING DIRECTORY — the
  * continuous half of [[WarcSource]]: a crawler keeps dropping
  * `.warc.gz` members into a directory, and every member flows through
  * the curation loop exactly once, across restarts included.
  *
  * Design: Spark's `binaryFile` streaming source does the file
  * DISCOVERY — its checkpoint log is precisely the exactly-once
  * "which members has this pipeline consumed" ledger (each file is
  * assigned to exactly one micro-batch, replayed with the same batch id
  * after a crash) — but it must not do the READING: a loaded `content`
  * column materializes a whole ~1 GB archive member per row. So the
  * stream selects only discovery metadata (`path`/`length` — the
  * source prunes unread columns, so member bytes never load), and each
  * micro-batch hands its file list to the batch parser
  * [[WarcSource.readWarc]], which streams records off the files with
  * one task per member and bounded memory.
  *
  * The sink half is [[graft.streaming.StreamingCurate.processBatch]]:
  * its per-batch `batch=<id>` store/shard writes are idempotent
  * overwrites, so a replayed batch (same files, same id — the
  * discovery log guarantees both) converges instead of double-writing.
  */
object StreamingWarc {

  /** File-discovery stream: one row per newly arrived WARC member,
    * columns `path`/`length`/`modificationTime` — never the content.
    * `maxFilesPerTrigger` bounds a micro-batch to a digestible number
    * of ~1 GB members (backpressure for a bursty crawler).
    */
  def fileStream(spark: SparkSession, landingDir: String,
      globFilter: String = "*.warc*",
      maxFilesPerTrigger: Int = 16): DataFrame = {
    // the binaryFile source's fixed schema, stated explicitly (streaming
    // file sources refuse to infer); `content` is declared but pruned by
    // the select — member bytes never load
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(schema)
      .option("pathGlobFilter", globFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir)
      .select("path", "length", "modificationTime")
  }

  /** One micro-batch: parse exactly the batch's files through the batch
    * reader and project the `documents` shape. The collect is O(files
    * per trigger) driver-side path strings — never data.
    */
  def batchDocuments(spark: SparkSession, files: DataFrame,
      maxRecordBytes: Long = 1L << 30,
      extractHtml: Boolean = false): Option[DataFrame] = {
    val paths = files.select("path").collect().map(_.getString(0))
    if (paths.isEmpty) None
    else Some(WarcSource.warcToDocuments(
      WarcSource.readWarc(spark, paths.mkString(","), maxRecordBytes),
      extractHtml))
  }

  /** The full continuous loop: landing directory → WARC parse → curation
    * (cross-batch dedup + quality floor) → training shards. Set
    * `checkpointLocation` on the returned writer and start it; every
    * member is curated exactly once across restarts.
    */
  def curateSink(spark: SparkSession, landingDir: String, storeDir: String,
      shardDir: String, vocabSize: Int = 1 << 16, shardsPerBatch: Int = 0,
      minWords: Int = 5, maxFilesPerTrigger: Int = 16,
      maxRecordBytes: Long = 1L << 30,
      extractHtml: Boolean = false): DataStreamWriter[Row] =
    fileStream(spark, landingDir, maxFilesPerTrigger = maxFilesPerTrigger)
      .writeStream.foreachBatch { (files: DataFrame, batchId: Long) =>
        batchDocuments(spark, files, maxRecordBytes, extractHtml).foreach { docs =>
          val decisions = graft.streaming.StreamingCurate.processBatch(
            docs, batchId, "doc_id", "text", storeDir, shardDir,
            vocabSize, shardsPerBatch, minWords)
          val counts = decisions.groupBy("reason").count().collect()
            .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
          System.err.println(s"[StreamingWarc] batch=$batchId $counts")
        }
      }
}
