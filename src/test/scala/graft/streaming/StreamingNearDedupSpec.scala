package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch near-dup semantics against the persistent bucket store:
  * in-batch resolution, store hits across batches, replay idempotence.
  */
class StreamingNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest before the sun finally sets"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def decisions(df: DataFrame): Map[Long, (Boolean, Option[Long])] =
    df.collect().map(r => r.getLong(0) ->
      (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  test("in-batch near-dups collapse; later batches dedup against the store") {
    val dir = java.nio.file.Files.createTempDirectory("neardedup").toString

    // batch 0: an original, its in-batch near-dup, and an unrelated doc
    val b0 = decisions(StreamingNearDedup.processBatch(
      docs(1L -> base, 2L -> (base + " zz"), 3L -> "completely different text about spark plans and shuffles here"),
      "doc_id", "text", dir, batchId = 0L, threshold = 0.35))
    assert(b0(1L) == ((true, None)))
    assert(b0(2L) == ((false, Some(1L))), b0.toString)
    assert(b0(3L) == ((true, None)))

    // batch 1: a near-dup of batch-0's keeper -> store hit; a fresh doc
    val b1 = decisions(StreamingNearDedup.processBatch(
      docs(10L -> (base + " yy"), 11L -> "another unrelated document mentioning bucketed layouts and windows at scale"),
      "doc_id", "text", dir, batchId = 1L, threshold = 0.35))
    assert(b1(10L) == ((false, Some(1L))), b1.toString)
    assert(b1(11L) == ((true, None)))

    // batch 2: near-dup of the DROPPED doc 10's content still traces to 1
    // (10 never entered the store); near-dup of 11 hits 11
    val b2 = decisions(StreamingNearDedup.processBatch(
      docs(20L -> (base + " yy ww"),
        21L -> "another unrelated document mentioning bucketed layouts and windows at scale too"),
      "doc_id", "text", dir, batchId = 2L, threshold = 0.35))
    assert(b2(20L) == ((false, Some(1L))), b2.toString)
    assert(b2(21L) == ((false, Some(11L))), b2.toString)
  }

  test("replaying a batch rewrites its store directory: no duplicate state") {
    val dir = java.nio.file.Files.createTempDirectory("neardedup-replay").toString
    val batch = docs(1L -> base, 2L -> "some completely other words that share nothing with the fox text at all")
    StreamingNearDedup.processBatch(batch, "doc_id", "text", dir, 0L, 0.35)
    val after1 = spark.read.parquet(s"$dir/batch=*").count()
    // exactly-once replay: same batch id overwrites, store size unchanged
    StreamingNearDedup.processBatch(batch, "doc_id", "text", dir, 0L, 0.35)
    val after2 = spark.read.parquet(s"$dir/batch=*").count()
    assert(after1 == after2, s"replay grew the store: $after1 -> $after2")
  }

  test("docs too short for a signature pass through kept") {
    val dir = java.nio.file.Files.createTempDirectory("neardedup-short").toString
    val d = decisions(StreamingNearDedup.processBatch(
      docs(1L -> "one two", 2L -> base), "doc_id", "text", dir, 0L, 0.35))
    assert(d(1L) == ((true, None)))
    assert(d(2L) == ((true, None)))
  }
}
