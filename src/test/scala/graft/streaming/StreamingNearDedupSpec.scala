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

  test("compaction folds old batch dirs; hits, replay and growth bound survive") {
    val dir = java.nio.file.Files.createTempDirectory("neardedup-compact").toString
    def dirs(): Set[String] = {
      val f = new java.io.File(dir)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName).toSet
    }
    // four batches, each storing one fresh doc
    StreamingNearDedup.processBatch(docs(1L -> base), "doc_id", "text", dir, 0L, 0.35)
    StreamingNearDedup.processBatch(
      docs(2L -> "totally different content about joins and exchanges in query plans today"),
      "doc_id", "text", dir, 1L, 0.35)
    StreamingNearDedup.processBatch(
      docs(3L -> "yet another unrelated body of text describing archives and snapshots"),
      "doc_id", "text", dir, 2L, 0.35)
    StreamingNearDedup.processBatch(
      docs(4L -> "fourth subject matter entirely about brokers and merged partial results"),
      "doc_id", "text", dir, 3L, 0.35)
    assert(dirs().count(_.startsWith("batch=")) == 4)

    // compact everything behind the replay horizon (last committed = 3)
    val folded = StreamingNearDedup.compactStore(spark, dir, upToBatchId = 2L)
    assert(folded == 3, s"folded $folded")
    assert(dirs() == Set("base=2", "batch=3"), dirs().toString)

    // cross-batch hit against a representative that now lives in the base
    val b4 = decisions(StreamingNearDedup.processBatch(
      docs(40L -> (base + " qq")), "doc_id", "text", dir, 4L, 0.35))
    assert(b4(40L) == ((false, Some(1L))), b4.toString)

    // replaying the post-horizon batch still overwrites, not duplicates
    StreamingNearDedup.processBatch(
      docs(4L -> "fourth subject matter entirely about brokers and merged partial results"),
      "doc_id", "text", dir, 3L, 0.35)
    val afterReplay = spark.read.parquet(s"$dir/batch=3").count()
    assert(afterReplay > 0)

    // a second compaction advances the horizon and stays bounded
    StreamingNearDedup.compactStore(spark, dir, upToBatchId = 4L)
    assert(dirs().count(d => d.startsWith("base=") || d.startsWith("batch=")) <= 2,
      dirs().toString)
    // and the folded store still answers: near-dup of doc 2 resolves to 2
    val b6 = decisions(StreamingNearDedup.processBatch(
      docs(60L -> "totally different content about joins and exchanges in query plans today ok"),
      "doc_id", "text", dir, 6L, 0.35))
    assert(b6(60L) == ((false, Some(2L))), b6.toString)
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
