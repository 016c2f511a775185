package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed streaming curation loop: in-batch dedup, store hits
  * across batches, the quality floor, shard export totals, and replay
  * idempotence of both per-batch artifacts.
  */
class StreamingCurateSpec extends SparkSpec {
  import spark.implicits._

  private val Good1 = "alpha beta gamma delta epsilon zeta"
  private val Good2 = "one two three four five six seven"
  private val Good3 = "red green blue yellow purple orange"
  private val Short = "too short"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def run(store: String, shards: String, batchId: Long,
      rows: (Long, String)*): Map[Long, String] =
    StreamingCurate.processBatch(docs(rows: _*), batchId, "doc_id", "text",
        store, shards, vocabSize = 1 << 12, shardsPerBatch = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

  test("dedup, store hits, quality floor and shard export compose") {
    val store = java.nio.file.Files.createTempDirectory("scur-store").toString
    val shards = java.nio.file.Files.createTempDirectory("scur-shards").toString

    // batch 0: a keeper, its in-batch exact dup, a short doc
    val b0 = run(store, shards, 0L, 1L -> Good1, 2L -> Good1, 3L -> Short)
    assert(b0 == Map(1L -> "kept", 2L -> "exact_dup", 3L -> "quality"), b0.toString)

    // batch 1: re-crawl of batch-0's keeper -> store dup; re-crawl of the
    // short doc -> STILL quality (low-quality content never entered the
    // store); a fresh keeper
    val b1 = run(store, shards, 1L, 10L -> Good1, 11L -> Short, 12L -> Good2)
    assert(b1 == Map(10L -> "store_dup", 11L -> "quality", 12L -> "kept"),
      b1.toString)

    // shards carry exactly the two kept docs' token counts
    val out = StreamingShards.read(spark, shards)
    assert(out.count() == 2L)
    assert(out.agg(sum(size(col("tokens")))).head().getLong(0) ==
      (Good1.split(" ").length + Good2.split(" ").length).toLong)
    // hashed ids are within the declared vocab
    val maxId = out.select(max(array_max(col("tokens")))).head().getInt(0)
    assert(maxId < (1 << 12), s"id $maxId outside vocab")
  }

  test("a replayed batch rewrites its store and shard dirs idempotently") {
    val store = java.nio.file.Files.createTempDirectory("scur-replay-store").toString
    val shards = java.nio.file.Files.createTempDirectory("scur-replay-shards").toString
    run(store, shards, 0L, 1L -> Good1)
    // replay batch 1 twice with the same content: decisions identical,
    // store/shard artifacts unchanged, and the replay does NOT match its
    // own previous write (10 would otherwise become a store_dup of itself)
    val first = run(store, shards, 1L, 10L -> Good2, 11L -> Good1)
    val second = run(store, shards, 1L, 10L -> Good2, 11L -> Good1)
    assert(first == second, s"$first vs $second")
    assert(first == Map(10L -> "kept", 11L -> "store_dup"), first.toString)
    val out = StreamingShards.read(spark, shards)
    assert(out.where(col("batch_id") === 1L).count() == 1L)
    // batch 2 still sees batch 1's keeper through the store
    val b2 = run(store, shards, 2L, 20L -> Good2, 21L -> Good3)
    assert(b2 == Map(20L -> "store_dup", 21L -> "kept"), b2.toString)
  }

  test("writeStream wiring: the sink curates a MemoryStream end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = java.nio.file.Files.createTempDirectory("scur-sink-store").toString
    val shards = java.nio.file.Files.createTempDirectory("scur-sink-shards").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scur-sink-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingCurate.sink(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, shards, vocabSize = 1 << 12,
        shardsPerBatch = 1)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData((1L, Good1), (2L, Good1), (3L, Short))
      q.processAllAvailable()
      in.addData((10L, Good1), (11L, Good2))
      q.processAllAvailable()
    } finally q.stop()
    // only the two keepers reached the shards, across two batches
    val out = StreamingShards.read(spark, shards)
    assert(out.count() == 2L)
    assert(out.select("batch_id").distinct().count() == 2L)
  }

  test("raw crawl input: extractHtml feeds markup-variant dups into the loop") {
    val store = java.nio.file.Files.createTempDirectory("scur-html-store").toString
    val shards = java.nio.file.Files.createTempDirectory("scur-html-shards").toString
    // two DIFFERENTLY-MARKED-UP pages with the same visible text, plus a
    // short page: only after the html→text projection do the first two
    // become exact duplicates the loop can collapse
    def rec(id: String, uri: String, html: String) =
      ("response", id, uri, "2024-03-01T12:00:00Z", "text/html",
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val warcShaped = Seq(
      rec("r1", "https://a.com/1", s"<html><body><p>$Good1</p></body></html>"),
      rec("r2", "https://a.com/2", s"<div><b>$Good1</b><!-- tracked --></div>"),
      rec("r3", "https://a.com/3", s"<p>$Short</p>"))
      .toDF("record_type", "record_id", "target_uri", "warc_date",
        "content_type", "content")
    val docs = graft.sources.WarcSource.warcToDocuments(warcShaped,
      extractHtml = true)
    val decisions = StreamingCurate.processBatch(docs, 0L, "doc_id", "text",
        store, shards, vocabSize = 1 << 12, shardsPerBatch = 1)
      .collect().map(r => r.getString(2)).sorted.toSeq
    assert(decisions == Seq("exact_dup", "kept", "quality"), decisions.toString)
    // the keeper's shard carries the STRIPPED text's token count
    val out = StreamingShards.read(spark, shards)
    assert(out.count() == 1L)
    assert(out.agg(sum(size(col("tokens")))).head().getLong(0) ==
      Good1.split(" ").length.toLong)
  }

  test("store compaction folds batch dirs without changing decisions") {
    val store = java.nio.file.Files.createTempDirectory("scur-compact-store").toString
    val shards = java.nio.file.Files.createTempDirectory("scur-compact-shards").toString
    run(store, shards, 0L, 1L -> Good1)
    run(store, shards, 1L, 2L -> Good2)
    val folded = BucketStore.compact(spark, store, upToBatchId = 1L,
      dedupCols = Seq("key"))
    assert(folded == 2, s"folded $folded")
    val b2 = run(store, shards, 2L, 20L -> Good1, 21L -> Good2, 22L -> Good3)
    assert(b2 == Map(20L -> "store_dup", 21L -> "store_dup", 22L -> "kept"),
      b2.toString)
  }
}
