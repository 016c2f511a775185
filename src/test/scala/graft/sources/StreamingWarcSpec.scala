package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

/** Continuous crawl ingestion: files dropped into a landing directory
  * mid-stream each flow through the curation loop exactly once, across
  * a restart included — the discovery checkpoint assigns each member to
  * one micro-batch, and the per-batch store/shard writes are idempotent.
  */
class StreamingWarcSpec extends SparkSpec {

  private def record(id: String, uri: String, payload: String): Array[Byte] = {
    val body = payload.getBytes(UTF_8)
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= "WARC-Type: conversion\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$id>\r\n"
    h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2024-03-01T12:00:00Z\r\n"
    h ++= "Content-Type: text/plain\r\n"
    h ++= s"Content-Length: ${body.length}\r\n"
    h ++= "\r\n"
    val out = new ByteArrayOutputStream()
    out.write(h.toString.getBytes(UTF_8))
    out.write(body)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** CC-style member: one gzip member per record, concatenated. Written
    * via temp+rename so the discovery source never lists a half file.
    */
  private def drop(dir: String, name: String, recs: Seq[Array[Byte]]): Unit = {
    val tmp = new java.io.File(dir, s".$name.tmp")
    val out = new FileOutputStream(tmp)
    recs.foreach { r =>
      val buf = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(buf)
      g.write(r); g.close()
      out.write(buf.toByteArray)
    }
    out.close()
    assert(tmp.renameTo(new java.io.File(dir, name)))
  }

  test("landing-directory members curate exactly once across a restart") {
    val landing = java.nio.file.Files.createTempDirectory("warc_landing").toString
    val store = java.nio.file.Files.createTempDirectory("warc_store").toString + "/store"
    val shards = java.nio.file.Files.createTempDirectory("warc_shards").toString + "/shards"
    val ckpt = java.nio.file.Files.createTempDirectory("warc_ckpt").toString

    val textA = "the first crawled page has plenty of words to pass the floor"
    val textB = "another page with enough words to clear the quality floor too"
    val textC = "a third page arriving later also has enough words to keep"

    // member 1: one keeper, one duplicate of it, one too-short doc
    drop(landing, "m1.warc.gz", Seq(
      record("a-1", "https://x.test/a", textA),
      record("a-dup", "https://y.test/a-copy", textA),
      record("short-1", "https://x.test/s", "too short")))

    def mkQuery() = StreamingWarc.curateSink(spark, landing, store, shards,
        vocabSize = 1 << 12, minWords = 5)
      .option("checkpointLocation", ckpt).start()

    val q1 = mkQuery()
    q1.processAllAvailable()

    def shardSeqs(): Long = graft.streaming.StreamingShards.read(spark, shards).count()
    def storeKeys(): Long = spark.read.parquet(store).count()
    assert(shardSeqs() == 1, "member 1: exactly the one keeper exports")
    assert(storeKeys() == 1)

    // member 2 arrives MID-STREAM: a new keeper + a re-crawl of textA
    // (cross-batch store dup — must not export again)
    drop(landing, "m2.warc.gz", Seq(
      record("b-1", "https://x.test/b", textB),
      record("a-recrawl", "https://z.test/a-again", textA)))
    q1.processAllAvailable()
    assert(shardSeqs() == 2, "member 2: only the new page exports")
    assert(storeKeys() == 2)
    q1.stop()

    // restart on the same checkpoint: members 1/2 must NOT reprocess;
    // a member dropped while DOWN is picked up exactly once
    drop(landing, "m3.warc.gz", Seq(
      record("c-1", "https://x.test/c", textC),
      record("b-recrawl", "https://x.test/b2", textB)))
    val q2 = mkQuery()
    q2.processAllAvailable()
    q2.stop()

    assert(shardSeqs() == 3,
      "across the restart every keeper exported exactly once")
    assert(storeKeys() == 3)
    assert(spark.read.parquet(store).select("key").distinct().count() == 3,
      "no content key stored twice")
  }
}
