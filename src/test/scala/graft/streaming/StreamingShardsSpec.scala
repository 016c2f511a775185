package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming token-shard sink: per-batch directories complete-or-absent,
  * replay idempotence (byte-identical rewrite), torn batches invisible
  * to the reader, and the real writeStream wiring end to end.
  */
class StreamingShardsSpec extends SparkSpec {
  import spark.implicits._

  private def seqs(rows: (Long, Seq[Int])*): DataFrame =
    rows.toSeq.toDF("id", "tokens")

  private def readBack(dir: String): Map[(Long, String, Long), Seq[Int]] =
    StreamingShards.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("shard"),
        r.getAs[Long]("seq_idx")) -> r.getSeq[Int](r.fieldIndex("tokens")))
      .toMap

  test("batches land as complete shard dirs; empty batches write nothing") {
    val dir = java.nio.file.Files.createTempDirectory("sshards").toString
    StreamingShards.writeBatch(seqs(1L -> Seq(1, 2, 3), 2L -> Seq(4, 5)),
      0L, "id", "tokens", dir, vocabSize = 100, shardsPerBatch = 2)
    StreamingShards.writeBatch(seqs(3L -> Seq(7)),
      1L, "id", "tokens", dir, 100, 2)
    StreamingShards.writeBatch(seqs().limit(0), 2L, "id", "tokens", dir, 100, 2)
    val all = readBack(dir)
    assert(all.values.toSet == Set(Seq(1, 2, 3), Seq(4, 5), Seq(7)))
    assert(all.keys.map(_._1).toSet == Set(0L, 1L))
    assert(!new java.io.File(dir, "batch=2").exists())
  }

  test("replayed batch rewrites its directory byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("sshards-replay").toString
    val b = seqs(1L -> Seq(9, 8), 2L -> Seq(7, 6, 5))
    StreamingShards.writeBatch(b, 5L, "id", "tokens", dir, 100, 2)
    def bytes(): Map[String, Seq[Byte]] = {
      val d = new java.io.File(dir, "batch=5")
      d.listFiles().filter(f => f.getName.endsWith(".bin") || f.getName.endsWith(".idx"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    }
    val first = bytes()
    StreamingShards.writeBatch(b, 5L, "id", "tokens", dir, 100, 2)
    assert(bytes() == first, "replay must rewrite the same bytes")
    assert(readBack(dir).size == 2)
  }

  test("a torn batch (no manifest) is invisible until replayed whole") {
    val dir = java.nio.file.Files.createTempDirectory("sshards-torn").toString
    StreamingShards.writeBatch(seqs(1L -> Seq(1)), 0L, "id", "tokens", dir, 100, 1)
    // simulate a crash between shard writes and the manifest
    val torn = new java.io.File(dir, "batch=1")
    torn.mkdirs()
    java.nio.file.Files.write(new java.io.File(torn, "part-00000.bin").toPath,
      Array[Byte](1, 2, 3))
    assert(readBack(dir).keys.map(_._1).toSet == Set(0L))
    // the replay overwrites it whole and it becomes visible
    StreamingShards.writeBatch(seqs(2L -> Seq(2, 3)), 1L, "id", "tokens", dir, 100, 1)
    assert(readBack(dir).keys.map(_._1).toSet == Set(0L, 1L))
  }

  test("writeStream wiring: a MemoryStream feeds shards through the sink") {
    val dir = java.nio.file.Files.createTempDirectory("sshards-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sshards-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Int])]
    val q = StreamingShards.sink(
        in.toDF().toDF("id", "tokens"),
        "id", "tokens", dir, vocabSize = 50, shardsPerBatch = 1)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData((1L, Seq(1, 2)), (2L, Seq(3)))
      q.processAllAvailable()
      in.addData((3L, Seq(4, 5, 6)))
      q.processAllAvailable()
    } finally q.stop()
    val all = StreamingShards.read(spark, dir)
    assert(all.agg(sum(size(col("tokens")))).head().getLong(0) == 6L)
    assert(all.select("batch_id").distinct().count() == 2L)
  }
}
