package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Exactly-once ingestion recovery: the Spark-native equivalent of the
  * reference's redo log + offset checkpoint replay
  * (/root/reference/redolog/file_redolog_manager.go;
  * memstore/recovery.go): a replayable file source + checkpointed
  * offsets + transactional file sink. Stopping and restarting the query
  * against the same checkpoint must neither lose nor duplicate records.
  */
class RecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("key", LongType),
    StructField("seq", LongType),
    StructField("payload", DoubleType)))

  test("checkpointed restart reprocesses nothing and loses nothing") {
    val root = Files.createTempDirectory("graft_recovery")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString

    def writeBatch(name: String, rows: Seq[String]): Unit = {
      val tmp = root.resolve(name + ".tmp")
      Files.writeString(tmp, rows.mkString("\n"))
      Files.move(tmp, srcDir.resolve(name)) // atomic appearance
    }

    def startQuery() = spark.readStream
      .schema(schema).json(srcDir.toString)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    writeBatch("b1.json", Seq(
      """{"key": 1, "seq": 1, "payload": 10.0}""",
      """{"key": 2, "seq": 1, "payload": 20.0}"""))
    writeBatch("b2.json", Seq(
      """{"key": 3, "seq": 1, "payload": 30.0}"""))

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    writeBatch("b3.json", Seq(
      """{"key": 1, "seq": 2, "payload": 11.0}""",
      """{"key": 4, "seq": 1, "payload": 40.0}"""))

    // restart against the same checkpoint: b1/b2 must not re-emit
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == 5, "each ingested record exactly once")
    assert(out.select("key", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }
}
