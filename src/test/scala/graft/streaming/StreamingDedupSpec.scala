package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import StreamingDedup.{Decision, Doc}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(source: MemoryStream[Doc], sink: String) =
    StreamingDedup.dedup(source.toDS()).writeStream
      .format("memory").queryName(sink).outputMode(OutputMode.Update())
      .start()

  test("first arrival of a content key passes, repeats drop across batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val query = run(source, "dedup_sink")
    try {
      // in-batch duplicate: smallest docId wins deterministically
      source.addData(Doc(2, "kA", "a2"), Doc(1, "kA", "a1"), Doc(3, "kB", "b"))
      query.processAllAvailable()
      val first = spark.table("dedup_sink").as[Decision].collect()
      assert(first.filter(_.kept).map(_.docId).toSet == Set(1L, 3L))
      assert(first.filter(!_.kept).map(_.docId).toSet == Set(2L))

      // cross-batch duplicate of kA and kB; fresh key kC passes
      source.addData(Doc(4, "kA", "a4"), Doc(5, "kB", "b5"), Doc(6, "kC", "c"))
      query.processAllAvailable()
      val all = spark.table("dedup_sink").as[Decision].collect()
      assert(all.filter(_.kept).map(_.docId).toSet == Set(1L, 3L, 6L))
      assert(all.filter(!_.kept).map(_.docId).toSet == Set(2L, 4L, 5L))
    } finally query.stop()
  }

  test("restart from checkpoint keeps the seen-set: no duplicate readmitted") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_dedup_ckpt")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString

    def writeBatch(name: String, rows: Seq[String]): Unit = {
      val tmp = root.resolve(name + ".tmp")
      Files.writeString(tmp, rows.mkString("\n"))
      Files.move(tmp, srcDir.resolve(name)) // atomic appearance
    }

    def startQuery() = {
      val docs = spark.readStream
        .schema("docId LONG, contentKey STRING, payload STRING")
        .json(srcDir.toString).as[Doc]
      StreamingDedup.dedup(docs).writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Decision], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .start()
    }

    writeBatch("b1.json", Seq(
      """{"docId": 1, "contentKey": "kA", "payload": "a"}""",
      """{"docId": 2, "contentKey": "kB", "payload": "b"}"""))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // restart against the same checkpoint: kA must still be marked seen
    writeBatch("b2.json", Seq(
      """{"docId": 3, "contentKey": "kA", "payload": "dup"}""",
      """{"docId": 4, "contentKey": "kC", "payload": "new"}"""))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val byId = spark.read.parquet(outDir).as[Decision].collect()
      .map(d => d.docId -> d.kept).toMap
    assert(byId == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true),
      s"state lost across restart: $byId")
  }
}
