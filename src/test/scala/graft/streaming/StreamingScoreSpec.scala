package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingScoreSpec extends SparkSpec {
  import spark.implicits._

  test("streamed scores equal the batch scoreWith under a trained model") {
    implicit val sqlCtx = spark.sqlContext
    // train a tiny separable model in batch, then score a STREAM with it
    val good = (1L to 8L).map(i => (i, "excellent prose reads wonderfully", 1))
    val bad = (11L to 18L).map(i => (i, "spam junk noise garbage filler", 0))
    val train = (good ++ bad).toDF("id", "text", "y")
    val w = graft.operators.Classifier.trainLogistic(train, "id", "text",
      col("y") === 1, bucketBits = 12, epochs = 3, lr = 20.0)

    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val source = MemoryStream[(Long, String)]
    val query = StreamingScore.run(source.toDF().toDF("id", "text"),
      "id", "text", w, bucketBits = 12, threshold = 0.5,
      sink = (scoredBatch, _) => collected.synchronized {
        collected ++= scoredBatch.select("id", "quality", "keep").collect()
      })
    try {
      val incoming = Seq(
        (100L, "excellent wonderfully prose"), // good vocabulary -> keep
        (101L, "junk garbage spam"),           // bad vocabulary -> drop
        (102L, "prose junk"))                  // mixed
      source.addData(incoming.take(2): _*)
      query.processAllAvailable()
      source.addData(incoming.drop(2): _*) // second micro-batch
      query.processAllAvailable()

      val streamed = collected.synchronized {
        collected.map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      }
      val batch = graft.operators.Classifier.scoreWith(
          incoming.toDF("id", "text"), "id", "text", w, bucketBits = 12)
        .select("id", "quality", "keep")
        .as[(Long, Double, Boolean)].collect().toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      val keep = streamed.map(r => r._1 -> r._3).toMap
      assert(keep(100L) && !keep(101L), streamed.toString)
    } finally query.stop()
  }
}
