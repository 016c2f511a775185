package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import StreamingUpsert.Record

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("keyed state converges to the latest row per PK across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Record]
    val query = StreamingUpsert.runToMemory(spark, source.toDS(), "upsert_sink")
    try {
      source.addData(Record(1, 1, 10.0), Record(2, 1, 20.0), Record(1, 2, 11.0))
      query.processAllAvailable()
      // in-batch: key 1 seq 2 wins immediately
      val afterFirst = spark.table("upsert_sink")
        .groupBy("key").agg(max_by(struct($"seq", $"payload"), $"seq").as("s"))
        .select($"key", $"s.payload").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(afterFirst == Map(1L -> 11.0, 2L -> 20.0))

      // cross-batch: later seq overwrites, stale seq is ignored
      source.addData(Record(2, 5, 25.0), Record(1, 0, 999.0), Record(3, 1, 30.0))
      query.processAllAvailable()
      val afterSecond = spark.table("upsert_sink")
        .groupBy("key").agg(max_by(struct($"seq", $"payload"), $"seq").as("s"))
        .select($"key", $"s.payload").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(afterSecond == Map(1L -> 11.0, 2L -> 25.0, 3L -> 30.0))

      // the stale update for key 1 must not have been emitted at all
      val emittedForKey1 = spark.table("upsert_sink")
        .where($"key" === 1).collect().map(_.getDouble(2)).toSet
      assert(!emittedForKey1.contains(999.0), "stale record leaked downstream")
    } finally query.stop()
  }
}
