package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drives the Kafka wire shape (key/value binary, partition, offset) from
  * a MemoryStream through decode → keyed upsert.
  */
class KafkaShapedIngestSpec extends SparkSpec {
  import spark.implicits._

  // (key, value, topic, partition, offset) — the kafka source schema
  private type Wire = (Array[Byte], Array[Byte], String, Int, Long)

  private def rec(key: Long, payload: Double, partition: Int, offset: Long): Wire =
    (key.toString.getBytes,
      s"""{"id": $key, "payload": $payload}""".getBytes,
      "t", partition, offset)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", DoubleType)))

  test("JSON decode + offset-ordered upsert over the kafka wire schema") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Wire]
    val raw = source.toDF()
      .toDF("key", "value", "topic", "partition", "offset")

    val query = KafkaShapedIngest.upsertStream(raw, schema, "id")
      .writeStream.format("memory").queryName("kafka_sink")
      .outputMode("update").start()
    try {
      source.addData(
        rec(1, 10.0, 0, 100),
        rec(1, 11.0, 0, 101), // later offset wins
        rec(2, 20.0, 0, 102))
      query.processAllAvailable()
      source.addData(
        rec(2, 21.0, 0, 103),
        rec(3, 30.0, 1, 5)) // different partition
      query.processAllAvailable()

      val latest = spark.table("kafka_sink")
        .groupBy("key").agg(max_by(col("payload"), col("seq")).as("p"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(latest == Map(1L -> 11.0, 2L -> 21.0, 3L -> 30.0))
    } finally query.stop()
  }

  test("decode runs on the EXACT documented 7-column kafka source schema; wrong shapes fail fast") {
    import org.apache.spark.sql.Row
    // construct through sourceSchema itself so names, types, AND
    // nullability are the pinned contract, not toDF's inference
    val rows = java.util.Arrays.asList(
      Row("k".getBytes, """{"id": 5, "payload": 2.5}""".getBytes,
        "t", 1, 9L, new java.sql.Timestamp(1706572800000L), 0))
    val raw = spark.createDataFrame(rows, KafkaShapedIngest.sourceSchema)
    assert(raw.schema == KafkaShapedIngest.sourceSchema)
    val out = KafkaShapedIngest.decode(raw, schema).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 5L && out(0).getDouble(1) == 2.5)
    assert(out(0).getLong(2) == (1L << 42) + 9L, "__seq = (partition<<42)+offset")

    // a frame that is NOT the kafka shape fails at wiring time, not deep
    // inside a micro-batch: wrong type on a used column, or missing column
    val wrongType = raw.withColumn("offset", col("offset").cast("string"))
    assert(intercept[IllegalArgumentException] {
      KafkaShapedIngest.decode(wrongType, schema)
    }.getMessage.contains("offset"))
    assert(intercept[IllegalArgumentException] {
      KafkaShapedIngest.decode(raw.drop("value"), schema)
    }.getMessage.contains("value"))
  }

  test("malformed payloads decode to null columns, not failures") {
    val raw = Seq(
      ("k".getBytes, """{"id": 7, "payload": 1.5}""".getBytes, "t", 0, 1L),
      ("k".getBytes, """not json at all""".getBytes, "t", 0, 2L)
    ).toDF("key", "value", "topic", "partition", "offset")
    val decoded = KafkaShapedIngest.decode(raw, schema).collect()
    assert(decoded.length == 2)
    assert(decoded.count(_.isNullAt(0)) == 1)
  }

  test("tombstones and malformed payloads are filtered, never poison-pill the query") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Wire]
    val raw = source.toDF()
      .toDF("key", "value", "topic", "partition", "offset")
    val query = KafkaShapedIngest.upsertStream(raw, schema, "id")
      .writeStream.format("memory").queryName("kafka_poison_sink")
      .outputMode("update").start()
    try {
      source.addData(
        rec(1, 10.0, 0, 100),
        ("1".getBytes, null, "t", 0, 101L), // kafka tombstone: null value
        ("x".getBytes, "not json".getBytes, "t", 0, 102L), // malformed
        rec(2, 20.0, 0, 103))
      query.processAllAvailable() // would throw on an unfiltered null Record
      val latest = spark.table("kafka_poison_sink")
        .groupBy("key").agg(max_by(col("payload"), col("seq")).as("p"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(latest == Map(1L -> 10.0, 2L -> 20.0), latest.toString)
    } finally query.stop()
  }
}
