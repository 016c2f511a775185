package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka-shaped streaming ingestion: JSON payload decode + offset-ordered
  * upsert, mirroring the reference's Kafka subscriber
  * (/root/reference/subscriber/common/job/streaming_processor.go:48-71,
  * 323+: consume → decode JSON → upsert batch → datanode).
  *
  * The input DataFrame has the Kafka source wire schema — `key: binary`,
  * `value: binary`, `topic: string`, `partition: int`, `offset: long` —
  * which is exactly what `spark.readStream.format("kafka")` emits; in this
  * environment the kafka connector jar is absent, so specs drive the same
  * shape from a MemoryStream. Production wiring is one line:
  *
  * {{{
  * val raw = spark.readStream.format("kafka")
  *   .option("kafka.bootstrap.servers", brokers)
  *   .option("subscribe", topic).load()
  * KafkaShapedIngest.decode(raw, schema)   // -> typed rows + __seq
  * }}}
  *
  * Exactly-once: offsets checkpoint through Structured Streaming
  * (RecoverySpec); the per-record offset doubles as the upsert sequence,
  * making "later record wins" well-defined across retries.
  */
object KafkaShapedIngest {

  /** Decode the JSON `value` payload into typed columns per `schema`, with
    * `__seq` derived from the (partition, offset) pair — a total order per
    * partition, matching the reference's apply-in-consumption-order.
    * Malformed payloads yield null columns (from_json permissive mode) and
    * can be filtered or routed by the caller.
    *
    * `__seq` contract: `(partition << 42) + offset` orders records within
    * a partition exactly; comparing ACROSS partitions assumes a key's
    * records live in one partition (Kafka's own guarantee while the
    * partition count is stable — growing partitions migrates keys and
    * makes any offset-derived cross-partition order meaningless) and
    * offsets under 2^42 (~4.4e12 records/partition).
    */
  def decode(raw: DataFrame, schema: StructType): DataFrame = {
    val seq: Column = shiftleft(col("partition").cast("long"), 42) + col("offset")
    raw.select(
      from_json(col("value").cast("string"), schema).as("__row"),
      seq.as("__seq"))
      .select((schema.fieldNames.map(f => col(s"__row.$f")) :+ col("__seq")): _*)
  }

  /** Decode then fold into latest-row-per-PK state (Update mode).
    * Tombstones (null Kafka value) and malformed payloads decode to null
    * columns and are FILTERED here, not crashed on: Record's fields are
    * primitive, so an unfiltered null row would poison-pill the query —
    * fail the micro-batch, replay the same record on restart, fail again,
    * forever.
    */
  def upsertStream(raw: DataFrame, schema: StructType,
      keyField: String, payloadField: String = "payload")
      : org.apache.spark.sql.Dataset[StreamingUpsert.Record] = {
    import raw.sparkSession.implicits._
    val decoded = decode(raw, schema)
    StreamingUpsert.latestByKey(decoded.select(
        col(keyField).cast("long").as("key"),
        col("__seq").as("seq"),
        col(payloadField).cast("double").as("payload"))
      .where(col("key").isNotNull && col("seq").isNotNull &&
        col("payload").isNotNull)
      .as[StreamingUpsert.Record])
  }
}
