package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert with primary-key overwrite semantics, mirroring the
  * reference's ingestion path (/root/reference/memstore/ingestion.go:172+):
  * a PK hit overwrites the stored row, a miss appends; within one upsert
  * batch, the LATER record wins (the reference applies records in batch
  * order over the cuckoo index, cuckoo_index.go:195).
  *
  * "Later" is made explicit via `seqCol` (arrival sequence / offset): batch
  * order is not a well-defined concept for a distributed DataFrame, so the
  * caller supplies the ordering the reference gets implicitly. Kafka
  * offsets or redo-log sequence numbers are the natural source.
  *
  * Scale shape: one shuffle of the batch by PK (window dedup), one
  * PK-keyed left-anti join against the existing table. At 100 TB the
  * existing side stays day-partitioned parquet and the anti-join touches
  * only the partitions the batch's PKs can live in (fact PKs embed event
  * time in the reference's archive layout); AQE handles batch-side skew.
  */
object Upsert {

  /** Latest row per PK within the batch (higher `seqCol` wins; ties break
    * toward the higher value deterministically via a total order on seq).
    */
  def dedupBatch(batch: DataFrame, pk: Seq[String], seqCol: String): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(col(seqCol).desc)
    batch.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply one upsert batch to the existing table: batch rows overwrite
    * PK-matching existing rows, the rest of the existing table passes
    * through unchanged. Output columns = existing's columns.
    */
  def apply(existing: DataFrame, batch: DataFrame, pk: Seq[String],
      seqCol: String): DataFrame = {
    val latest = dedupBatch(batch, pk, seqCol)
    val incoming = latest.select(existing.columns.map(col): _*)
    existing.join(latest.select(pk.map(col): _*), pk, "left_anti")
      .unionByName(incoming)
  }
}
