package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed fact-table layout: pre-shuffle a table ONCE at write time so
  * every later equi-join or aggregation on the bucket key runs
  * shuffle-free — the standard Spark answer to "this join repeats every
  * query at 100 TB" (two tables bucketed the same way co-locate matching
  * keys in matching files; the planner drops both Exchanges and, with
  * sorted buckets, both Sorts).
  *
  * The reference pins a related layout at ingest: facts are
  * partition-sorted on the primary key inside each archive batch
  * (/root/reference/memstore/archiving.go:71-117) so merges and scans hit
  * presorted runs. Bucketing is the multi-node generalization: the sort
  * key co-locates ACROSS files, not just within one.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def write(df: DataFrame, keyCol: String, numBuckets: Int,
      table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count:
    * the plan this produces must contain no shuffle on either side (the
    * spec asserts it).
    */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
      keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCol)
}
