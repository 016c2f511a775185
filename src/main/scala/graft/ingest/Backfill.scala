package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Backfill: merging late / out-of-order fact records into an existing
  * day-partitioned archive, rewriting ONLY the affected day partitions
  * (/root/reference/memstore/backfill.go:30-108: late records older than
  * the archiving cutoff buffer up and merge asynchronously into their
  * archive batches; each affected batch is patched in place).
  *
  * Scale shape: the late batch is tiny relative to the archive. The job
  * computes the distinct affected days from the batch (one small
  * aggregation), reads only those partitions, applies PK-overwrite upsert
  * per day, and overwrites just those partition directories — a 100 TB
  * archive with one late day touches 1/retention of the data.
  */
object Backfill {

  /** Merge `late` (same schema as the archive rows, TimestampType
    * `timeCol`) into the day-partitioned archive at `dir`. Late rows win
    * over archived rows with the same PK (they are the corrections).
    * Returns the affected day partition values.
    */
  def apply(spark: SparkSession, dir: String, late: DataFrame, timeCol: String,
      pk: Seq[String], sortCols: Seq[String]): Seq[String] = {
    val withDay = late.withColumn(Archiver.DayCol,
      date_format(col(timeCol), "yyyy-MM-dd"))
    val days = withDay.select(Archiver.DayCol).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    if (days.isEmpty) return Nil

    days.foreach { day =>
      val partPath = s"$dir/${Archiver.DayCol}=$day"
      val lateDay = withDay.where(col(Archiver.DayCol) === day).drop(Archiver.DayCol)
      val existing: Option[DataFrame] =
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(partPath)))
          Some(spark.read.parquet(partPath))
        else None

      val merged = existing match {
        case Some(ex) =>
          // late rows overwrite PK matches (seq: archived = 0, late = 1)
          Upsert(ex,
            lateDay.withColumn("__seq", lit(1L)), pk, "__seq")
        case None => lateDay
      }
      // write-then-swap into the partition directory; sorted like the
      // archiver so prefilter-equivalent row-group stats stay intact
      val tmp = s"$dir/.backfill_tmp_$day"
      merged.repartition(1)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(tmp)
      val target = java.nio.file.Paths.get(partPath)
      deleteRecursively(target)
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), target)
    }
    days
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(p)) return
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(java.nio.file.Files.delete(_))
    finally walk.close()
  }
}

/** Dimension-table snapshot: periodic full overwrite persistence of a
  * small dimension table (/root/reference/memstore/snapshot.go:25-87 —
  * dimension tables snapshot wholesale rather than archive by day).
  */
object Snapshot {

  def write(dim: DataFrame, dir: String): Unit =
    dim.coalesce(1).write.mode("overwrite").parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
