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
    *
    * ONE distributed job over all affected days: the affected partitions
    * are read with partition pruning, merged with the late batch via a
    * (day, pk)-keyed dedup (late wins), range-partitioned over
    * (day, sortCols) into `numFiles` shuffle partitions (default: the
    * session's shuffle parallelism, floored at one per day) and written
    * sorted — so a TB-scale day rewrites as N parallel sorted files, not
    * one single-task file, while untouched partitions stay byte-stable.
    * The reference shards exactly this merge across workers
    * (memstore/backfill.go:436+).
    */
  def apply(spark: SparkSession, dir: String, late: DataFrame, timeCol: String,
      pk: Seq[String], sortCols: Seq[String], numFiles: Int = 0): Seq[String] =
    // the read-merge-swap below is a lost-update hazard under concurrent
    // writers (two merges each missing the other's delta, last rename
    // winning — and a shared .backfill_tmp), so the WHOLE job holds a
    // cross-process generation-ladder lock on the archive dir. Locking
    // here, at the single mutation site, protects every caller — member
    // drains, operator backfill jobs, anything else that patches days.
    // A FRESH contending holder raises [[graft.exec.GenerationLock.Busy]]
    // (callers with retry loops, like the drain tick, catch it and skip);
    // the heartbeat keeps a multi-minute rewrite from being reclaimed as
    // stale, so only a CRASHED writer's lock is ever taken over.
    graft.exec.GenerationLock.withLock(
      graft.exec.GenerationLock.hadoop(
        new org.apache.hadoop.fs.Path(dir),
        spark.sparkContext.hadoopConfiguration),
      ".graft-archive.lock", staleMs = 120000L, role = "backfill",
      noun = "archive write lock", heartbeatMs = 15000L) { _ =>
      locked(spark, dir, late, timeCol, pk, sortCols, numFiles)
    }

  private def locked(spark: SparkSession, dir: String, late: DataFrame,
      timeCol: String, pk: Seq[String], sortCols: Seq[String],
      numFiles: Int): Seq[String] = {
    val day = Archiver.DayCol
    // TimestampType or integral epoch-seconds time column, like Archiver
    val ts =
      if (late.schema(timeCol).dataType == org.apache.spark.sql.types.TimestampType)
        col(timeCol)
      else timestamp_seconds(col(timeCol))
    val withDay = late.withColumn(day, date_format(ts, "yyyy-MM-dd"))
    val days = withDay.select(day).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    if (days.isEmpty) return Nil

    // the archive may live on any Hadoop filesystem (hdfs/s3a) — probe
    // and swap through the path's own FS, never java.nio (which silently
    // reports every remote path as absent, turning the merge into a
    // late-rows-only rewrite)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def child(p: String) = new org.apache.hadoop.fs.Path(dir, p)
    val existingDays = days.filter(d => fs.exists(child(s"$day=$d")))

    // archived rows of the affected days only (one partition-pruned read);
    // seq 0 loses to the late batch's seq 1 on a PK hit within the day.
    val archivedOpt = existingDays match {
      case Nil => None
      case ds => Some(spark.read.option("mergeSchema", "true").parquet(dir)
        .where(col(day).isin(ds: _*))
        .withColumn(day, col(day).cast("string")))
    }
    // Schema may have evolved since the days were archived, in EITHER
    // direction: columns the late batch carries but the archive lacks
    // null-fill on the archive side; columns the archive carries but the
    // late batch no longer emits null-fill on the LATE side — a producer
    // that stopped emitting a column must not erase it from every
    // rewritten day. The output schema is the union.
    // (A late batch that already carries a day column gets it recomputed.)
    val archiveOnly = archivedOpt.toSeq.flatMap(a =>
      a.columns.toSeq.filterNot(c => late.columns.contains(c) || c == day)
        .map(c => c -> a.schema(c).dataType))
    val outCols = (late.columns.toSeq.filterNot(_ == day) ++
      archiveOnly.map(_._1) :+ day).map(col)
    val lateFull = archiveOnly.foldLeft(withDay) { case (acc, (c, t)) =>
      acc.withColumn(c, lit(null).cast(t))
    }
    val lateSeq = lateFull.select(outCols: _*).withColumn("__seq", lit(1L))
    val union = archivedOpt match {
      case None => lateSeq
      case Some(archived0) =>
        val present = archived0.columns.toSet
        val archived = late.columns.filterNot(present.contains)
          .foldLeft(archived0) { (acc, c) =>
            acc.withColumn(c, lit(null).cast(late.schema(c).dataType))
          }
        lateSeq.unionByName(archived.select(outCols: _*).withColumn("__seq", lit(0L)))
    }
    val merged = Upsert.dedupBatch(union, day +: pk, "__seq").drop("__seq")

    val parallelism = spark.sessionState.conf.numShufflePartitions
    val n = if (numFiles > 0) numFiles else math.max(days.size, parallelism)
    val rangeCols = (day +: sortCols).map(col)
    // range partitioning on (day, sortCols): partition boundaries respect
    // day order, each writer task emits per-day files whose rows are
    // sorted by the archive sort columns — row-group min/max stats stay as
    // tight as the original Archiver layout
    val tmp = s"$dir/.backfill_tmp"
    merged.repartitionByRange(n, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .write.partitionBy(day).mode("overwrite").parquet(tmp)

    // announce the swap BEFORE the first rename: between `target → trash`
    // and `src → target` a concurrent reader listing the archive sees the
    // day ABSENT, and around the commit instant two members of one
    // scatter wave can observe opposite sides of the rename (the old
    // owner's moved-day PK anti-join deferring to a copy the new owner's
    // listing predates — the ClusterProcessSpec grow-drill undercount).
    // The inflight marker makes any such read report a torn archive epoch
    // so the broker retries the wave; the post-swap bump below is the
    // commit announcement that clears it.
    DrainMarker.beginRewrite(dir, spark.sparkContext.hadoopConfiguration)
    // swap only the affected day directories — Compactor's trash
    // protocol, not delete-then-move: a crash between the two renames
    // loses no data (the trash dir still holds the old partition, the
    // tmp dir the new one; the next run clears the stale tmp and an
    // operator restores from trash), where a crash after a delete left
    // the day's archived rows existing NOWHERE and the replay rewrote
    // the day as late-rows-only
    days.foreach { d =>
      val src = child(s".backfill_tmp/$day=$d")
      if (fs.exists(src)) {
        val target = child(s"$day=$d")
        val trash = child(s".backfill-old-$d")
        if (fs.exists(trash)) fs.delete(trash, true)
        if (fs.exists(target))
          require(fs.rename(target, trash), s"backfill: rename $target -> $trash failed")
        require(fs.rename(src, target), s"backfill: rename $src -> $target failed")
        fs.delete(trash, true)
      }
    }
    fs.delete(child(".backfill_tmp"), true)
    // record the rewritten days in the drain marker (we hold the archive
    // lock): members serving these days from a local cache learn, with
    // one small read per query, that their copies are stale and serve
    // from the shared archive until their sync catches up
    DrainMarker.bump(dir, spark.sparkContext.hadoopConfiguration, days)
    days
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
