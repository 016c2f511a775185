package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the day-partitioned archive — the Spark
  * analog of the reference's archiving merge, which folds each batch's
  * patch files back into one sorted archive batch per day
  * (/root/reference/memstore/archiving.go:59-141: archiving merges the
  * live-store batches into the existing sorted batch;
  * backfill_manager.go re-merges patches). In this engine every
  * incremental drain/backfill APPENDS files to a day partition, so a
  * long-lived table accumulates small files — the classic 100 TB lake
  * pathology: file-listing cost grows, scans lose run length, parquet
  * row-group stats (the zone-map skip layer, Tables.EventsSortCols)
  * fragment.
  *
  * `compact` rewrites only the day partitions that exceed `maxFiles`,
  * re-sorting rows by `sortCols` inside the single rewritten file set so
  * the zone-map clustering the Archiver established is RESTORED, not
  * just preserved. Each day rewrites to a temporary sibling then swaps
  * by rename — a crash mid-compaction leaves either the old complete
  * partition or the new complete partition, never a mix (the temp dir
  * is re-deleted on the next run). Days within budget are untouched, so
  * the job's cost is proportional to the fragmented tail (typically the
  * recent backfill days), not the table.
  */
object Compactor {

  final case class DayReport(day: String, filesBefore: Int, filesAfter: Int)

  /** Compact every `<partitionPrefix>…` partition of `dir` holding more
    * than `maxFiles` parquet files down to `targetFiles` sorted files.
    * Returns a report per REWRITTEN partition (untouched ones absent).
    * The default prefix targets the archive's `day=` partitions; the
    * persisted index families reuse the same machinery over their
    * `bucket=` / `cell=` partitions ([[graft.operators.TextIndex.compact]],
    * [[graft.operators.IvfIndex.compact]]) — appends grow file counts
    * without bound there too, and the swap discipline is identical.
    */
  def compact(spark: SparkSession, dir: String, sortCols: Seq[String],
      maxFiles: Int = 8, targetFiles: Int = 1,
      zorderCols: Seq[String] = Nil,
      partitionPrefix: String = s"${Archiver.DayCol}="): Seq[DayReport] = {
    require(maxFiles >= 1, s"maxFiles $maxFiles must be >= 1")
    require(targetFiles >= 1, s"targetFiles $targetFiles must be >= 1")
    require(zorderCols.isEmpty || sortCols.isEmpty,
      "pass either sortCols (linear clustering) or zorderCols (multi-column), not both")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"archive $dir does not exist")
    // same cross-process archive write lock as Backfill: a compaction
    // rewriting a day that a concurrent drain is backfilling would race
    // the read-rewrite-swap — if the compacted (pre-delta) version wins,
    // the drain's rows are gone AFTER its journal truncated. A fresh
    // holder raises Busy; the scheduler's per-job catch turns that into
    // a skipped tick (fragmentation waits; rows never race)
    graft.exec.GenerationLock.withLock(
      graft.exec.GenerationLock.hadoop(root,
        spark.sparkContext.hadoopConfiguration),
      ".graft-archive.lock", staleMs = 120000L, role = "compaction",
      noun = "archive write lock", heartbeatMs = 15000L) { _ =>
      compactLocked(spark, root, fs, sortCols, maxFiles, targetFiles,
        zorderCols, partitionPrefix)
    }
  }

  private def compactLocked(spark: SparkSession, root: Path,
      fs: org.apache.hadoop.fs.FileSystem, sortCols: Seq[String],
      maxFiles: Int, targetFiles: Int, zorderCols: Seq[String],
      partitionPrefix: String): Seq[DayReport] = {
    val prefix = partitionPrefix
    val reports = Seq.newBuilder[DayReport]
    // day-partition compactions of a (possibly shared) archive announce
    // their swap windows through the drain marker, exactly like Backfill:
    // the two-rename swap makes a day transiently invisible to a
    // concurrent lister, and a scatter wave straddling it must retry
    // rather than merge a mid-swap listing. Index-partition compactions
    // (bucket=/cell=) are member-local artifacts with no cross-member
    // readers — no marker there. Begun lazily so a no-op pass bumps
    // nothing.
    val markerEligible = prefix == s"${Archiver.DayCol}="
    var rewriteAnnounced = false
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith(prefix))
      .sortBy(_.getName)
      .foreach { part =>
        val dataFiles = fs.listStatus(part)
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        if (dataFiles.length > maxFiles) {
          if (markerEligible && !rewriteAnnounced) {
            DrainMarker.beginRewrite(root.toString,
              spark.sparkContext.hadoopConfiguration)
            rewriteAnnounced = true
          }
          val day = part.getName.stripPrefix(prefix)
          val tmp = new Path(root, s".compact-tmp-${part.getName}")
          if (fs.exists(tmp)) fs.delete(tmp, true)
          // read THIS day's files directly (no partition-column recovery
          // needed — the day value is re-encoded in the directory name on
          // swap), restore the sort clustering, write the target file set
          val dayDf = spark.read.parquet(part.toString)
          val rewritten =
            if (zorderCols.nonEmpty)
              // z-curve clustering: per-file min/max stats bound EVERY
              // zorder column (ranges computed per day — zone maps are
              // per-file, so day-local normalization is exactly right)
              ZOrder.clusterToFiles(dayDf, zorderCols, targetFiles)
            else {
              val rep = dayDf.repartition(targetFiles)
              if (sortCols.nonEmpty)
                rep.sortWithinPartitions(sortCols.map(col): _*)
              else rep
            }
          rewritten.write.mode("overwrite").parquet(tmp.toString)
          // swap: old → trash, tmp → live, trash deleted. A crash between
          // the two renames loses no data (trash still holds the old
          // partition and the tmp dir holds the new one — the next run
          // deletes the stale tmp and the operator restores from trash);
          // a crash after the swap leaves only cleanup.
          val trash = new Path(root, s".compact-old-${part.getName}")
          if (fs.exists(trash)) fs.delete(trash, true)
          require(fs.rename(part, trash), s"compact: rename $part -> $trash failed")
          require(fs.rename(tmp, part), s"compact: rename $tmp -> $part failed")
          fs.delete(trash, true)
          val after = fs.listStatus(part)
            .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
          reports += DayReport(day, dataFiles.length, after)
        }
      }
    // commit announcement: clears the inflight flag. Compaction preserves
    // rows, so no days are flagged stale (members' local caches still
    // hold the same ROWS; SliceSync re-copies on its own file-set
    // staleness check) — the bump exists only to close the epoch window.
    if (rewriteAnnounced)
      DrainMarker.bump(root.toString, spark.sparkContext.hadoopConfiguration, Nil)
    reports.result()
  }
}
