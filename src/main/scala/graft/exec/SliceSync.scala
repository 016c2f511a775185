package graft.exec

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Pull-down half of the drain→serve loop in slice mode: after any
  * member drains fresh live rows into the SHARED archive, the day's
  * serving owner (by [[SliceRebalance.extendedOwner]] over the published
  * assignment) copies the new or rewritten day partitions into its own
  * local storage — so fresh data becomes queryable without a manual
  * bootstrap or rebalance. The reference closes the same loop by
  * ownership-routing ingestion so a datanode only ever ingests shards it
  * owns (/root/reference/subscriber/common/job/streaming_processor.go:48-71,
  * /root/reference/controller/handlers/assignment.go:57-165); here data
  * flows through the shared archive instead, and ownership is applied on
  * the way DOWN.
  *
  * Staleness detection is by file name + length: parquet part files
  * carry write-unique names, and a [[graft.ingest.Backfill]] rewrite of
  * a day replaces its files wholesale — so "local file set == shared
  * file set" is exactly "local copy is current". Each sync run lists
  * the shared day set once and the files of owned days only; at 100 TB
  * that is O(days) metadata RPCs per tick, no data read unless a day
  * actually changed.
  */
object SliceSync {

  /** Copy every shared-archive day this slice serves (extended
    * ownership; all days when no assignment is published) whose local
    * copy is missing or stale. Returns the days refreshed. Crash-safe:
    * fresh bytes land under a temp name and swap in via rename, so a
    * killed sync re-runs to completion; the swap's delete→rename window
    * on a REWRITTEN day is the same one the backfill job itself has.
    */
  def sync(spark: SparkSession, sharedArchiveDir: String, localDir: String,
      topologyDir: String, slice: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val shared = new Path(sharedArchiveDir)
    val sharedFs = shared.getFileSystem(conf)
    if (!sharedFs.exists(shared)) return Nil
    val local = new Path(localDir)
    val localFs = local.getFileSystem(conf)
    localFs.mkdirs(local)
    val assignment = SliceRebalance.read(topologyDir)
    // capture the drain-marker seq BEFORE listing: drains that commit
    // during this sync may or may not be copied below, so only the seq
    // observed first is safely "synced through"
    val markerSeq = graft.ingest.DrainMarker.read(sharedArchiveDir, conf).seq
    val prefix = s"${graft.ingest.Archiver.DayCol}="
    val mine = SliceBootstrap.localDays(spark, sharedArchiveDir).filter { d =>
      assignment.forall(a => SliceRebalance.extendedOwner(a, d).contains(slice))
    }
    val synced = Seq.newBuilder[String]
    mine.foreach { day =>
      val srcPart = new Path(shared, s"$prefix$day")
      val dstPart = new Path(local, s"$prefix$day")
      if (fileSet(sharedFs, srcPart) != fileSet(localFs, dstPart)) {
        val tmp = new Path(local, s".$prefix$day.syncing")
        if (localFs.exists(tmp)) localFs.delete(tmp, true)
        FileUtil.copy(sharedFs, srcPart, localFs, tmp, false, conf)
        if (localFs.exists(dstPart)) localFs.delete(dstPart, true)
        require(localFs.rename(tmp, dstPart), s"slice sync rename failed for $dstPart")
        synced += day
      }
    }
    // record the synced-through seq: the serving catalog stops routing
    // this member's owned rewritten days to the shared archive
    graft.ingest.DrainMarker.writeSynced(localDir, conf, markerSeq)
    synced.result()
  }

  /** (name, length) of every data file in a day partition — the
    * staleness fingerprint. Missing partition → empty set.
    */
  private def fileSet(fs: org.apache.hadoop.fs.FileSystem,
      part: Path): Set[(String, Long)] =
    if (!fs.exists(part)) Set.empty
    else fs.listStatus(part).filter(_.isFile)
      .filterNot(s => s.getPath.getName.startsWith(".") ||
        s.getPath.getName.startsWith("_"))
      .map(s => (s.getPath.getName, s.getLen)).toSet
}
