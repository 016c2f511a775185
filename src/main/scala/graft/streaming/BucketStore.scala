package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The persistent bucket store shared by the cross-batch dedup streams
  * ([[StreamingNearDedup]] — MinHash band buckets; [[StreamingSemanticDedup]]
  * — sign-bit LSH buckets over embeddings): per-micro-batch `batch=<id>/`
  * parquet directories plus consolidated `base=<id>/` partitions, with the
  * exactly-once argument resting on idempotent per-batch overwrite and the
  * reader excluding the current batch's own (possibly partial) directory.
  *
  * Scale shape: store size is O(corpus × tables) small rows on STORAGE,
  * never executor memory; a compaction folds the per-batch appendices
  * behind the replay horizon into one base partition so a long-running
  * stream lists a handful of directories per trigger, not one per
  * micro-batch ever processed.
  */
private[streaming] object BucketStore {

  /** Consolidated bases + per-batch appendices, excluding
    * `batch=<excludeBatchId>` (a replayed batch must not match against its
    * own previous partial write). None when the store is empty. Listed
    * through the path's own Hadoop filesystem, not java.io.File — the
    * store lives wherever the deployment's parquet does (s3a/hdfs).
    */
  def read(spark: SparkSession, dir: String,
      excludeBatchId: Long): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(path)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(path).filter(st => st.isDirectory && (
        st.getPath.getName.startsWith("base=") ||
          (st.getPath.getName.startsWith("batch=") &&
            st.getPath.getName != s"batch=$excludeBatchId")))
    if (parts.isEmpty) None
    else Some(spark.read.parquet(parts.map(_.getPath.toString).toIndexedSeq: _*))
  }

  /** Fold every `batch=<id>` directory with id <= `upToBatchId` — plus any
    * older consolidated base — into ONE `base=<upToBatchId>` partition.
    * `dedupCols` canonicalizes rows duplicated by a prior crash-in-cleanup.
    * Returns the number of directories folded.
    *
    * Horizon contract: `upToBatchId` must be strictly below any batch
    * Structured Streaming could still replay — a replayed batch excludes
    * its own partial write BY DIRECTORY NAME, which stops working once its
    * rows are folded into the base.
    *
    * Crash-safety: the new base is fully written (with a `_folded`
    * manifest of the directories it covers) and renamed into place BEFORE
    * any folded directory is removed; only manifest-covered directories
    * are deleted, so a post-checkpoint-reset batch directory that reused
    * an old id is never removed unverified.
    */
  def compact(spark: SparkSession, dir: String, upToBatchId: Long,
      dedupCols: Seq[String]): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    def idOf(name: String, prefix: String): Option[Long] =
      if (name.startsWith(prefix)) name.stripPrefix(prefix).toLongOption else None
    val all = fs.listStatus(root).filter(_.isDirectory)
    val folded = all.filter { st =>
      val n = st.getPath.getName
      idOf(n, "batch=").exists(_ <= upToBatchId) ||
        idOf(n, "base=").exists(_ < upToBatchId)
    }
    if (folded.isEmpty) return 0
    val target = new org.apache.hadoop.fs.Path(root, s"base=$upToBatchId")
    val manifest = new org.apache.hadoop.fs.Path(target, "_folded")
    if (!fs.exists(target)) {
      val tmp = new org.apache.hadoop.fs.Path(root,
        s".compact-tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      spark.read.parquet(folded.map(_.getPath.toString).toIndexedSeq: _*)
        .dropDuplicates(dedupCols)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_folded"), true)
      out.write(folded.map(_.getPath.getName).sorted.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"compaction rename failed: $tmp -> $target")
    }
    val covered: Set[String] =
      if (!fs.exists(manifest)) Set.empty
      else {
        val buf = new Array[Byte](fs.getFileStatus(manifest).getLen.toInt)
        val in = fs.open(manifest)
        try in.readFully(0, buf) finally in.close()
        new String(buf, java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty).toSet
      }
    val deletable = folded.filter(st => covered.contains(st.getPath.getName))
    deletable.foreach(st => fs.delete(st.getPath, true))
    if (deletable.length < folded.length)
      System.err.println(s"[BucketStore.compact] kept " +
        s"${folded.length - deletable.length} dir(s) <= horizon $upToBatchId " +
        s"not covered by ${target.getName}'s manifest")
    deletable.length
  }
}
