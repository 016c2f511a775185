package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext

/** Java-serializable Hadoop `Configuration` carrier (the stock class is
  * not Serializable, and Spark's own wrapper is `private[spark]`): the
  * sinks broadcast one so executor-side `FileSystem` opens see the
  * SESSION's object-store credentials/endpoints instead of
  * `new Configuration()` classpath defaults.
  */
private[graft] class SerializableHadoopConf(
    @transient private var conf: Configuration) extends Serializable {
  def value: Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** Executor-side commit plumbing shared by the shard sinks.
  *
  * Two hazards of the naive `rename(tmp, dest)` under Spark's task
  * execution model, both fixed here:
  *
  *  - task RETRY / speculative execution: two attempts of one partition
  *    run concurrently (or a retry follows a crash after rename). Tmp
  *    names therefore embed the task ATTEMPT id — attempts never write
  *    the same file — and commit tolerates a destination another attempt
  *    already renamed into place: shard content is a deterministic
  *    function of the partition (range-partitioned, sorted), so any
  *    committed file is byte-equivalent and ours can be dropped.
  *  - executors must see the SESSION's Hadoop configuration (s3a/gcs
  *    credentials, endpoints), not `new Configuration()` defaults — the
  *    sinks broadcast `SerializableConfiguration` and open filesystems
  *    through it.
  */
private[graft] object ShardIo {

  /** Attempt-unique dot-temp path for `name` under `dir` (dot prefix keeps
    * globbing readers from seeing in-progress files).
    */
  def attemptTmp(dir: String, name: String): Path = {
    val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
    new Path(dir, s".$name.a$attempt.tmp")
  }

  /** Per-directory run marker the replace branch of [[commit]] gates on. */
  private val RunMarker = "._run_id"

  /** Driver-side, BEFORE any task launches: stamp `dir` as owned by this
    * run and return the run id the tasks must commit under. A task
    * attempt surviving from a SUPERSEDED run (a zombie executor, a
    * speculative attempt of a killed job) then fails its replace loudly
    * instead of deleting the new run's shard and installing stale bytes.
    */
  def stampRun(fs: FileSystem, dir: Path): String = {
    val id = java.util.UUID.randomUUID().toString
    val out = fs.create(new Path(dir, RunMarker), true)
    out.write(id.getBytes("UTF-8"))
    out.close()
    id
  }

  private def currentRun(fs: FileSystem, dir: Path): Option[String] = {
    val p = new Path(dir, RunMarker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Move a fully-written tmp into place. RENAME FIRST — a
    * delete-before-rename ordering would let a zombie/speculative
    * attempt delete a COMMITTED shard (already listed by the manifest)
    * and die before its rename, destroying durable output. When the
    * rename fails against an existing destination:
    *
    *  - equal length: a concurrent attempt of the SAME deterministic
    *    shard already committed — drop our identical tmp, never touch
    *    the committed file;
    *  - different length: only a task of the directory's CURRENT run
    *    (the `._run_id` marker the driver stamped before launching) may
    *    replace it — that is a re-run overwriting stale output. An
    *    attempt whose run id no longer matches the marker is a ZOMBIE
    *    from a superseded run; it must abort rather than delete the new
    *    run's shard and install stale bytes (the inversion of the very
    *    hazard rename-first exists for).
    *
    * Known residual (by design, NOT self-detecting): a zombie whose
    * stale content happens to match the new shard's byte length is
    * dropped silently by the equal-length branch with the NEW file kept
    * — harmless — while a zombie that committed into an empty slot
    * before the current run's attempt got there is replaced by the
    * current run via the different-length branch. The only silent wrong
    * outcome left needs a zombie to win the slot AND collide exactly on
    * compressed byte count with different content — vanishing for
    * gzip/binary shards, and detectable only by content hash, which
    * would cost a full double read of every conflicted shard; accepted.
    */
  def commit(fs: FileSystem, tmp: Path, dest: Path, runId: String): Unit = {
    if (!fs.rename(tmp, dest)) {
      require(fs.exists(dest),
        s"commit $dest: rename failed and no committed file exists")
      if (fs.getFileStatus(dest).getLen == fs.getFileStatus(tmp).getLen)
        fs.delete(tmp, false)
      else {
        val owner = currentRun(fs, dest.getParent)
        require(owner.contains(runId),
          s"commit $dest: destination differs and this attempt's run $runId " +
            s"is not the directory's current run ${owner.getOrElse("<none>")} " +
            "— a superseded (zombie) attempt must never replace a newer " +
            "run's shard")
        fs.delete(dest, false)
        require(fs.rename(tmp, dest),
          s"commit $dest: rename failed after replacing a stale shard")
      }
    }
  }
}
