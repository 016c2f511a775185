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

  /** Move a fully-written tmp into place. RENAME FIRST — a
    * delete-before-rename ordering would let a zombie/speculative
    * attempt delete a COMMITTED shard (already listed by the manifest)
    * and die before its rename, destroying durable output. When the
    * rename fails against an existing destination, the length decides:
    * equal length = a concurrent attempt of the SAME deterministic
    * shard already committed (drop our identical tmp, never touch the
    * committed file); different length = a re-run with changed data is
    * replacing stale output (delete + rename — no manifest certifying
    * the old bytes survives a completed re-run anyway). The residual —
    * changed content compressing to the identical byte count — is
    * vanishing for gzip/binary shards and self-reports through the
    * manifest byte counts.
    */
  def commit(fs: FileSystem, tmp: Path, dest: Path): Unit = {
    if (!fs.rename(tmp, dest)) {
      require(fs.exists(dest),
        s"commit $dest: rename failed and no committed file exists")
      if (fs.getFileStatus(dest).getLen == fs.getFileStatus(tmp).getLen)
        fs.delete(tmp, false)
      else {
        fs.delete(dest, false)
        require(fs.rename(tmp, dest),
          s"commit $dest: rename failed after replacing a stale shard")
      }
    }
  }
}
