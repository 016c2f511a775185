package graft.ingest

import java.io.{File, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

/** Per-table append-only upsert journal — the durability role of the
  * reference's redo log (/root/reference/redolog/file_redolog_manager.go:
  * every upsert batch appends to the redo log BEFORE it is applied to
  * the live store; /root/reference/memstore/recovery.go replays the log
  * on restart; the log truncates once its batches are archived). The
  * Kafka ingestion path gets the same guarantee from Structured
  * Streaming checkpoints; this journal covers rows POSTed to
  * `/data/{table}`, which otherwise live only in the in-memory overlay
  * until a drain.
  *
  * One file per table, records framed as
  * `[magic:int][kind:byte][len:int][payload:len]` and fsync'd per append
  * (the reference's per-batch flush). Replay stops at the first torn or
  * unrecognized record — exactly the crash-mid-append tail a WAL replay
  * must tolerate — and reports how many clean records it saw, so a
  * truncated tail surfaces in logs rather than silently vanishing.
  *
  * Scale shape: the journal bounds itself by the drain cycle — drains
  * truncate it — so its size is one archiving interval's ingest per
  * table, the same bound the reference's redo-log rotation enforces.
  */
final class UpsertJournal(dir: String) extends RedoLog {

  import UpsertJournal._

  Files.createDirectories(Paths.get(dir))

  private val channels = TrieMap.empty[String, FileChannel]

  private def fileOf(table: String): File = {
    // table names come off the URL path and become file names — same
    // path-segment rules as the serving routes
    require(table.nonEmpty && !table.contains('/') && !table.contains('\\') &&
      table != "." && table != "..", s"illegal table name '$table'")
    new File(dir, s"$table.redolog")
  }

  private def channel(table: String): FileChannel =
    channels.get(table).getOrElse {
      // putIfAbsent (not getOrElseUpdate): two first-appenders racing on
      // a table must not each open a channel and leak the loser's fd —
      // the loser closes its channel and adopts the winner's. In-repo
      // callers already serialize per table (the server's table lock),
      // but the class is public API.
      val fresh = new FileOutputStream(fileOf(table), true).getChannel
      channels.putIfAbsent(table, fresh) match {
        case Some(existing) => fresh.close(); existing
        case None => fresh
      }
    }

  /** Append one ingest batch (the raw request body) and fsync. `kind` is
    * [[UpsertJournal.KindJson]] or [[UpsertJournal.KindBinary]] — replay
    * re-enters the matching decode path.
    */
  def append(table: String, kind: Byte, payload: Array[Byte]): Unit = {
    val ch = channel(table)
    ch.synchronized {
      val buf = ByteBuffer.allocate(9 + payload.length)
      buf.putInt(Magic).put(kind).putInt(payload.length).put(payload)
      buf.flip()
      while (buf.hasRemaining) ch.write(buf)
      ch.force(false)
    }
  }

  /** Every clean record of `table`'s journal, in append order. A torn
    * tail (crash mid-append) or corrupt frame stops the replay at the
    * last clean record.
    */
  def replay(table: String): Seq[(Byte, Array[Byte])] = {
    val f = fileOf(table)
    if (!f.exists()) return Nil
    val bytes = Files.readAllBytes(f.toPath)
    val out = Seq.newBuilder[(Byte, Array[Byte])]
    var pos = 0
    var clean = true
    while (clean && pos + 9 <= bytes.length) {
      val buf = ByteBuffer.wrap(bytes, pos, 9)
      val magic = buf.getInt
      val kind = buf.get
      val len = buf.getInt
      // long arithmetic: a corrupt len near Int.MaxValue would wrap
      // pos + 9 + len negative and slip past the bound, crashing replay
      // inside copyOfRange instead of stopping at the torn record
      if (magic != Magic || len < 0 || pos + 9L + len > bytes.length) {
        log.warn(s"journal $table: torn or corrupt record at offset $pos " +
          s"(file ${bytes.length} bytes) — replay stops here")
        clean = false
      } else {
        out += ((kind, java.util.Arrays.copyOfRange(bytes, pos + 9, pos + 9 + len)))
        pos += 9 + len
      }
    }
    if (clean && pos != bytes.length)
      log.warn(s"journal $table: ${bytes.length - pos} trailing bytes ignored")
    out.result()
  }

  /** Drop `table`'s journal — called after a successful drain persisted
    * the overlay (the reference truncates redo-log files whose batches
    * are archived, file_redolog_manager.go checkpoint path).
    */
  def truncate(table: String): Unit = {
    channels.remove(table).foreach { ch =>
      ch.synchronized { ch.truncate(0); ch.force(false); ch.close() }
    }
    val f = fileOf(table)
    if (f.exists() && !f.delete())
      log.warn(s"journal $table: could not delete ${f.getPath}")
  }

  /** Current on-disk size of `table`'s journal in bytes (0 when absent).
    * The size-triggered early-drain check compares this against its
    * configured bound — the role of the reference's redo-log file
    * rotation (redolog/file_redolog_manager.go rotates at
    * maxRedoLogFileSize so no single log grows unbounded between
    * archiving cycles).
    */
  def size(table: String): Long = {
    val f = fileOf(table)
    if (f.exists()) f.length() else 0L
  }

  /** Tables with a journal on disk (replay candidates at construction). */
  def tables: Seq[String] = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".redolog"))
      .map(_.getName.stripSuffix(".redolog")).sorted.toSeq
  }

  def close(): Unit =
    channels.keys.foreach(t => channels.remove(t).foreach(_.close()))
}

object UpsertJournal {
  private[ingest] val Magic = 0x47524A4C // "GRJL"
  val KindJson: Byte = 0
  val KindBinary: Byte = 1
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[UpsertJournal])
}
