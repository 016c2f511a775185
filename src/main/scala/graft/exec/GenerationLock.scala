package graft.exec

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Cross-process mutual exclusion over shared storage via a
  * GENERATION-LADDER lock (a fencing-token scheme) — extracted from the
  * rebalance publish fence so the shared-archive writers can reuse it.
  *
  * The live lock is the highest-numbered `<prefix>.g<N>` file in the lock
  * directory (a bare legacy `<prefix>` counts as generation 0). Acquiring
  * = atomically creating generation `highest+1` when the current highest
  * is STALE (older than `staleMs`; a crashed holder), or generation 1
  * when none exists; a FRESH highest lock throws [[GenerationLock.Busy]].
  *
  * Why a ladder instead of delete-or-rename takeover: reclaiming by
  * VACATING the path (delete, or rename-away) opens a window where the
  * path is empty while a winner is inside — any concurrent exclusive
  * create in that window yields TWO holders in the critical section
  * (reproduced by the 8-thread hammer in SliceRebalanceSpec against both
  * prior protocols). The ladder never vacates: contest winners create the
  * NEXT generation — create-exclusive atomicity alone picks exactly one
  * winner among reclaimers that observed the same stale generation, and
  * the stale file stays in place (reaped by the winner AFTER acquisition,
  * when it is provably garbage).
  *
  * Generation numbers RESET after a full release (the ladder empties), so
  * a generation alone does not identify a holder: every winner writes a
  * NONCE into its lock file, release deletes the file only while it still
  * carries that nonce, and the `stillHeld` check handed to `body` (for a
  * commit-point re-check right before an irreversible step) requires BOTH
  * no-higher-generation AND nonce-intact.
  *
  * `heartbeatMs > 0` keeps a LONG critical section from being judged
  * stale: a daemon tick re-touches the lock file's mtime, so `staleMs`
  * can stay small enough that a CRASHED holder is reclaimed quickly while
  * a live multi-minute holder (a TB-scale backfill) is never deposed.
  * Residual (documented): a holder frozen longer than `staleMs` with its
  * heartbeat thread also frozen can still race its usurper between a
  * passed `stillHeld` and its own irreversible step — irreducible without
  * an atomic compare-and-swap primitive in the filesystem.
  *
  * Storage goes through [[GenerationLock.LockIo]]: [[GenerationLock.nio]]
  * for local/NFS paths (the topology dir), [[GenerationLock.hadoop]] for
  * Hadoop filesystems (the shared archive — exclusive create is atomic on
  * HDFS and local; object stores need their FS's conditional-create
  * support for the same guarantee).
  */
object GenerationLock {

  /** A FRESH holder owns the lock — the caller should back off (skip the
    * tick, or surface a named abort), not contest.
    */
  final class Busy(msg: String) extends IllegalStateException(msg)

  /** Minimal storage surface the ladder needs. Names are flat file names
    * inside one lock directory.
    */
  trait LockIo {
    def where: String
    def listNames(): Seq[String]
    def createExclusive(name: String): Boolean
    def read(name: String): String // "" when unreadable/vanished
    def write(name: String, content: String): Unit // best-effort
    def ageMs(name: String): Long // -1 when vanished
    def touch(name: String): Unit // best-effort mtime refresh
    def delete(name: String): Unit // best-effort
  }

  def nio(dir: Path): LockIo = new LockIo {
    Files.createDirectories(dir)
    def where: String = dir.toString
    def listNames(): Seq[String] = {
      val s = try Files.list(dir) catch { case _: java.io.IOException => return Nil }
      try {
        import scala.jdk.CollectionConverters._
        s.iterator.asScala.map(_.getFileName.toString).toSeq
      } finally s.close()
    }
    def createExclusive(name: String): Boolean =
      try { Files.createFile(dir.resolve(name)); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    def read(name: String): String =
      try Files.readString(dir.resolve(name), StandardCharsets.UTF_8)
      catch { case _: java.io.IOException => "" }
    def write(name: String, content: String): Unit =
      try Files.writeString(dir.resolve(name), content, StandardCharsets.UTF_8)
      catch { case _: java.io.IOException => () }
    def ageMs(name: String): Long =
      try System.currentTimeMillis() -
        Files.getLastModifiedTime(dir.resolve(name)).toMillis
      catch { case _: java.io.IOException => -1L }
    def touch(name: String): Unit =
      try Files.setLastModifiedTime(dir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case _: java.io.IOException => () }
    def delete(name: String): Unit =
      try Files.deleteIfExists(dir.resolve(name))
      catch { case _: java.io.IOException => () }
  }

  def hadoop(dir: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): LockIo = new LockIo {
    private val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    private def p(name: String) = new org.apache.hadoop.fs.Path(dir, name)
    def where: String = dir.toString
    def listNames(): Seq[String] =
      try fs.listStatus(dir).toSeq.map(_.getPath.getName)
      catch { case _: java.io.IOException => Nil }
    def createExclusive(name: String): Boolean =
      try fs.createNewFile(p(name))
      catch { case _: java.io.IOException => false }
    def read(name: String): String =
      try {
        val in = fs.open(p(name))
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      } catch { case _: java.io.IOException => "" }
    def write(name: String, content: String): Unit =
      try {
        val out = fs.create(p(name), true)
        try out.write(content.getBytes(StandardCharsets.UTF_8))
        finally out.close()
      } catch { case _: java.io.IOException => () }
    def ageMs(name: String): Long =
      try System.currentTimeMillis() - fs.getFileStatus(p(name)).getModificationTime
      catch { case _: java.io.IOException => -1L }
    def touch(name: String): Unit =
      try fs.setTimes(p(name), System.currentTimeMillis(), -1)
      catch { case _: java.io.IOException => () }
    def delete(name: String): Unit =
      try { fs.delete(p(name), false); () }
      catch { case _: java.io.IOException => () }
  }

  def withLock[T](io: LockIo, prefix: String, staleMs: Long, role: String,
      noun: String, hint: String = "", heartbeatMs: Long = 0)(
      body: (() => Unit) => T): T = {
    val gen = acquire(io, prefix, staleMs, role, noun, hint, attempt = 0)
    val mine = s"$prefix.g$gen"
    val nonce = java.util.UUID.randomUUID().toString
    io.write(mine, nonce)
    def deposedMsg = s"$role fenced: deposed — a concurrent $role " +
      s"reclaimed $noun generation $gen as stale. Aborting; re-run."
    def stillHeld(): Unit =
      if (io.read(mine) != nonce || ladder(io, prefix).exists(_._1 > gen))
        throw new IllegalStateException(deposedMsg)
    val beater =
      if (heartbeatMs <= 0) None
      else Some {
        val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
          r => { val t = new Thread(r, s"graft-lock-heartbeat-$prefix"); t.setDaemon(true); t })
        ex.scheduleWithFixedDelay(new Runnable {
          def run(): Unit = if (io.read(mine) == nonce) io.touch(mine)
        }, heartbeatMs, heartbeatMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        ex
      }
    try {
      // deposition check at entry (one listing serves check and reap): a
      // higher generation — or a recycled same-numbered lock no longer
      // carrying our nonce — means another holder judged us stale while
      // we stalled between acquire and here
      val ladder0 = ladder(io, prefix)
      if (io.read(mine) != nonce || ladder0.exists(_._1 > gen))
        throw new IllegalStateException(deposedMsg)
      ladder0.filter(_._1 < gen).foreach { case (_, n) =>
        // reap dead ancestors (provably garbage: we hold the highest gen)
        io.delete(n)
      }
      body(stillHeld _)
    } finally {
      beater.foreach(_.shutdownNow())
      // release ONLY a lock that is still ours: after a full release the
      // ladder resets, so a stalled holder's blind delete could remove a
      // successor's identically-numbered LIVE lock and re-open the
      // double-entry the ladder closed
      if (io.read(mine) == nonce) io.delete(mine)
    }
  }

  /** [[withLock]] over a local path. */
  def withLock[T](dir: Path, prefix: String, staleMs: Long, role: String,
      noun: String, hint: String, heartbeatMs: Long)(
      body: (() => Unit) => T): T =
    withLock(nio(dir), prefix, staleMs, role, noun, hint, heartbeatMs)(body)

  /** [[withLock]] that converts fresh contention into None instead of
    * throwing — for periodic work that can simply skip a tick.
    */
  def tryWithLock[T](io: LockIo, prefix: String, staleMs: Long, role: String,
      noun: String, heartbeatMs: Long = 0)(body: (() => Unit) => T): Option[T] =
    try Some(withLock(io, prefix, staleMs, role, noun,
      heartbeatMs = heartbeatMs)(body))
    catch { case _: Busy => None }

  private def ladder(io: LockIo, prefix: String): Seq[(Long, String)] = {
    val genPattern = (java.util.regex.Pattern.quote(prefix) + """\.g(\d+)""").r
    io.listNames().flatMap {
      case n @ genPattern(g) => Some(g.toLong -> n)
      case n if n == prefix => Some(0L -> n) // pre-ladder legacy file
      case _ => None
    }.sortBy(_._1)
  }

  @annotation.tailrec
  private def acquire(io: LockIo, prefix: String, staleMs: Long, role: String,
      noun: String, hint: String, attempt: Int): Long = {
    if (attempt >= 16) throw new IllegalStateException(
      s"$role fenced: could not acquire the $noun in ${io.where} after " +
        s"$attempt attempts (live holders churning)$hint")
    val next = ladder(io, prefix).lastOption match {
      case None => 1L
      case Some((g, n)) =>
        val age = io.ageMs(n)
        if (age < 0) -1L // holder released between list and stat: re-list
        else if (age > staleMs) g + 1 // crashed holder: contest g+1
        else throw new Busy(
          s"$role fenced: another $role holds the $noun ${io.where}/$n " +
            s"(age ${age}ms)$hint")
    }
    if (next < 0) acquire(io, prefix, staleMs, role, noun, hint, attempt + 1)
    else if (io.createExclusive(s"$prefix.g$next")) next
    // contest lost (or a release/acquire raced us): re-observe — the next
    // loop sees the winner's FRESH lock and backs off by name
    else acquire(io, prefix, staleMs, role, noun, hint, attempt + 1)
  }
}
