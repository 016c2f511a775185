package graft.exec

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Health-tracked dynamic broker membership over shared storage — the
  * role the reference's `HealthTrackingDynamicTopology` plays for its
  * broker (/root/reference/broker/executor.go:33, cluster/topology/:
  * instances join/leave an etcd-watched membership set and shard
  * assignments follow). The deployment substrate here is the same
  * shared-directory pattern [[graft.api.SchemaSync]] established:
  *
  *   - each instance REGISTERS one file `members/<id>.json` holding its
  *     slice id, URL, and a heartbeat timestamp, re-written (atomic
  *     rename) every `beatMillis` by a daemon heartbeater;
  *   - the broker lists the directory and groups fresh members by slice
  *     id — a member whose heartbeat is older than `staleMillis` is
  *     DEMOTED (dropped from its slice's replica list) with no restart,
  *     and a newly registered member joins the fan-out on the next
  *     topology read;
  *   - reads are cached for `cacheMillis` so per-query refresh costs one
  *     directory listing at most twice a second.
  *
  * The slice id is the shard-assignment key: members sharing a slice id
  * are replicas of the same data slice (the reference's
  * util.CalculateShardAssignment distributes shards over instances; here
  * the deployment names its slices and the broker fans over the distinct
  * ids in sorted order).
  *
  * Partial answers are forbidden — a DOWN slice fails queries loudly
  * instead of silently narrowing the fan-out:
  *
  *   - with a published assignment document present (`assignment.json`
  *     in `assignmentDir`, default the topology dir itself —
  *     [[SliceRebalance]]'s publish target), an ASSIGNED slice with a
  *     nonempty day list and no fresh member means days served by
  *     NOBODY: crashed (stale member file), never started, or a member
  *     registered under a typo'd slice id. A stale slice the assignment
  *     no longer names is harmless garbage (the crash-triggered
  *     rebalance reassigns a dead slice's days but nobody deletes its
  *     registry file) and does NOT block serving. This is the
  *     broker-side half of the contract that lets
  *     [[SliceRebalance.servingCatalog]] keep an UNASSIGNED member
  *     available (serving zero days) during a grow window.
  *   - with NO assignment to consult, a slice whose registered members
  *     are all stale is crashed, not departed (deregistration deletes
  *     the member file) — dropping it from the fan-out would silently
  *     undercount every merged aggregate, so queries fail by name.
  */
final class BrokerTopology(dir: String,
    staleMillis: Long = 15000, cacheMillis: Long = 500,
    clock: () => Long = () => System.currentTimeMillis(),
    assignmentDir: String = "") {

  private val root = Paths.get(dir, "members")
  Files.createDirectories(root)

  @volatile private var cached: (Long, Seq[Seq[String]]) = (Long.MinValue, Nil)

  /** Fresh members grouped into replica lists by slice id, sorted by
    * slice id for a deterministic scatter order.
    */
  def slices(): Seq[Seq[String]] = {
    val now = clock()
    val (at, snap) = cached
    // the initial sentinel must never satisfy the cache window (now -
    // Long.MinValue overflows negative and would pin the empty snapshot)
    if (at != Long.MinValue && now - at < cacheMillis) return snap
    val members = list()
    val fresh = members.filter(m => now - m.heartbeat <= staleMillis)
    val freshIds = fresh.map(_.slice).toSet
    SliceRebalance.read(if (assignmentDir.nonEmpty) assignmentDir else dir) match {
      case Some(a) =>
        // assignment coverage: an ASSIGNED slice with days and no fresh
        // member is served by nobody — crashed (stale file), never
        // started, or a typo'd slice id. A stale slice the assignment no
        // longer names is harmless garbage, NOT a reason to refuse: the
        // crash-triggered rebalance flow ends exactly there (the trigger
        // reassigns a dead slice's days to survivors, but nobody deletes
        // the dead member's registry file — erroring on it would keep
        // the tier down forever after the data fully recovered)
        val uncovered = a.owners.collect {
          case (s, days) if days.nonEmpty && !freshIds.contains(s) => s
        }.toSeq.sorted
        if (uncovered.nonEmpty)
          throw new IllegalStateException(
            s"assigned slice(s) ${uncovered.mkString(", ")} (assignment " +
              s"v${a.version}) have no live member — their days would be " +
              "served by nobody, refusing to serve partial answers. " +
              "Restart the members, or let the rebalance watcher reassign.")
      case None =>
        // no assignment to consult: a slice with registered members and
        // no fresh one is DOWN (crash, not departure — close()
        // deregisters by deleting the file); fanning over the remaining
        // slices would silently undercount
        val down = members.map(_.slice).distinct.filterNot(freshIds.contains).sorted
        if (down.nonEmpty)
          throw new IllegalStateException(
            s"slice(s) ${down.mkString(", ")} have registered members but none " +
              "fresh — the slice is down, refusing to serve partial answers. " +
              "Restart the members, or delete their files under " +
              s"$root to declare the slice departed.")
    }
    val grouped = fresh.groupBy(_.slice).toSeq.sortBy(_._1)
      .map { case (_, ms) => ms.map(_.url).distinct }
    cached = (now, grouped)
    grouped
  }

  /** The distinct slice ids with at least one FRESH member — the
    * membership view a rebalance trigger watches (uncached: a trigger
    * tick is minute-grain, staleness matters more than the listing).
    */
  def freshSliceIds(): Set[String] = {
    val now = clock()
    list().filter(m => now - m.heartbeat <= staleMillis).map(_.slice).toSet
  }

  /** Every registered member, fresh or stale (observability). */
  def list(): Seq[BrokerTopology.Member] = {
    if (!Files.isDirectory(root)) return Nil
    val files = Files.list(root)
    try files.iterator.asScala.filter(_.toString.endsWith(".json")).flatMap { p =>
      try {
        val j = JsonMethods.parse(Files.readString(p))
        for {
          JString(slice) <- Option(j \ "slice")
          JString(url) <- Option(j \ "url")
        } yield BrokerTopology.Member(
          p.getFileName.toString.stripSuffix(".json"), slice, url,
          j \ "heartbeat" match {
            case JInt(h) => h.toLong
            case JLong(h) => h
            case _ => 0L
          })
      } catch { case _: Throwable => None } // partially-written file: skip
    }.toSeq
    finally files.close()
  }

  /** Register this instance and start heartbeating; returns a handle that
    * deregisters on close. `id` must be unique per process (default
    * derives from the URL).
    */
  def register(slice: String, url: String, id: String = "",
      beatMillis: Long = 2000): BrokerTopology.Registration = {
    val memberId =
      if (id.nonEmpty) id
      else url.replaceAll("[^A-Za-z0-9._-]", "_")
    val file = root.resolve(s"$memberId.json")
    def beat(): Unit = {
      val body = JsonMethods.compact(JsonMethods.render(JObject(
        "slice" -> JString(slice),
        "url" -> JString(url),
        "heartbeat" -> JLong(clock()))))
      val tmp = root.resolve(s".$memberId.tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
    beat()
    val reg = new BrokerTopology.Registration(file, () => beat())
    val th = new Thread(() => {
      while (reg.active) {
        try Thread.sleep(beatMillis)
        catch { case _: InterruptedException => () }
        if (reg.active)
          try beat() catch { case _: Throwable => () }
      }
    }, s"graft-heartbeat-$memberId")
    th.setDaemon(true)
    th.start()
    reg.thread = Some(th)
    reg
  }
}

object BrokerTopology {
  final case class Member(id: String, slice: String, url: String, heartbeat: Long)

  /** Live registration: heartbeats until closed; close deregisters
    * (deletes the member file). `pause()` stops heartbeating WITHOUT
    * deregistering — the crash simulation (the member goes stale and the
    * broker demotes it).
    */
  final class Registration(file: Path, doBeat: () => Unit) extends AutoCloseable {
    @volatile private[BrokerTopology] var active = true
    private[BrokerTopology] var thread: Option[Thread] = None
    def beatNow(): Unit = doBeat()
    /** Stop heartbeating and WAIT for the heartbeater to exit — without
      * the join, an in-flight beat can land after pause() returns and
      * re-freshen a member the caller just declared dead (a real race
      * for any orchestration that pauses then measures staleness).
      */
    def pause(): Unit = {
      active = false
      thread.foreach { t =>
        t.interrupt()
        if (t ne Thread.currentThread()) t.join(5000)
      }
    }
    override def close(): Unit = {
      pause()
      try Files.deleteIfExists(file) catch { case _: Throwable => () }
    }
  }
}
