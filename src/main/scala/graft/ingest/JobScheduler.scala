package graft.ingest

import scala.collection.concurrent.TrieMap

/** Mutable per-table job configuration — the reference's `TableConfig`
  * knobs (/root/reference/metastore/common/model.go:76-124) with its
  * documented defaults (/root/reference/metastore/disk_metastore.go:35-48).
  * Sizes are bytes, intervals minutes, exactly like the wire fields.
  */
final case class TableJobConfig(
    batchSize: Int = 2097152,
    redoLogRotationInterval: Int = 10800,
    maxRedoLogFileSize: Int = 1 << 30,
    archivingDelayMinutes: Long = 1440,
    archivingIntervalMinutes: Long = 180,
    backfillIntervalMinutes: Long = 60,
    backfillMaxBufferSize: Long = 4294967296L,
    backfillThresholdInBytes: Long = 2097152L,
    backfillStoreBatchSize: Int = 20000,
    recordRetentionInDays: Int = 90,
    snapshotIntervalMinutes: Long = 360,
    snapshotThreshold: Long = 3L * 2097152,
    allowMissingEventTime: Boolean = false)

/** What the scheduler needs from the serving tier — implemented by
  * [[graft.api.GraftServer]]. Narrow by design: the scheduler decides
  * WHEN per the reference's eligibility rules; the store owns HOW (drain
  * routes live→archive or delta→backfill itself, under the per-table
  * ingest lock, which is what gives jobs mutual exclusion with ingest).
  */
trait SchedulableStore {
  def tableNames: Seq[String]
  def isFactTable(table: String): Boolean
  def jobConfig(table: String): TableJobConfig
  /** Live overlay present (rows ingested since the last drain). */
  def hasLiveRows(table: String): Boolean
  /** Rows upserted since the last drain (the snapshot mutation marker,
    * ref snapshot_manager.go NumMutations).
    */
  def mutationsSinceDrain(table: String): Long
  /** Optimizer size estimate of the un-drained delta in bytes (the
    * backfill buffer size, ref backfill_manager.go CurrentBufferSize).
    */
  def pendingBytes(table: String): Long
  /** Archive directory the table was last drained to, if any. */
  def archiveDir(table: String): Option[String]
  def drain(table: String, dir: String): Unit
  /** Drop archive day partitions strictly older than `retainFromDay`. */
  def purge(table: String, retainFromDay: String): Seq[String]
  /** Fold fragmented archive day partitions back to few sorted files
    * (the reference's archiving merge half — its archiving job rewrites
    * each day to ONE sorted batch, archiving.go:59-141; our drains
    * append, so compaction restores that invariant). Default no-op so
    * non-archiving stores need not implement it.
    */
  def compact(table: String, dir: String): Unit = ()
}

/** Periodic job scheduler — the reference's memstore scheduler tier
  * (/root/reference/memstore/scheduler.go:1-308 +
  * job_manager.go:53-485): a minute-grain tick scans every table,
  * generates the eligible jobs per the per-table config, and runs them
  * SEQUENTIALLY on one executor. Eligibility rules are the reference's:
  *
  *   - archiving (fact): run when `now - delay > cutoff + interval`
  *     (newCutoff strictly beyond the last cutoff plus the interval,
  *     job_manager.go:54-66); on success the cutoff advances to
  *     `now - delay`.
  *   - backfill (fact): size-triggered when the pending delta reaches
  *     `backfillThresholdInBytes` (backfill_manager.go:177-181),
  *     otherwise timer-based every `backfillIntervalMinutes`; the first
  *     tick only seeds lastRun (job_manager.go:210-229).
  *   - snapshot (dim): mutations ≥ `snapshotThreshold`, or any mutations
  *     once `snapshotIntervalMinutes` elapsed (snapshot_manager.go:96-101).
  *   - purge (fact): daily (purge_manager.go PurgeInterval=24h), dropping
  *     day partitions older than `recordRetentionInDays`; 0 days = keep
  *     forever (job_manager.go:459-484).
  *
  * In this engine archiving and backfill are both served by the store's
  * `drain` (first drain writes the day-partitioned archive, later drains
  * promote only the delta through [[Backfill]]); each keeps its own
  * reference eligibility and job record. The tick loop re-arms AFTER a
  * round completes (scheduler.go:195-216's timer reset), so a slow round
  * skips ticks instead of stacking. The clock is injectable for tests.
  */
final class JobScheduler(store: SchedulableStore, archiveRoot: String,
    clock: () => Long = () => System.currentTimeMillis() / 1000,
    tickSeconds: Long = 60) {

  import JobScheduler._

  final class JobDetail {
    @volatile var status: String = "waiting"
    @volatile var lastRun: Long = 0
    @volatile var lastError: Option[String] = None
    @volatile var numRuns: Long = 0
    /** Archiving only: the current cutoff (epoch seconds). */
    @volatile var currentCutoff: Long = 0
    /** Purge only: seeded at first sight like the reference's purge
      * manager (LastPurgeTime = Now() at construction).
      */
    @volatile var seeded: Boolean = false
  }

  private val details = TrieMap.empty[(String, String), JobDetail]
  private val enabledFlags = TrieMap.empty[String, Boolean]
  private val extraJobs = TrieMap.empty[String, () => Unit]
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Register a named job run once per tick after the table jobs (the
    * deployment-shape hooks: slice sync, membership-watch rebalance
    * triggers). Tracked in the job-detail report like any table job.
    */
  def addExtraJob(name: String, job: () => Unit): Unit = extraJobs.put(name, job)

  def enableJobType(jobType: String, enable: Boolean): Unit =
    enabledFlags.put(jobType, enable)
  def isJobTypeEnabled(jobType: String): Boolean =
    enabledFlags.getOrElse(jobType, true)

  def jobDetail(table: String, jobType: String): JobDetail =
    details.getOrElseUpdate((table, jobType), new JobDetail)

  private def dirFor(table: String): String =
    store.archiveDir(table).getOrElse(s"$archiveRoot/$table")

  private def dayOf(epoch: Long): String =
    java.time.LocalDate.ofEpochDay(Math.floorDiv(epoch, 86400L)).toString

  /** One scheduler round: generate eligible jobs table by table and run
    * them sequentially (the reference's single executor loop). Returns the
    * number of jobs that RAN (successfully or not).
    */
  def tick(): Int = {
    val now = clock()
    var ran = 0
    def execute(table: String, jobType: String)(body: => Unit): Unit = {
      val d = jobDetail(table, jobType)
      d.status = "running"
      try {
        body
        d.status = "succeeded"
        d.lastError = None
      } catch {
        case scala.util.control.NonFatal(e) =>
          d.status = "failed"
          d.lastError = Some(Option(e.getMessage).getOrElse(e.getClass.getName))
          log.warn(s"$jobType job for $table failed", e)
      }
      d.lastRun = now
      d.numRuns += 1
      ran += 1
    }

    store.tableNames.foreach { t =>
      val cfg = store.jobConfig(t)
      if (store.isFactTable(t)) {
        // ---- archiving: newCutoff > cutoff + interval ------------------
        if (isJobTypeEnabled(Archiving)) {
          val d = jobDetail(t, Archiving)
          val newCutoff = now - cfg.archivingDelayMinutes * 60
          if (newCutoff > d.currentCutoff + cfg.archivingIntervalMinutes * 60 &&
              store.hasLiveRows(t)) {
            execute(t, Archiving) {
              store.drain(t, dirFor(t))
              d.currentCutoff = newCutoff
            }
          }
        }
        // ---- backfill: size triggered, else timer ----------------------
        if (isJobTypeEnabled(Backfill)) {
          val d = jobDetail(t, Backfill)
          if (store.pendingBytes(t) >= cfg.backfillThresholdInBytes) {
            execute(t, Backfill)(store.drain(t, dirFor(t)))
          } else if (d.lastRun == 0) {
            d.lastRun = now // first tick seeds the timer, no run
          } else if (now >= d.lastRun + cfg.backfillIntervalMinutes * 60 &&
              store.hasLiveRows(t)) {
            execute(t, Backfill)(store.drain(t, dirFor(t)))
          }
        }
        // ---- purge: daily, retention-bounded ---------------------------
        if (isJobTypeEnabled(Purge) && cfg.recordRetentionInDays > 0) {
          val d = jobDetail(t, Purge)
          if (!d.seeded) { d.seeded = true; d.lastRun = now }
          else if (now >= d.lastRun + PurgeIntervalSeconds &&
              store.archiveDir(t).isDefined) {
            execute(t, Purge) {
              store.purge(t, dayOf(now - cfg.recordRetentionInDays * 86400L))
            }
          }
        }
        // ---- compaction: daily — restore the one-sorted-batch-per-day
        // invariant the reference's archiving merge maintains (our
        // incremental drains append files instead)
        if (isJobTypeEnabled(Compaction)) {
          val d = jobDetail(t, Compaction)
          if (!d.seeded) { d.seeded = true; d.lastRun = now }
          else if (now >= d.lastRun + PurgeIntervalSeconds) {
            store.archiveDir(t).foreach { dir =>
              execute(t, Compaction)(store.compact(t, dir))
            }
          }
        }
      } else {
        // ---- snapshot (dimension tables) -------------------------------
        if (isJobTypeEnabled(Snapshot)) {
          val d = jobDetail(t, Snapshot)
          if (!d.seeded) { d.seeded = true; d.lastRun = now }
          val mutations = store.mutationsSinceDrain(t)
          if (mutations >= cfg.snapshotThreshold ||
              (mutations > 0 && now >= d.lastRun + cfg.snapshotIntervalMinutes * 60)) {
            execute(t, Snapshot)(store.drain(t, dirFor(t)))
          }
        }
      }
    }
    extraJobs.toSeq.sortBy(_._1).foreach { case (name, job) =>
      execute(name, Extra)(job())
    }
    ran
  }

  // ---- background loop -----------------------------------------------------

  @volatile private var running = false
  private var thread: Option[Thread] = None

  /** Start the tick loop: wait at least `tickSeconds` BETWEEN rounds (the
    * reference resets its timer after each run so a slow round skips
    * ticks rather than queueing them, scheduler.go:195-204).
    */
  def start(): Unit = synchronized {
    if (running) return
    running = true
    val th = new Thread(() => {
      while (running) {
        try Thread.sleep(tickSeconds * 1000)
        catch { case _: InterruptedException => () }
        if (running)
          try tick()
          catch { case scala.util.control.NonFatal(e) =>
            log.warn("scheduler tick failed", e) }
      }
    }, "graft-job-scheduler")
    th.setDaemon(true)
    th.start()
    thread = Some(th)
  }

  def stop(): Unit = synchronized {
    running = false
    thread.foreach(_.interrupt())
    thread = None
  }

  /** Job-detail report, the GetJobDetails surface (scheduler.go:124-130). */
  def detailsJson: String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fields = details.toSeq.sortBy { case ((t, j), _) => (t, j) }.map {
      case ((t, j), d) =>
        s"$t|$j" -> (JObject(List(
          "status" -> JString(d.status),
          "lastRun" -> JLong(d.lastRun),
          "numRuns" -> JLong(d.numRuns)) ++
          (if (j == Archiving) List("currentCutoff" -> JLong(d.currentCutoff)) else Nil) ++
          d.lastError.map(e => "lastError" -> (JString(e): JValue)).toList): JValue)
    }
    JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
  }
}

object JobScheduler {
  val Archiving = "archiving"
  val Backfill = "backfill"
  val Snapshot = "snapshot"
  val Purge = "purge"
  val Compaction = "compaction"
  val Extra = "extra"
  /** purge_manager.go:41 PurgeInterval = 24h. */
  val PurgeIntervalSeconds: Long = 86400
}
