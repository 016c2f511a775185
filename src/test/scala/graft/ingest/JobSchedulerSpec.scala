package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.api.GraftServer
import graft.aql.Catalog
import org.apache.spark.sql.functions.col
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Periodic job scheduler against a live server with an injectable clock:
  * the reference's eligibility rules (job_manager.go) drive drain /
  * backfill / snapshot / purge off the per-table config intervals, and
  * queries answer identically before and after each lifecycle step.
  */
class JobSchedulerSpec extends SparkSpec {

  private lazy val server = {
    val s = new GraftServer(Catalog.testdata(sfDir), spark)
    s.start()
    s
  }
  private lazy val base = s"http://localhost:${server.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def put(path: String, body: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .PUT(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(path: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def countOf(table: String, from: Long, now: Long): Double = {
    val resp = post("/query/aql",
      s"""{"queries": [{"table": "$table",
          "measures": [{"alias": "n", "sqlExpression": "count(*)"}],
          "timeFilter": {"from": "$from"}, "now": $now}]}""")
    assert(resp.statusCode() == 200, resp.body())
    (JsonMethods.parse(resp.body()) \ "results") (0) \ "n" match {
      case JDouble(d) => d
      case JNothing => 0.0
      case other => sys.error(s"unexpected count leaf: $other")
    }
  }

  // Fri 2024-01-26 00:00:00 UTC — clock base for the fact scenario
  private val T0 = 1706227200L

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("fact table: archiving drains on the interval, exactly once; queries identical across the drain") {
    // knobs via the schema API (model.go:76-124 wire fields): archive
    // eagerly (no delay) every 10 minutes; timer-backfill and size
    // thresholds out of the way; 2-day retention for the purge test
    val create = post("/schema/tables", """{
      "name": "sensor", "isFactTable": true,
      "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "sensor_id", "type": "Int64"},
        {"name": "reading", "type": "Float32"}
      ],
      "primaryKeyColumns": [1],
      "config": {
        "archivingDelayMinutes": 0,
        "archivingIntervalMinutes": 10,
        "backfillIntervalMinutes": 100000,
        "backfillThresholdInBytes": 1000000000000,
        "recordRetentionInDays": 2
      }
    }""")
    assert(create.statusCode() == 200, create.body())
    assert(server.jobConfig("sensor").archivingIntervalMinutes == 10)
    assert(server.jobConfig("sensor").recordRetentionInDays == 2)

    var now = T0
    val sched = new JobScheduler(server, tmp("sched-fact"), clock = () => now)

    // rows on three distinct UTC days: T0-3d, T0-1d, T0 (time col = epoch)
    val ingest = post("/data/sensor", s"""[
      {"ts": ${T0 - 3 * 86400}, "sensor_id": 1, "reading": 1.0},
      {"ts": ${T0 - 86400}, "sensor_id": 2, "reading": 2.0},
      {"ts": ${T0 + 60}, "sensor_id": 3, "reading": 3.0}
    ]""")
    assert(ingest.statusCode() == 200, ingest.body())

    val before = countOf("sensor", T0 - 10 * 86400, T0 + 3600)
    assert(before == 3.0)
    assert(server.hasLiveRows("sensor"))

    // first tick: cutoff 0 → newCutoff = now - 0 is far past interval →
    // archiving runs (drain), exactly once
    sched.tick()
    assert(!server.hasLiveRows("sensor"), "drain did not run")
    assert(server.archiveDir("sensor").isDefined)
    assert(sched.jobDetail("sensor", JobScheduler.Archiving).numRuns == 1)
    assert(sched.jobDetail("sensor", JobScheduler.Archiving).status == "succeeded")
    // the archive is day-partitioned
    val dir = java.nio.file.Paths.get(server.archiveDir("sensor").get)
    val days = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.contains("day=")).sorted
    assert(days.length == 3, days.mkString(", "))

    // queries answer identically after the drain
    assert(countOf("sensor", T0 - 10 * 86400, T0 + 3600) == before)

    // new rows + tick WITHOUT advancing the clock: newCutoff unchanged →
    // not > cutoff + interval → NO second archive run
    assert(post("/data/sensor",
      s"""[{"ts": ${T0 + 120}, "sensor_id": 4, "reading": 4.0}]""").statusCode() == 200)
    sched.tick()
    assert(sched.jobDetail("sensor", JobScheduler.Archiving).numRuns == 1,
      "archiving ran again before the interval elapsed")
    assert(server.hasLiveRows("sensor"))

    // clock past the interval → the delta drains through the backfill
    // path (second drain of the same dir), exactly once more
    now += 10 * 60 + 1
    sched.tick()
    assert(sched.jobDetail("sensor", JobScheduler.Archiving).numRuns == 2)
    assert(!server.hasLiveRows("sensor"))
    assert(countOf("sensor", T0 - 10 * 86400, now) == 4.0)

    // purge: seeded on the first tick; one day later it drops partitions
    // older than retention (2 days) — the T0-3d partition dies, the
    // others survive
    now = T0 + JobScheduler.PurgeIntervalSeconds + 1
    sched.tick()
    assert(sched.jobDetail("sensor", JobScheduler.Purge).numRuns == 1)
    val daysAfter = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.contains("day=")).sorted
    assert(daysAfter.length < days.length,
      s"purge removed nothing: ${daysAfter.mkString(", ")}")
    assert(!daysAfter.exists(_.contains(
      java.time.LocalDate.ofEpochDay((T0 - 3 * 86400) / 86400).toString)))
    // the purged rows are gone from queries; retained rows still answer
    val afterPurge = countOf("sensor", T0 - 10 * 86400, now)
    assert(afterPurge == 3.0, s"expected 3 rows after purge, got $afterPurge")

    // /dbg/jobs surfaces the details once the scheduler is attached
    server.jobScheduler = Some(sched)
    val dbg = get("/dbg/jobs").body()
    assert(dbg.contains("sensor|archiving"), dbg)
    assert(dbg.contains("\"numRuns\":2"), dbg)
  }

  test("compaction job folds fragmented archive days on the daily interval") {
    val create = post("/schema/tables", """{
      "name": "frag", "isFactTable": true,
      "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "frag_id", "type": "Int64"},
        {"name": "v", "type": "Float32"}
      ],
      "primaryKeyColumns": [1],
      "config": {
        "archivingDelayMinutes": 0,
        "archivingIntervalMinutes": 10,
        "backfillIntervalMinutes": 100000,
        "backfillThresholdInBytes": 1000000000000,
        "recordRetentionInDays": 0
      }
    }""")
    assert(create.statusCode() == 200, create.body())
    var now = T0
    val sched = new JobScheduler(server, tmp("sched-compact"), clock = () => now)
    assert(post("/data/frag",
      s"""[{"ts": $T0, "frag_id": 1, "v": 1.0}]""").statusCode() == 200)
    sched.tick() // archives; seeds the compaction timer
    val dir = server.archiveDir("frag").get
    val dayDir = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try s.toArray.map(_.toString).find(_.contains("day=")).get
      finally s.close()
    }
    def partFiles = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dayDir))
      try s.toArray.map(_.toString).count(_.matches(".*/part-[^/]*"))
      finally s.close()
    }
    // fragment the day: append 12 small files with the archive's schema
    import spark.implicits._
    (1 to 120).map(i => (T0 + i, 1000L + i, 2.0f))
      .toDF("ts", "frag_id", "v")
      .select(col("ts").cast("long"), col("frag_id").cast("long"),
        col("v").cast("float"))
      .repartition(12)
      .write.mode("append").parquet(dayDir)
    assert(partFiles > 8, s"fixture not fragmented: $partFiles files")
    val total = countOf("frag", T0 - 86400, T0 + 3600)
    assert(total == 121.0, total.toString)

    // same day: compaction timer seeded, not yet due
    sched.tick()
    assert(sched.jobDetail("frag", JobScheduler.Compaction).numRuns == 0)
    // a day later: the job runs, folds the partition, answers unchanged
    now = T0 + JobScheduler.PurgeIntervalSeconds + 1
    sched.tick()
    assert(sched.jobDetail("frag", JobScheduler.Compaction).numRuns == 1)
    assert(sched.jobDetail("frag", JobScheduler.Compaction).status == "succeeded")
    assert(partFiles == 1, s"day not compacted: $partFiles files")
    assert(countOf("frag", T0 - 86400, T0 + 3600) == total)
  }

  test("fact table: size-triggered backfill drains as soon as the delta crosses the threshold") {
    val create = post("/schema/tables", """{
      "name": "clicks", "isFactTable": true,
      "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "click_id", "type": "Int64"}
      ],
      "primaryKeyColumns": [1],
      "config": {
        "archivingDelayMinutes": 100000000,
        "backfillThresholdInBytes": 1
      }
    }""")
    assert(create.statusCode() == 200, create.body())
    var now = T0
    val sched = new JobScheduler(server, tmp("sched-size"), clock = () => now)
    assert(post("/data/clicks",
      s"""[{"ts": $T0, "click_id": 1}]""").statusCode() == 200)
    assert(server.pendingBytes("clicks") >= 1)
    sched.tick()
    // archiving blocked by the huge delay; the size trigger drained
    assert(sched.jobDetail("clicks", JobScheduler.Archiving).numRuns == 0)
    assert(sched.jobDetail("clicks", JobScheduler.Backfill).numRuns == 1)
    assert(!server.hasLiveRows("clicks"))
  }

  test("dimension table: snapshot on mutation threshold or interval-with-mutations") {
    val create = post("/schema/tables", """{
      "name": "labels", "isFactTable": false,
      "columns": [
        {"name": "label_id", "type": "Int64"},
        {"name": "label", "type": "SmallEnum"}
      ],
      "primaryKeyColumns": [0],
      "config": {"snapshotThreshold": 5, "snapshotIntervalMinutes": 10}
    }""")
    assert(create.statusCode() == 200, create.body())
    assert(server.jobConfig("labels").snapshotThreshold == 5)

    var now = T0
    val sched = new JobScheduler(server, tmp("sched-dim"), clock = () => now)
    assert(post("/data/labels",
      """[{"label_id": 1, "label": "cat"}, {"label_id": 2, "label": "dog"}]""")
      .statusCode() == 200)
    assert(server.mutationsSinceDrain("labels") == 2)

    // 2 mutations < threshold 5, interval not elapsed (first tick seeds) →
    // no snapshot
    sched.tick()
    assert(sched.jobDetail("labels", JobScheduler.Snapshot).numRuns == 0)
    assert(server.hasLiveRows("labels"))

    // interval elapses with mutations pending → snapshot runs
    now += 10 * 60 + 1
    sched.tick()
    assert(sched.jobDetail("labels", JobScheduler.Snapshot).numRuns == 1)
    assert(!server.hasLiveRows("labels"))
    assert(server.mutationsSinceDrain("labels") == 0)

    // threshold crossing snapshots without waiting for the interval
    assert(post("/data/labels", (1 to 5).map(i =>
      s"""{"label_id": ${10 + i}, "label": "l$i"}""").mkString("[", ",", "]"))
      .statusCode() == 200)
    sched.tick()
    assert(sched.jobDetail("labels", JobScheduler.Snapshot).numRuns == 2)
    assert(!server.hasLiveRows("labels"))
  }

  test("config update via PUT overlays only the provided knobs") {
    assert(post("/schema/tables", """{
      "name": "cfg_probe", "isFactTable": true,
      "columns": [{"name": "ts", "type": "Uint32"}],
      "primaryKeyColumns": [0],
      "config": {"archivingIntervalMinutes": 42}
    }""").statusCode() == 200)
    assert(server.jobConfig("cfg_probe").archivingIntervalMinutes == 42)
    // defaults fill the absent knobs (disk_metastore.go:35-48)
    assert(server.jobConfig("cfg_probe").backfillIntervalMinutes == 60)
    assert(server.jobConfig("cfg_probe").recordRetentionInDays == 90)
    // PUT overlays: the provided field changes, the rest keep their values
    val upd = put("/schema/tables/cfg_probe", """{"recordRetentionInDays": 7}""")
    assert(upd.statusCode() == 200, upd.body())
    assert(server.jobConfig("cfg_probe").recordRetentionInDays == 7)
    assert(server.jobConfig("cfg_probe").archivingIntervalMinutes == 42)
  }

  test("disabled job types generate nothing") {
    assert(post("/schema/tables", """{
      "name": "muted", "isFactTable": true,
      "columns": [{"name": "ts", "type": "Uint32"}, {"name": "k", "type": "Int64"}],
      "primaryKeyColumns": [1],
      "config": {"archivingDelayMinutes": 0, "archivingIntervalMinutes": 1}
    }""").statusCode() == 200)
    var now = T0
    val sched = new JobScheduler(server, tmp("sched-mute"), clock = () => now)
    sched.enableJobType(JobScheduler.Archiving, enable = false)
    sched.enableJobType(JobScheduler.Backfill, enable = false)
    assert(post("/data/muted",
      s"""[{"ts": $T0, "k": 1}]""").statusCode() == 200)
    sched.tick()
    assert(server.hasLiveRows("muted"), "disabled archiving still drained")
    sched.enableJobType(JobScheduler.Archiving, enable = true)
    sched.tick()
    assert(!server.hasLiveRows("muted"))
  }
}
