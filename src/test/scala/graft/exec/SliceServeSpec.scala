package graft.exec

import graft.{SparkSpec, Tables}
import graft.api.GraftServer
import graft.aql.Catalog
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The drain→serve loop in slice mode (ref ownership-routed ingestion,
  * subscriber/common/job/streaming_processor.go:48-71): a member ingests
  * fresh rows over HTTP, its scheduler drain promotes the delta into the
  * SHARED archive, and the day's serving owner pulls it down
  * ([[SliceSync]]) — the fresh day is queryable behind the broker,
  * exactly once, with NO manual bootstrap or rebalance.
  */
class SliceServeSpec extends SparkSpec {

  private def wideQuery: String =
    s"""{"table": "events",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
        "timeFilter": {"from": "1704067200", "to": "1900000000"},
        "now": 1900000000}"""

  private def total(resultJson: String): Double =
    JsonMethods.parse(resultJson) match {
      case JObject(fields) => fields.map {
        case (_, JDouble(d)) => d
        case (_, JInt(i)) => i.toDouble
        case other => fail(s"unexpected leaf $other")
      }.sum
      case other => fail(s"unexpected result shape $other")
    }

  test("slice mode: ingest, drain to shared, fresh day served once with no manual rebalance") {
    Tables.eventsArchived(spark, sfDir)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    // private shared-archive copy — the drain MUTATES it
    val sharedDir = tmp("ss-shared")
    SliceBootstrap.copySlice(spark, Tables.eventsArchivePath(sfDir), sharedDir)
    val dirs = Map("a" -> tmp("ss-a"), "b" -> tmp("ss-b"))
    val topoDir = tmp("ss-topo")
    SliceRebalance.rebalance(spark, sharedDir, dirs, topoDir)

    val base = Catalog.testdata(sfDir)
    def member(slice: String): GraftServer = {
      val srv = new GraftServer(
        SliceRebalance.servingCatalog(base, dirs(slice), topoDir, slice,
          sharedArchiveDir = sharedDir), spark)
      // the ServerMain slice wiring: drains target the shared archive,
      // this member pulls its served days right after its own drain
      srv.sliceServe("events", sharedDir,
        () => SliceSync.sync(spark, sharedDir, dirs(slice), topoDir, slice))
      srv.start()
      srv
    }
    val pa = member("a")
    val pb = member("b")
    try {
      val broker = new Broker(Seq(
        s"http://localhost:${pa.boundPort}", s"http://localhost:${pb.boundPort}"))
      val before = total(broker.aql(wideQuery))
      assert(before > 0)

      // fresh rows for a brand-new day arrive at member a over HTTP
      val freshDay = "2030-01-01"
      val rows = (1 to 3).map(i =>
        s"""{"event_id": ${900000000L + i}, "ts": "$freshDay 12:0$i:00",
            "user_id": $i, "event_type": "fresh_et", "value": 1.5,
            "props": "{}"}""").mkString("[", ",", "]")
      val client = java.net.http.HttpClient.newHttpClient()
      val ing = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://localhost:${pa.boundPort}/data/events"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(rows)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(ing.statusCode() == 200, ing.body())

      // visible immediately from a's live overlay, counted once
      assert(total(broker.aql(wideQuery)) == before + 3,
        "fresh rows must serve from the ingesting member's overlay pre-drain")

      // scheduler drain: the delta promotes into the SHARED archive and
      // a's post-drain hook refreshes the days a serves
      pa.drain("events", sharedDir)
      assert(SliceBootstrap.localDays(spark, sharedDir).contains(freshDay),
        "drain must land the fresh day in the shared archive")

      // NO serving gap between the drain and the owner's sync tick: the
      // day's owner serves it from the SHARED archive while its local
      // cache still lacks it (rows were visible pre-drain; vanishing
      // until a sync tick would be a non-monotonic undercount window)
      assert(total(broker.aql(wideQuery)) == before + 3,
        "fresh day must keep serving (shared-archive fallback) before any sync")

      // the day's serving owner under the PUBLISHED assignment picks it
      // up on its periodic sync tick (extended ownership — no republish)
      val owner = SliceRebalance.extendedOwner(
        SliceRebalance.read(topoDir).get, freshDay).get
      SliceSync.sync(spark, sharedDir, dirs("b"), topoDir, "b")
      assert(SliceBootstrap.localDays(spark, dirs(owner)).contains(freshDay),
        s"extended owner $owner must hold the fresh day after sync")

      // post-drain: still exactly once through the assignment-aware pair
      assert(total(broker.aql(wideQuery)) == before + 3,
        "fresh day must serve exactly once after the drain")
    } finally Seq(pa, pb).foreach(_.stop())
  }

  test("grow window: a registered-but-unassigned member serves zero days, tier stays available") {
    Tables.eventsArchived(spark, sfDir)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val sharedDir = tmp("gw-shared")
    SliceBootstrap.copySlice(spark, Tables.eventsArchivePath(sfDir), sharedDir)
    val dirs = Map("a" -> tmp("gw-a"), "b" -> tmp("gw-b"))
    val topoDir = tmp("gw-topo")
    SliceRebalance.rebalance(spark, sharedDir, dirs, topoDir)

    val base = Catalog.testdata(sfDir)
    def member(slice: String, dir: String): GraftServer = {
      val srv = new GraftServer(
        SliceRebalance.servingCatalog(base, dir, topoDir, slice), spark)
      srv.start()
      srv
    }
    val pa = member("a", dirs("a"))
    val pb = member("b", dirs("b"))
    // the grow: member c registers into the fan-out with an EMPTY local
    // dir (it does not even exist yet) BEFORE any rebalance assigns it —
    // the exact topology state between "instance joins" and "rebalance
    // publishes". It must serve zero days, not error the whole scatter.
    val cDir = tmp("gw-c") + "/not-created-yet"
    val pc = member("c", cDir)
    try {
      val pair = new Broker(Seq(
        s"http://localhost:${pa.boundPort}", s"http://localhost:${pb.boundPort}"))
      val expected = total(pair.aql(wideQuery))
      val grown = new Broker(Seq(
        s"http://localhost:${pa.boundPort}", s"http://localhost:${pb.boundPort}",
        s"http://localhost:${pc.boundPort}"))
      assert(total(grown.aql(wideQuery)) == expected,
        "the grow window must answer exactly the pre-grow result")
      // after the rebalance assigns c its range, the trio still answers
      // exactly once per day
      SliceRebalance.rebalance(spark, sharedDir,
        dirs + ("c" -> cDir), topoDir)
      assert(total(grown.aql(wideQuery)) == expected,
        "post-assignment the moved days must serve exactly once")
      assert(SliceBootstrap.localDays(spark, cDir).nonEmpty,
        "the rebalance must have copied days into the new member")
    } finally Seq(pa, pb, pc).foreach(_.stop())
  }

  test("concurrent drains into the shared archive: the loser skips, loses nothing") {
    Tables.eventsArchived(spark, sfDir)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val sharedDir = tmp("cd-shared")
    SliceBootstrap.copySlice(spark, Tables.eventsArchivePath(sfDir), sharedDir)
    val dirs = Map("a" -> tmp("cd-a"), "b" -> tmp("cd-b"))
    val topoDir = tmp("cd-topo")
    SliceRebalance.rebalance(spark, sharedDir, dirs, topoDir)

    val base = Catalog.testdata(sfDir)
    def member(slice: String): GraftServer = {
      val srv = new GraftServer(
        SliceRebalance.servingCatalog(base, dirs(slice), topoDir, slice,
          sharedArchiveDir = sharedDir), spark)
      srv.sliceServe("events", sharedDir,
        () => SliceSync.sync(spark, sharedDir, dirs(slice), topoDir, slice))
      srv.start()
      srv
    }
    val client = java.net.http.HttpClient.newHttpClient()
    def ingest(srv: GraftServer, ids: Range): Unit = {
      val rows = ids.map(i =>
        s"""{"event_id": ${910000000L + i}, "ts": "2030-01-05 08:0${i % 10}:00",
            "user_id": $i, "event_type": "race_et", "value": 1.0,
            "props": "{}"}""").mkString("[", ",", "]")
      val r = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://localhost:${srv.boundPort}/data/events"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(rows)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200, r.body())
    }

    val pa = member("a")
    val pb = member("b")
    try {
      val broker = new Broker(Seq(
        s"http://localhost:${pa.boundPort}", s"http://localhost:${pb.boundPort}"))
      val before = total(broker.aql(wideQuery))
      // BOTH members hold fresh rows for the SAME day — the deployment
      // state where unsynchronized scheduler ticks race their drains
      ingest(pa, 1 to 3)
      ingest(pb, 4 to 6)
      assert(total(broker.aql(wideQuery)) == before + 6)

      // another member's drain is in flight: its cross-process lock is
      // held on the shared archive. a's drain must SKIP — keeping its
      // rows in the overlay and journal — not merge against a
      // mid-rewrite day (the read-merge-swap lost-update race)
      val io = GenerationLock.hadoop(
        new org.apache.hadoop.fs.Path(sharedDir),
        spark.sparkContext.hadoopConfiguration)
      GenerationLock.withLock(io, ".graft-archive.lock", staleMs = 120000L,
        role = "drain", noun = "archive write lock") { _ =>
        pa.drain("events", sharedDir)
        assert(pa.hasLiveRows("events"),
          "a contended drain must keep the live overlay (skip, not wait)")
        assert(total(broker.aql(wideQuery)) == before + 6,
          "skipped drain must keep serving its rows from the overlay")
      }
      // lock released (the winner finished): both drains proceed in turn,
      // each merging against the other's committed rewrite
      pa.drain("events", sharedDir)
      assert(!pa.hasLiveRows("events"), "uncontended drain must promote")
      pb.drain("events", sharedDir)
      assert(total(broker.aql(wideQuery)) == before + 6,
        "after both drains every member's rows must be in the archive exactly once")
    } finally Seq(pa, pb).foreach(_.stop())
  }

  test("a purged day stops serving immediately, even from members' local caches") {
    Tables.eventsArchived(spark, sfDir)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val sharedDir = tmp("pg-shared")
    SliceBootstrap.copySlice(spark, Tables.eventsArchivePath(sfDir), sharedDir)
    val dirs = Map("a" -> tmp("pg-a"), "b" -> tmp("pg-b"))
    val topoDir = tmp("pg-topo")
    SliceRebalance.rebalance(spark, sharedDir, dirs, topoDir)

    val base = Catalog.testdata(sfDir)
    def member(slice: String): GraftServer = {
      val srv = new GraftServer(
        SliceRebalance.servingCatalog(base, dirs(slice), topoDir, slice,
          sharedArchiveDir = sharedDir), spark)
      srv.start()
      srv
    }
    val pa = member("a")
    val pb = member("b")
    try {
      val broker = new Broker(Seq(
        s"http://localhost:${pa.boundPort}", s"http://localhost:${pb.boundPort}"))
      val before = total(broker.aql(wideQuery))
      // retention: drop the archive's oldest day. Members still HOLD it
      // in their local caches (no sync runs) — it must stop serving NOW;
      // purged rows answering from caches is the compliance failure
      // retention exists to prevent
      val days = SliceBootstrap.localDays(spark, sharedDir)
      val cutoff = days(1) // delete exactly the oldest day
      import org.apache.spark.sql.functions.col
      val dropped = spark.read.parquet(sharedDir)
        .where(col(graft.ingest.Archiver.DayCol) < cutoff)
        .where(col("ts") >= org.apache.spark.sql.functions.timestamp_seconds(
          org.apache.spark.sql.functions.lit(1704067200L)))
        .count()
      assert(dropped > 0, "fixture has no rows in the purged day — test vacuous")
      val purged = graft.ingest.Archiver.purge(sharedDir, cutoff)
      assert(purged == Seq(days.head), purged.toString)
      assert(SliceBootstrap.localDays(spark, dirs("a")).contains(days.head) ||
        SliceBootstrap.localDays(spark, dirs("b")).contains(days.head),
        "a member must still hold the purged day locally for the test to bite")
      assert(total(broker.aql(wideQuery)) == before - dropped,
        "purged day must stop serving immediately from every local cache")
    } finally Seq(pa, pb).foreach(_.stop())
  }

  test("ownership-routed ingestion: a non-owner forwards rows to the day's owner") {
    Tables.eventsArchived(spark, sfDir)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val sharedDir = tmp("rt-shared")
    SliceBootstrap.copySlice(spark, Tables.eventsArchivePath(sfDir), sharedDir)
    val dirs = Map("a" -> tmp("rt-a"), "b" -> tmp("rt-b"))
    val topoDir = tmp("rt-topo")
    val membersDir = tmp("rt-members")
    SliceRebalance.rebalance(spark, sharedDir, dirs, topoDir)

    val base = Catalog.testdata(sfDir)
    def member(slice: String): GraftServer = {
      val srv = new GraftServer(
        SliceRebalance.servingCatalog(base, dirs(slice), topoDir, slice,
          sharedArchiveDir = sharedDir), spark,
        ingestRouter = Some(new SliceRouter(topoDir, membersDir, slice)))
      srv.sliceServe("events", sharedDir,
        () => SliceSync.sync(spark, sharedDir, dirs(slice), topoDir, slice))
      srv.start()
      srv
    }
    val pa = member("a")
    val pb = member("b")
    val topo = new BrokerTopology(membersDir)
    val regA = topo.register("a", s"http://localhost:${pa.boundPort}")
    val regB = topo.register("b", s"http://localhost:${pb.boundPort}")
    try {
      val broker = new Broker(Seq(
        s"http://localhost:${pa.boundPort}", s"http://localhost:${pb.boundPort}"))
      val before = total(broker.aql(wideQuery))

      // an ARCHIVED row from a day slice b owns (the last assigned day)
      val a0 = SliceRebalance.read(topoDir).get
      val bDay = a0.owners("b").last
      import org.apache.spark.sql.functions.{col, date_format}
      val victim = spark.read.parquet(sharedDir)
        .where(col(graft.ingest.Archiver.DayCol) === bDay)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("value")).first()
      val (vid, vts, vOld) =
        (victim.getLong(0), victim.getString(1), victim.getDouble(2))

      // a PK UPDATE for that row, POSTed at the NON-owner (member a):
      // without routing, a would serve the new version from its delta
      // while b keeps serving the archived one — the id answered twice
      val newValue = vOld + 1000.0
      val client = java.net.http.HttpClient.newHttpClient()
      val r = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://localhost:${pa.boundPort}/data/events"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            s"""[{"event_id": $vid, "ts": "$vts", "user_id": 1,
                  "event_type": "routed_et", "value": $newValue,
                  "props": "{}"}]""")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200, r.body())
      assert(r.body().contains("\"rowsInserted\":1"), r.body())

      // the row landed at the OWNER, not the receiving member
      assert(!pa.hasLiveRows("events"), "non-owner must not keep routed rows")
      assert(pb.hasLiveRows("events"), "owner must hold the forwarded row")

      // exactly once, with the updated value: count unchanged (an update,
      // not an insert) and the id's value is the new one, once
      assert(total(broker.aql(wideQuery)) == before,
        "a PK update must not change the row count")
      val idQuery =
        s"""{"table": "events",
            "measures": [{"alias": "v", "sqlExpression": "sum(value)"}],
            "rowFilters": ["event_id = $vid"],
            "timeFilter": {"from": "1704067200", "to": "1900000000"},
            "now": 1900000000}"""
      assert(total(broker.aql(idQuery)) == newValue,
        "the updated value must serve exactly once")
    } finally {
      Seq(regA, regB).foreach(_.close())
      Seq(pa, pb).foreach(_.stop())
    }
  }

  test("slice mode: a member crash before its drain loses nothing (journal replay)") {
    // the two round-12 durability pieces COMPOSED: a slice member's live
    // overlay is journal-backed, so a crash between ingest and the
    // scheduler drain replays on restart and the broker answer is
    // unchanged; the later drain then promotes to the shared archive and
    // truncates the journal exactly as in the single-instance case
    Tables.eventsArchived(spark, sfDir)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val sharedDir = tmp("sj-shared")
    SliceBootstrap.copySlice(spark, Tables.eventsArchivePath(sfDir), sharedDir)
    val dirs = Map("a" -> tmp("sj-a"), "b" -> tmp("sj-b"))
    val topoDir = tmp("sj-topo")
    val journalDir = tmp("sj-journal")
    SliceRebalance.rebalance(spark, sharedDir, dirs, topoDir)

    val base = Catalog.testdata(sfDir)
    def member(slice: String, jdir: Option[String]): GraftServer = {
      val srv = new GraftServer(
        SliceRebalance.servingCatalog(base, dirs(slice), topoDir, slice), spark,
        journalDir = jdir)
      srv.sliceServe("events", sharedDir,
        () => SliceSync.sync(spark, sharedDir, dirs(slice), topoDir, slice))
      srv.start()
      srv
    }
    var pa = member("a", Some(journalDir))
    val pb = member("b", None)
    def broker() = new Broker(Seq(
      s"http://localhost:${pa.boundPort}", s"http://localhost:${pb.boundPort}"))
    try {
      val before = total(broker().aql(wideQuery))
      val rows = (1 to 2).map(i =>
        s"""{"event_id": ${910000000L + i}, "ts": "2030-02-02 08:0$i:00",
            "user_id": $i, "event_type": "crash_et", "value": 2.0,
            "props": "{}"}""").mkString("[", ",", "]")
      val client = java.net.http.HttpClient.newHttpClient()
      val ing = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"http://localhost:${pa.boundPort}/data/events"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(rows)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(ing.statusCode() == 200, ing.body())
      assert(total(broker().aql(wideQuery)) == before + 2)

      // crash member a with the rows still only in its overlay + journal
      pa.stop()
      pa = member("a", Some(journalDir))
      assert(total(broker().aql(wideQuery)) == before + 2,
        "journal replay must restore the slice member's overlay — the " +
          "broker answer cannot shrink across a member crash")

      // the deferred drain completes the loop: shared archive gains the
      // day, the journal truncates, nothing double-counts
      pa.drain("events", sharedDir)
      assert(SliceBootstrap.localDays(spark, sharedDir).contains("2030-02-02"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(journalDir, "events.redolog")),
        "drain must truncate the slice member's journal")
      SliceSync.sync(spark, sharedDir, dirs("b"), topoDir, "b")
      assert(total(broker().aql(wideQuery)) == before + 2,
        "post-drain: the fresh day serves exactly once")
    } finally Seq(pa, pb).foreach(_.stop())
  }
}
