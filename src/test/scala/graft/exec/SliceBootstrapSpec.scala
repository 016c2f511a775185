package graft.exec

import graft.{SparkSpec, Tables}
import graft.api.GraftServer
import graft.aql.Catalog
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Replace-a-dead-member drill (ref memstore/bootstrap.go +
  * datanode/bootstrap_manager.go): a slice's only instance dies; a BLANK
  * replacement bootstraps its slice's day partitions from shared storage
  * into instance-local storage, registers into the topology, and the
  * broker's merged answers return to exactly the pre-failure values.
  */
class SliceBootstrapSpec extends SparkSpec {

  private val Split = "2024-01-15"

  private def slicedBetween(from: Option[String], to: Option[String]): Catalog = {
    val base = Catalog.testdata(sfDir)
    val ev = base.tables("events")
    val day = col(graft.ingest.Archiver.DayCol)
    val pred = (from.map(day >= lit(_)).toSeq ++ to.map(day < lit(_)))
      .reduceOption(_ && _).getOrElse(lit(true))
    base.copy(tables = base.tables +
      ("events" -> ev.copy(load = s => ev.load(s).where(pred))))
  }

  private def countQuery: String =
    s"""{"table": "events",
        "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
        "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
        "timeFilter": {"from": "1704067200"}, "now": 1706659200}"""

  private def normalize(v: JValue): String = JsonMethods.compact(JsonMethods.render(
    v match {
      case JObject(fields) => JObject(fields.sortBy(_._1))
      case other => other
    }))

  test("a blank replacement bootstraps its slice from shared storage and " +
      "restores the pre-failure merged answers") {
    // shared storage: the day-partitioned archive fixture
    Tables.eventsArchived(spark, sfDir)
    val sharedDir = Tables.eventsArchivePath(sfDir)

    val p1 = new GraftServer(slicedBetween(None, Some(Split)), spark)
    val p2 = new GraftServer(slicedBetween(Some(Split), None), spark)
    Seq(p1, p2).foreach(_.start())
    var now = 0L
    val dir = java.nio.file.Files.createTempDirectory("boot-topo").toString
    val topo = new BrokerTopology(dir, staleMillis = 5000, cacheMillis = 0,
      clock = () => now)
    val hour = 3600 * 1000L
    val r1 = topo.register("a", s"http://localhost:${p1.boundPort}", beatMillis = hour)
    val r2 = topo.register("b", s"http://localhost:${p2.boundPort}", beatMillis = hour)
    val dyn = Broker.dynamic(topo)
    try {
      val before = normalize(JsonMethods.parse(dyn.aql(countQuery)))

      // ---- the slice's only instance dies (deregisters + stops) ----------
      r2.close()
      p2.stop()
      assert(topo.slices().length == 1)
      val degraded = normalize(JsonMethods.parse(dyn.aql(countQuery)))
      assert(degraded != before, "slice b still answered after its death?")

      // ---- blank replacement: bootstrap slice b's days from shared -------
      val localDir = java.nio.file.Files.createTempDirectory("boot-local").toString
      val copied = SliceBootstrap.copySlice(spark, sharedDir, localDir,
        fromDay = Some(Split), toDay = None)
      assert(copied.nonEmpty && copied.forall(_ >= Split), copied.toString)
      assert(SliceBootstrap.localDays(spark, localDir) == copied.sorted,
        "local days must cover exactly the bootstrapped slice")
      // re-run is a no-op: every day already complete locally
      assert(SliceBootstrap.copySlice(spark, sharedDir, localDir,
        Some(Split), None).isEmpty)
      // days OUTSIDE the slice range were not copied
      assert(SliceBootstrap.localDays(spark, localDir).forall(_ >= Split))

      val p3 = new GraftServer(
        SliceBootstrap.eventsCatalog(Catalog.testdata(sfDir), localDir), spark)
      p3.start()
      val r3 = topo.register("b", s"http://localhost:${p3.boundPort}",
        id = "b-replacement", beatMillis = hour)
      try {
        assert(topo.slices().length == 2)
        // the SAME broker object, no restart: next fan-out answers
        // exactly the pre-failure values through the local copy
        val after = normalize(JsonMethods.parse(dyn.aql(countQuery)))
        assert(after == before,
          s"bootstrapped replacement diverged:\n  before: $before\n  after:  $after")
      } finally {
        r3.close()
        p3.stop()
      }
    } finally {
      r1.close()
      try r2.close() catch { case _: Throwable => () }
      p1.stop()
      try p2.stop() catch { case _: Throwable => () }
    }
  }

  test("peer-streaming bootstrap: replacement pulls its slice over HTTP " +
      "with no shared archive dir") {
    Tables.eventsArchived(spark, sfDir)
    // the archive dir here plays the PEER'S instance-local storage — the
    // replacement never touches it through the filesystem, only through
    // the peer's /bootstrap surface
    val peerLocalDir = Tables.eventsArchivePath(sfDir)
    val peer = new GraftServer(slicedBetween(Some(Split), None), spark)
    peer.bootstrapRoots = Map("events" -> peerLocalDir)
    peer.start()
    try {
      val peerUrl = s"http://localhost:${peer.boundPort}"
      val localDir = java.nio.file.Files.createTempDirectory("peer-local").toString
      val copied = SliceBootstrap.copySliceFromPeer(spark, peerUrl, "events",
        localDir, fromDay = Some(Split), toDay = None)
      assert(copied.nonEmpty && copied.forall(_ >= Split), copied.toString)
      assert(SliceBootstrap.localDays(spark, localDir) == copied.sorted)
      // idempotent: every day already complete locally
      assert(SliceBootstrap.copySliceFromPeer(spark, peerUrl, "events",
        localDir, Some(Split), None).isEmpty)

      // the replacement's answers equal the peer's own slice answers
      val replacement = new GraftServer(
        SliceBootstrap.eventsCatalog(Catalog.testdata(sfDir), localDir), spark)
      replacement.start()
      try {
        val client = java.net.http.HttpClient.newHttpClient()
        def answer(port: Int): String = {
          val resp = client.send(
            java.net.http.HttpRequest.newBuilder(java.net.URI.create(
              s"http://localhost:$port/query/aql"))
              .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
                s"""{"queries": [$countQuery]}""")).build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          normalize((JsonMethods.parse(resp.body()) \ "results")(0))
        }
        assert(answer(replacement.boundPort) == answer(peer.boundPort),
          "peer-bootstrapped replacement diverged from the peer's slice")

        // the wire surface rejects escaping segments
        val bad = client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"$peerUrl/bootstrap/events/%2e%2e/files")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(bad.statusCode() != 200, s"dot-segment accepted: ${bad.body()}")
      } finally replacement.stop()
    } finally peer.stop()
  }
}
