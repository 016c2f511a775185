package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.aql.Catalog
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Cross-instance schema propagation through a shared sync directory —
  * the controller-tier analogue: create a table (and enum cases) on one
  * instance, see a peer apply it via the poller, a late-joining instance
  * pick it up at construction, and the PEER ingest + query the table.
  */
class SchemaSyncSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(base: String, path: String, body: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(base: String, path: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def eventually[T](deadlineMs: Long = 10000)(f: => Option[T]): T = {
    val end = System.currentTimeMillis() + deadlineMs
    var r = f
    while (r.isEmpty && System.currentTimeMillis() < end) {
      Thread.sleep(100)
      r = f
    }
    r.getOrElse(fail("condition not met within deadline"))
  }

  test("schema created on instance A propagates to B and a late joiner C") {
    val dir = java.nio.file.Files.createTempDirectory("schemasync").toString
    val a = new GraftServer(Catalog.testdata(sfDir), spark,
      schemaSyncDir = Some(dir), schemaSyncPollMillis = 100)
    val b = new GraftServer(Catalog.testdata(sfDir), spark,
      schemaSyncDir = Some(dir), schemaSyncPollMillis = 100)
    a.start(); b.start()
    val baseA = s"http://localhost:${a.boundPort}"
    val baseB = s"http://localhost:${b.boundPort}"
    try {
      val create = post(baseA, "/schema/tables", """{
        "name": "sync_rides", "isFactTable": true,
        "columns": [
          {"name": "request_at", "type": "Uint32"},
          {"name": "ride_id", "type": "Int64"},
          {"name": "city", "type": "SmallEnum"}
        ],
        "primaryKeyColumns": [1]
      }""")
      assert(create.statusCode() == 200, create.body())
      assert(post(baseA, "/schema/tables/sync_rides/columns/city/enum-cases",
        """{"enumCases": ["sf", "nyc"]}""").statusCode() == 200)

      // B's poller applies the LATEST snapshot — table AND enum dictionary
      // (an earlier snapshot may land first; wait for the full state)
      eventually() {
        val r = get(baseB, "/schema/tables/sync_rides")
        val cases = get(baseB, "/schema/tables/sync_rides/columns/city/enum-cases")
        if (r.statusCode() == 200 && cases.statusCode() == 200 &&
          JsonMethods.parse(cases.body()) ==
            JArray(List(JString("sf"), JString("nyc")))) Some(())
        else None
      }

      // the PEER can ingest and query the propagated table
      val ingest = post(baseB, "/data/sync_rides",
        """[{"request_at": 1706572800, "ride_id": 7, "city": "nyc"}]""")
      assert(ingest.statusCode() == 200, ingest.body())
      val q = post(baseB, "/query/aql", """{"queries": [{"table": "sync_rides",
        "measures": [{"alias": "n", "sqlExpression": "count(*)"}],
        "timeFilter": {"from": "1706400000"}, "now": 1706659200}]}""")
      assert(q.statusCode() == 200, q.body())
      assert((JsonMethods.parse(q.body()) \ "results")(0)
        .asInstanceOf[JObject].values("n") == 1.0, q.body())

      // ingest-path enum auto-expansion also publishes: a case first seen
      // in DATA on B must reach A's dictionary (ids are wire contract)
      val grow = post(baseB, "/data/sync_rides",
        """[{"request_at": 1706572900, "ride_id": 8, "city": "chi"}]""")
      assert(grow.statusCode() == 200, grow.body())
      eventually() {
        val r = get(baseA, "/schema/tables/sync_rides/columns/city/enum-cases")
        if (r.statusCode() == 200 && r.body().contains("chi")) Some(()) else None
      }

      // a late joiner applies the shared snapshot at construction
      val c = new GraftServer(Catalog.testdata(sfDir), spark,
        schemaSyncDir = Some(dir), schemaSyncPollMillis = 100)
      c.start()
      try {
        val r = get(s"http://localhost:${c.boundPort}", "/schema/tables/sync_rides")
        assert(r.statusCode() == 200, r.body())
      } finally c.stop()
    } finally {
      a.stop(); b.stop()
    }
  }
}
