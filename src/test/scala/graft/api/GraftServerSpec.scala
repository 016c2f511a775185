package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.aql.Catalog
import org.json4s._
import org.json4s.jackson.JsonMethods

/** End-to-end HTTP surface: query, ingest-then-query freshness, schema. */
class GraftServerSpec extends SparkSpec {

  private lazy val server = {
    val s = new GraftServer(Catalog.testdata(sfDir), spark)
    s.start()
    s
  }
  private lazy val base = s"http://localhost:${server.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String, accept: Option[String] = None) = {
    val builder = HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    accept.foreach(builder.header("Accept", _))
    client.send(builder.build(), HttpResponse.BodyHandlers.ofByteArray())
  }

  private def get(path: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /query/aql answers and isolates per-query errors") {
    val resp = post("/query/aql", s"""{"queries": [
      {"table": "events",
       "measures": [{"alias": "value", "sqlExpression": "count(*)"}],
       "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
       "timeFilter": {"from": "1704067200"}, "now": 1706659200}
    ]}""")
    assert(resp.statusCode() == 200)
    val parsed = JsonMethods.parse(new String(resp.body()))
    val result = (parsed \ "results").asInstanceOf[JArray].arr.head
    assert(result.asInstanceOf[JObject].obj.map(_._1).toSet ==
      Set("click", "signup", "purchase", "error", "view"))
  }

  test("POST /query/sql runs the SQL front end") {
    val resp = post("/query/sql",
      """{"queries": ["SELECT count(*) AS value FROM documents"]}""")
    assert(resp.statusCode() == 200)
    val parsed = JsonMethods.parse(new String(resp.body()))
    assert((parsed \ "errors") == JNull)
  }

  test("POST /data ingests rows that queries see immediately") {
    // count docs, ingest 3 new + 1 overwrite, count again
    def countDocs(): Double = {
      val resp = post("/query/aql",
        """{"queries": [{"table": "documents",
             "measures": [{"alias": "n", "sqlExpression": "count(*)"}]}]}""")
      implicit val fmts: Formats = DefaultFormats
      (JsonMethods.parse(new String(resp.body())) \ "results")(0)
        .asInstanceOf[JObject].values("n").asInstanceOf[Double]
    }
    val before = countDocs()

    val ingest = post("/data/documents", """[
      {"doc_id": 9000001, "text": "alpha beta", "lang": "en", "source": "api", "n_chars": 10},
      {"doc_id": 9000002, "text": "gamma", "lang": "en", "source": "api", "n_chars": 5},
      {"doc_id": 9000001, "text": "alpha beta v2", "lang": "en", "source": "api", "n_chars": 13}
    ]""")
    assert(ingest.statusCode() == 200, new String(ingest.body()))

    val after = countDocs()
    assert(after == before + 2, s"$before -> $after") // 2 new PKs, 1 overwrite

    // the later in-batch record for doc 9000001 won
    val resp = post("/query/aql", """{"queries": [{"table": "documents",
      "measures": [{"alias": "n", "sqlExpression": "count(*)"}],
      "dimensions": [{"alias": "t", "sqlExpression": "text"}],
      "rowFilters": ["doc_id = 9000001"]}]}""")
    val keys = (JsonMethods.parse(new String(resp.body())) \ "results")(0)
      .asInstanceOf[JObject].obj.map(_._1)
    assert(keys == List("alpha beta v2"))
  }

  test("Accept: application/hll returns the binary body") {
    val resp = post("/query/aql", """{"queries": [{"table": "events",
        "measures": [{"sqlExpression": "countDistinctHLL(user_id)"}],
        "dimensions": [{"alias": "day", "sqlExpression": "ts", "timeBucketizer": "day"}],
        "timeFilter": {"from": "1706400000", "to": "1706659200"},
        "now": 1706659200}]}""",
      accept = Some("application/hll"))
    assert(resp.statusCode() == 200)
    assert(resp.headers().firstValue("Content-Type").orElse("") == "application/hll")
    val result = graft.exec.HllWire.read(resp.body())
    assert(result.rows.nonEmpty && result.estimates.forall(_ > 0))
  }

  test("application/hll with a string dimension rides the dictionary section") {
    val resp = post("/query/aql", """{"queries": [{"table": "events",
        "measures": [{"sqlExpression": "countDistinctHLL(user_id)"}],
        "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
        "timeFilter": {"from": "1706400000", "to": "1706659200"},
        "now": 1706659200}]}""",
      accept = Some("application/hll"))
    assert(resp.statusCode() == 200, new String(resp.body()))
    val result = graft.exec.HllWire.read(resp.body())
    assert(result.rows.length == 5)
    val names = result.rows.indices.map(r => result.dimString(r, 0).get).toSet
    assert(names == Set("click", "signup", "purchase", "error", "view"))
  }

  test("GET /schema/tables lists tables and details one") {
    val list = get("/schema/tables")
    assert(list.statusCode() == 200)
    assert(list.body().contains("\"events\""))
    val detail = JsonMethods.parse(get("/schema/tables/events").body())
    implicit val fmts: Formats = DefaultFormats
    assert((detail \ "isFactTable").extract[Boolean])
    assert((detail \ "timeColumn").extract[String] == "ts")
  }

  test("bad requests get a 400 with an error body") {
    val resp = post("/data/unknown_table", "[]")
    assert(resp.statusCode() == 400)
    assert(new String(resp.body()).contains("error"))
  }
}
