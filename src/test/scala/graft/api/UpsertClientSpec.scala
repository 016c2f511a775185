package graft.api

import graft.SparkSpec
import graft.aql.Catalog
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Client → server → AQL round trip over the reference binary wire: the
  * connector fetches the schema, auto-expands enum dictionaries, encodes
  * the batch and POSTs it; the server's decoder ingests it; AQL reads it
  * back. Closes the reference's client/ surface from both ends
  * (client/connector.go:148-190 ↔ api/UpsertBatchWire).
  */
class UpsertClientSpec extends SparkSpec {

  private lazy val server = {
    val s = new GraftServer(Catalog.testdata(sfDir), spark)
    s.start()
    s
  }
  private lazy val base = s"http://localhost:${server.boundPort}"
  private lazy val client = new UpsertClient(base)
  private val http = HttpClient.newHttpClient()

  private def post(path: String, body: String) =
    http.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("client insert round-trips: schema fetch, enum auto-expand, query back") {
    val create = post("/schema/tables", """{
      "name": "client_rides", "isFactTable": true,
      "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "ride_id", "type": "Int64"},
        {"name": "city", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"},
        {"name": "surge", "type": "Bool"},
        {"name": "rider", "type": "UUID"}
      ],
      "primaryKeyColumns": [1]
    }""")
    assert(create.statusCode() == 200, create.body())
    // seed ONE case; the client must auto-expand "nyc" and "chi"
    assert(post("/schema/tables/client_rides/columns/city/enum-cases",
      """{"enumCases": ["sf"]}""").statusCode() == 200)

    // "chi" (bare) and "den" (Option-wrapped — must auto-expand the same
    // way) are both unseen cases the client registers before encoding
    val inserted = client.insert("client_rides",
      Seq("request_at", "ride_id", "city", "fare", "surge", "rider"),
      Seq(
        Seq(1706572800L, 1L, "sf", 10.5f, true, "0f0e0d0c-0b0a-0908-0706-050403020100"),
        Seq(1706572860L, 2L, "nyc", null, false, "00112233-4455-6677-8899-aabbccddeeff"),
        Seq(1706572920L, 3L, "chi", 4.5f, true, null),
        Seq(1706572980L, 4L, "sf", 2.0f, null, null),
        Seq(1706573040L, 5L, Some("den"), 3.0f, false, None)))
    assert(inserted == 5L)

    val q = post("/query/aql", """{"queries": [{"table": "client_rides",
      "measures": [{"alias": "total_fare", "sqlExpression": "sum(fare)"}],
      "dimensions": [{"alias": "city", "sqlExpression": "city"}],
      "timeFilter": {"from": "1706400000"}, "now": 1706659200}]}""")
    assert(q.statusCode() == 200, q.body())
    val result = (JsonMethods.parse(q.body()) \ "results")(0)
      .asInstanceOf[JObject].values
    assert(result("sf") == 12.5, result)
    assert(result("chi") == 4.5, result)
    assert(result("den") == 3.0, result)

    // the UUID column survives the 16-byte wire round trip
    val u = post("/query/aql", """{"queries": [{"table": "client_rides",
      "measures": [{"alias": "n", "sqlExpression": "count(*)"}],
      "rowFilters": ["rider = '00112233-4455-6677-8899-aabbccddeeff'"],
      "timeFilter": {"from": "1706400000"}, "now": 1706659200}]}""")
    assert(u.statusCode() == 200, u.body())
    val un = (JsonMethods.parse(u.body()) \ "results")(0).asInstanceOf[JObject].values
    assert(un("n") == 1.0, u.body())
  }

  test("client validates primary key and fact-table time column presence") {
    val pkErr = intercept[IllegalArgumentException] {
      client.insert("client_rides", Seq("request_at", "city"),
        Seq(Seq(1706573000L, "sf")))
    }
    assert(pkErr.getMessage.contains("primary key"), pkErr.getMessage)
    val timeErr = intercept[IllegalArgumentException] {
      client.insert("client_rides", Seq("ride_id", "city"),
        Seq(Seq(9L, "sf")))
    }
    assert(timeErr.getMessage.contains("time column"), timeErr.getMessage)
    val widthErr = intercept[IllegalArgumentException] {
      client.insert("client_rides", Seq("request_at", "ride_id", "extra"),
        Seq(Seq(1706573000L, 9L, 1L)))
    }
    assert(widthErr.getMessage.contains("not in"), widthErr.getMessage)
  }

  test("array columns round-trip the wire: nulls, empty arrays, null elements") {
    import UpsertBatchWire._
    val arrI32 = Int32 | ArrayBit
    val arrBool = Bool | ArrayBit
    val arrF32 = Float32 | ArrayBit
    val arrUuid = Uuid | ArrayBit
    val bytes = UpsertClient.encode(4, 1706659200L, Seq(
      (0, Uint32, IndexedSeq(Some(1L), Some(2L), Some(3L), Some(4L))),
      // null row, empty array (distinct!), null element, plain values
      (1, arrI32, IndexedSeq(
        None,
        Some(IndexedSeq.empty[Option[Any]]),
        Some(IndexedSeq(Some(7L), None, Some(-9L))),
        Some(IndexedSeq(Some(42L))))),
      // bool arrays bit-pack items like the null vector
      (2, arrBool, IndexedSeq(
        Some(IndexedSeq(Some(true), Some(false), Some(true), Some(true),
          Some(false), Some(true), Some(false), Some(false), Some(true))),
        None, Some(IndexedSeq(Some(false))), Some(IndexedSeq.empty[Option[Any]]))),
      (3, arrF32, IndexedSeq(
        Some(IndexedSeq(Some(1.5f), Some(-2.25f))), None, None,
        Some(IndexedSeq(None, Some(0.125f))))),
      // 16-byte elements exercise the packed wide-item path
      (4, arrUuid, IndexedSeq(
        Some(IndexedSeq(Some("00112233-4455-6677-8899-aabbccddeeff"),
          Some("0f0e0d0c-0b0a-0908-0706-050403020100"))),
        None, None, None))))
    val batch = UpsertBatchWire.decode(bytes)
    assert(batch.numRows == 4)
    assert(batch.columns(1).values == IndexedSeq(
      None,
      Some(IndexedSeq.empty[Option[Any]]),
      Some(IndexedSeq(Some(7L), None, Some(-9L))),
      Some(IndexedSeq(Some(42L)))))
    assert(batch.columns(2).values(0) == Some(IndexedSeq(Some(true), Some(false),
      Some(true), Some(true), Some(false), Some(true), Some(false), Some(false),
      Some(true))))
    assert(batch.columns(2).values(3) == Some(IndexedSeq.empty[Option[Any]]))
    assert(batch.columns(3).values(3) == Some(IndexedSeq(None, Some(0.125f))))
    assert(batch.columns(4).values(0) == Some(IndexedSeq(
      Some("00112233-4455-6677-8899-aabbccddeeff"),
      Some("0f0e0d0c-0b0a-0908-0706-050403020100"))))
    // total size is the final column-offset word — the layout is closed
    val lastOffset = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(28 + 5 * 4)
    assert(bytes.length == lastOffset, s"${bytes.length} != $lastOffset")
  }

  test("array columns ingest end-to-end: client wire -> overlay -> AQL -> drain") {
    val create = post("/schema/tables", """{
      "name": "client_arrays", "isFactTable": true,
      "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "ride_id", "type": "Int64"},
        {"name": "stops", "type": "Int32[]"},
        {"name": "legs", "type": "Float32[]"},
        {"name": "zones", "type": "SmallEnum[]"}
      ],
      "primaryKeyColumns": [1]
    }""")
    assert(create.statusCode() == 200, create.body())
    val inserted = client.insert("client_arrays",
      Seq("request_at", "ride_id", "stops", "legs", "zones"),
      Seq(
        Seq(1706572800L, 1L, Seq(10, 20, 30), Seq(1.5f, 2.5f), Seq("soma", "mission")),
        Seq(1706572860L, 2L, Seq.empty[Int], null, Seq("soma")),
        Seq(1706572920L, 3L, Seq(7, null), Seq(0.5f), null),
        Seq(1706572980L, 4L, null, Seq(4.0f, 1.0f, 2.0f), Seq("fidi"))))
    assert(inserted == 4L)

    // 0-based element_at + length over wire-ingested arrays (the
    // q_array_* semantics on this data path)
    val q = post("/query/aql", """{"queries": [{"table": "client_arrays",
      "measures": [{"alias": "first_stop_sum", "sqlExpression": "sum(element_at(stops, 0))"}],
      "dimensions": [{"alias": "n_stops", "sqlExpression": "length(stops)"}],
      "timeFilter": {"from": "1706400000"}, "now": 1706659200}]}""")
    assert(q.statusCode() == 200, q.body())
    val rows = (JsonMethods.parse(q.body()) \ "results")(0)
      .asInstanceOf[JObject].values
    // n_stops buckets: 3 -> ride 1 (first stop 10), 0 -> ride 2 (null),
    // 2 -> ride 3 (first stop 7), NULL -> ride 4
    assert(rows.get("3").contains(10.0) && rows.get("2").contains(7.0) &&
      rows.contains("0"), s"$rows -- ${q.body()}")

    // enum-array elements resolved through the dictionary
    val z = post("/query/aql", """{"queries": [{"table": "client_arrays",
      "measures": [{"alias": "n", "sqlExpression": "count(*)"}],
      "rowFilters": ["contains(zones, 'soma')"],
      "timeFilter": {"from": "1706400000"}, "now": 1706659200}]}""")
    assert(z.statusCode() == 200, z.body())
    val zn = (JsonMethods.parse(z.body()) \ "results")(0).asInstanceOf[JObject].values
    assert(zn("n") == 2.0, z.body())

    // drain: arrays survive the overlay -> day-partitioned archive hop
    val dir = java.nio.file.Files.createTempDirectory("graft_arr_drain").toString
    server.drain("client_arrays", dir)
    val archived = spark.read.parquet(dir)
    assert(archived.count() == 4)
    import org.apache.spark.sql.functions._
    val r1 = archived.where(col("ride_id") === 1L)
      .select("stops", "legs", "zones").head()
    assert(r1.getSeq[Int](0) == Seq(10, 20, 30))
    assert(r1.getSeq[Float](1) == Seq(1.5f, 2.5f))
    assert(r1.getSeq[String](2) == Seq("soma", "mission"))
    val r3 = archived.where(col("ride_id") === 3L).select("stops").head()
    assert(r3.getSeq[Integer](0) == Seq(7, null))
  }

  test("geoshape columns round-trip the wire as WKT: multi-ring, nulls, no null vector") {
    import UpsertBatchWire._
    val donut = "POLYGON((-122.5 37.7, -122.4 37.7, -122.4 37.8, -122.5 37.7), " +
      "(-122.45 37.72, -122.42 37.72, -122.42 37.75, -122.45 37.72))"
    val tri = "POLYGON((0 0, 1 0, 1 1, 0 0))"
    val bytes = UpsertClient.encode(3, 1706659200L, Seq(
      (0, Int64, IndexedSeq(Some(1L), Some(2L), Some(3L))),
      (1, GeoShape, IndexedSeq(Some(donut), None, Some(tri)))))
    val batch = UpsertBatchWire.decode(bytes)
    assert(batch.columns(1).values(1).isEmpty)
    // float32 round trip: re-encoding the decoded WKT is byte-identical
    val d0 = batch.columns(1).values(0).get.asInstanceOf[String]
    val d2 = batch.columns(1).values(2).get.asInstanceOf[String]
    assert(d0.startsWith("POLYGON((") && d0.count(_ == '(') == 3, d0)
    assert(d2 == "POLYGON((0 0, 1 0, 1 1, 0 0))", d2)
    val bytes2 = UpsertClient.encode(3, 1706659200L, Seq(
      (0, Int64, IndexedSeq(Some(1L), Some(2L), Some(3L))),
      (1, GeoShape, IndexedSeq(Some(d0), None, Some(d2)))))
    assert(java.util.Arrays.equals(bytes, bytes2),
      "decoded WKT must re-encode to the identical wire bytes")

    // end to end: a schema-store table with a GeoShape column ingests the
    // binary batch and serves the WKT text back
    val create = post("/schema/tables", """{
      "name": "client_shapes", "isFactTable": true,
      "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "zone_id", "type": "Int64"},
        {"name": "shape", "type": "GeoShape"}
      ],
      "primaryKeyColumns": [1]
    }""")
    assert(create.statusCode() == 200, create.body())
    val inserted = client.insert("client_shapes",
      Seq("request_at", "zone_id", "shape"),
      Seq(
        Seq(1706572800L, 1L, tri),
        Seq(1706572860L, 2L, null),
        Seq(1706572920L, 3L, donut)))
    assert(inserted == 3L)
    val q = post("/query/aql", """{"queries": [{"table": "client_shapes",
      "measures": [{"alias": "n", "sqlExpression": "count(*)"}],
      "rowFilters": ["shape IS NOT NULL"],
      "timeFilter": {"from": "1706400000"}, "now": 1706659200}]}""")
    assert(q.statusCode() == 200, q.body())
    val n = (JsonMethods.parse(q.body()) \ "results")(0).asInstanceOf[JObject].values
    assert(n("n") == 2.0, q.body())
  }

  test("encoder output decodes bit-exactly through the server-side reader") {
    val bytes = UpsertClient.encode(3, 1706659200L, Seq(
      (0, UpsertBatchWire.Uint32, IndexedSeq(Some(1L), Some(2L), Some(3L))),
      (1, UpsertBatchWire.Int64, IndexedSeq(Some(-7L), None, Some(9L))),
      (2, UpsertBatchWire.Bool, IndexedSeq(Some(true), Some(false), Some(true))),
      (3, UpsertBatchWire.GeoPoint, IndexedSeq(Some((1.5f, -2.5f)), None, None)),
      (4, UpsertBatchWire.BigEnum, IndexedSeq(None, None, None))))
    val batch = UpsertBatchWire.decode(bytes)
    assert(batch.numRows == 3)
    assert(batch.columns.map(_.columnId) == Seq(0, 1, 2, 3, 4))
    assert(batch.columns(0).values == IndexedSeq(Some(1L), Some(2L), Some(3L)))
    assert(batch.columns(1).values == IndexedSeq(Some(-7L), None, Some(9L)))
    assert(batch.columns(2).values == IndexedSeq(Some(true), Some(false), Some(true)))
    assert(batch.columns(3).values == IndexedSeq(Some((1.5f, -2.5f)), None, None))
    assert(batch.columns(4).values == IndexedSeq(None, None, None))
  }
}
