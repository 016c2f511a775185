package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec
import graft.aql.Catalog
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Reference-wire binary ingestion + the operational endpoints.
  *
  * The test synthesizes an upsert batch in the REFERENCE's serialized
  * layout (upsert_batch.go:119-148) with its own writer — an independent
  * encoder validating the main-side decoder — POSTs it as
  * `application/upsert-data`, and queries the ingested rows back through
  * the AQL endpoint.
  */
class UpsertWireSpec extends SparkSpec {

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

  private def postBytes(path: String, body: Array[Byte], contentType: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .header("Content-Type", contentType)
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String) =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  // ---- test-side encoder for the reference layout --------------------------

  private def align(v: Int, to: Int): Int = (v + to - 1) / to * to

  /** (columnId, dataType, per-row values; None = null) → serialized batch. */
  private def encodeBatch(numRows: Int,
      cols: Seq[(Int, Int, Seq[Option[Any]])]): Array[Byte] = {
    val n = cols.length
    val headerSize = (n + 1) * 4 + n * 4 + n * 4 + n * 4 + n * 2 + n
    def valueBytes(tpe: Int): Int =
      if (tpe == UpsertBatchWire.Bool) align(numRows, 8) / 8
      else numRows * ((tpe & 0xFFFF) / 8)
    // lay out the column data region
    var cur = align(28 + headerSize, 8)
    val starts = new Array[Int](n + 1)
    val layouts = cols.zipWithIndex.map { case ((_, tpe, values), i) =>
      starts(i) = cur
      val mode = if (values.forall(_.isEmpty)) 0 else if (values.exists(_.isEmpty)) 2 else 1
      val nullBase = if (mode == 2) { val b = cur; cur += align(numRows, 8) / 8; Some(b) } else None
      val valueBase = if (mode == 0) None else { cur = align(cur, 8); val b = cur; cur += valueBytes(tpe); Some(b) }
      (mode, nullBase, valueBase)
    }
    starts(n) = cur
    val buf = ByteBuffer.allocate(cur).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, UpsertBatchWire.VersionV1)
    buf.putInt(4, numRows)
    buf.putShort(8, n.toShort)
    buf.putInt(24, 1706659200) // arrival time
    val offsetsBase = 28
    val typesBase = offsetsBase + (n + 1) * 4 + n * 4 + n * 4
    val idsBase = typesBase + n * 4
    val modesBase = idsBase + n * 2
    (0 to n).foreach(i => buf.putInt(offsetsBase + i * 4, starts(i)))
    cols.zipWithIndex.foreach { case ((id, tpe, values), i) =>
      buf.putInt(typesBase + i * 4, tpe)
      buf.putShort(idsBase + i * 2, id.toShort)
      buf.put(modesBase + i, layouts(i)._1.toByte)
      val (_, nullBase, valueBase) = layouts(i)
      values.zipWithIndex.foreach { case (v, row) =>
        nullBase.foreach { nb =>
          if (v.isDefined) {
            val pos = nb + row / 8
            buf.put(pos, (buf.get(pos) | (1 << (row % 8))).toByte)
          }
        }
        (v, valueBase) match {
          case (Some(x), Some(vb)) => tpe match {
            case UpsertBatchWire.Uint32 | UpsertBatchWire.Int32 =>
              buf.putInt(vb + row * 4, x.asInstanceOf[Long].toInt)
            case UpsertBatchWire.Int64 =>
              buf.putLong(vb + row * 8, x.asInstanceOf[Long])
            case UpsertBatchWire.Float32 =>
              buf.putFloat(vb + row * 4, x.asInstanceOf[Float])
            case UpsertBatchWire.SmallEnum =>
              buf.put(vb + row, x.asInstanceOf[Long].toByte)
            case UpsertBatchWire.Bool =>
              if (x.asInstanceOf[Boolean]) {
                val pos = vb + row / 8
                buf.put(pos, (buf.get(pos) | (1 << (row % 8))).toByte)
              }
            case other => fail(f"encoder: unhandled type 0x$other%08x")
          }
          case _ => ()
        }
      }
    }
    buf.array()
  }

  test("binary upsert batch ingests through /data and queries back") {
    val create = post("/schema/tables", """{
      "name": "wire_rides", "isFactTable": true,
      "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "ride_id", "type": "Int64"},
        {"name": "city", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"}
      ],
      "primaryKeyColumns": [1]
    }""")
    assert(create.statusCode() == 200, create.body())
    assert(post("/schema/tables/wire_rides/columns/city/enum-cases",
      """{"enumCases": ["sf", "nyc"]}""").statusCode() == 200)

    // 3 rows; fare has a null (mode-2 column with a null vector); city
    // arrives as dictionary indexes, the decoder resolves the strings
    val batch = encodeBatch(3, Seq(
      (0, UpsertBatchWire.Uint32, Seq(Some(1706572800L), Some(1706572860L), Some(1706572920L))),
      (1, UpsertBatchWire.Int64, Seq(Some(11L), Some(12L), Some(13L))),
      (2, UpsertBatchWire.SmallEnum, Seq(Some(0L), Some(1L), Some(0L))),
      (3, UpsertBatchWire.Float32, Seq(Some(10.5f), None, Some(4.5f)))))
    val resp = postBytes("/data/wire_rides", batch, "application/upsert-data")
    assert(resp.statusCode() == 200, resp.body())
    assert(resp.body().contains("\"rowsInserted\":3"))

    val q = post("/query/aql", """{"queries": [{"table": "wire_rides",
      "measures": [{"alias": "total_fare", "sqlExpression": "sum(fare)"}],
      "dimensions": [{"alias": "city", "sqlExpression": "city"}],
      "timeFilter": {"from": "1706400000"}, "now": 1706659200}]}""")
    assert(q.statusCode() == 200, q.body())
    val result = (JsonMethods.parse(q.body()) \ "results")(0).asInstanceOf[JObject].values
    // sf: 10.5 + 4.5; nyc: null fare sums to null -> rendered as null/absent
    assert(result("sf") == 15.0, result)
  }

  test("binary batch without the content type is sniffed by its version word") {
    val batch = encodeBatch(1, Seq(
      (0, UpsertBatchWire.Uint32, Seq(Some(1706573000L))),
      (1, UpsertBatchWire.Int64, Seq(Some(14L))),
      (2, UpsertBatchWire.SmallEnum, Seq(Some(1L))),
      (3, UpsertBatchWire.Float32, Seq(Some(1.25f)))))
    val resp = postBytes("/data/wire_rides", batch, "application/octet-stream")
    assert(resp.statusCode() == 200, resp.body())
    assert(resp.body().contains("\"rowsInserted\":1"))
  }

  test("enum wire column against a table without a dictionary is rejected, not nulled") {
    // `documents` lives in the base catalog, not the schema store — an
    // enum wire column has no dictionary there and must fail loudly
    // (silently decoding every value to null corrupts the batch)
    val batch = encodeBatch(1, Seq(
      (0, UpsertBatchWire.Int64, Seq(Some(999999L))),
      (1, UpsertBatchWire.SmallEnum, Seq(Some(0L)))))
    val resp = postBytes("/data/documents", batch, "application/upsert-data")
    assert(resp.statusCode() == 400, s"${resp.statusCode()}: ${resp.body()}")
    assert(resp.body().contains("enum dictionary"), resp.body())
  }

  test("truncated batch fails with a layout error, not an index exception") {
    val full = encodeBatch(2, Seq(
      (0, UpsertBatchWire.Uint32, Seq(Some(1706573000L), Some(1706573060L))),
      (1, UpsertBatchWire.Int64, Seq(Some(21L), Some(22L)))))
    val truncated = java.util.Arrays.copyOf(full, full.length - 8)
    val err = intercept[IllegalArgumentException] {
      UpsertBatchWire.decode(truncated)
    }
    assert(err.getMessage.contains("truncated or malformed"), err.getMessage)
    // and over HTTP it surfaces as a 400 with the descriptive message
    val resp = postBytes("/data/wire_rides", truncated, "application/upsert-data")
    assert(resp.statusCode() == 400, s"${resp.statusCode()}: ${resp.body()}")
    assert(resp.body().contains("truncated or malformed"), resp.body())
  }

  test("GET /metrics reports per-query wall time and rows scanned") {
    val q = post("/query/aql", """{"queries": [{"table": "documents",
      "measures": [{"alias": "n", "sqlExpression": "count(*)"}]}]}""")
    assert(q.statusCode() == 200)
    val m = get("/metrics")
    assert(m.statusCode() == 200, m.body())
    val parsed = JsonMethods.parse(m.body())
    implicit val fmts: Formats = DefaultFormats
    assert((parsed \ "queries").extract[Long] >= 1L)
    val recent = (parsed \ "recent").asInstanceOf[JArray].arr
    assert(recent.nonEmpty)
    val docStat = recent.reverse.find(s =>
      (s \ "table").extract[String] == "documents").get
    assert((docStat \ "rowsScanned").extract[Long] > 0L, m.body())
    assert((docStat \ "wallMs").extract[Long] >= 0L)
  }

  test("GET /ui serves the debug console over the data endpoints") {
    val resp = get("/ui")
    assert(resp.statusCode() == 200, resp.body().take(200))
    assert(resp.body().contains("graft console"))
    // the console drives exactly the endpoints that exist
    assert(resp.body().contains("/metrics"))
    assert(resp.body().contains("/dbg/plan"))
    assert(resp.body().contains("/schema/tables"))
  }

  test("GET /dbg/plan returns the formatted physical plan, unexecuted") {
    val aql = java.net.URLEncoder.encode(
      """{"table": "documents",
         "measures": [{"alias": "n", "sqlExpression": "count(*)"}],
         "dimensions": [{"alias": "lang", "sqlExpression": "lang"}]}""", "UTF-8")
    val resp = get(s"/dbg/plan?query=$aql")
    assert(resp.statusCode() == 200, resp.body())
    assert(resp.body().contains("Physical Plan"), resp.body().take(500))
    assert(resp.body().contains("HashAggregate"), resp.body().take(2000))
  }
}
