package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.aql.{Catalog, TableDef}
import graft.exec.QueryService
import graft.ingest.Upsert

/** HTTP facade over the engine — the reference's API surface
  * (/root/reference/api/query_handler.go:67-68, data_handler.go:47-50,
  * schema_handler.go:47-60) on the JDK's built-in HTTP server:
  *
  *   - `POST /query/aql`  AQLRequest JSON → AQLResponse JSON;
  *     `Accept: application/hll` returns the binary HLL body for the
  *     first query
  *   - `POST /query/sql`  {"queries": ["SELECT ..."]} → AQLResponse JSON
  *   - `POST /data/{table}`  JSON array of row objects → PK upsert into
  *     the table's LIVE overlay; ingested rows are visible to queries
  *     immediately (the reference's live-batch freshness,
  *     memstore/ingestion.go:25-76)
  *   - `GET /schema/tables` and `GET /schema/tables/{t}` → table metadata
  *
  * The live overlay holds the upserted view per table in memory (cached),
  * seeded from the catalog's parquet loader — the Spark analogue of live
  * batches layered over archive batches. Archiving the overlay back to
  * day-partitioned parquet is [[graft.ingest.Archiver]]'s job.
  */
final class GraftServer(baseCatalog: Catalog, spark: SparkSession, port: Int = 0) {

  private val live = TrieMap.empty[String, DataFrame]
  private val seqCounter = new AtomicLong(0)

  /** Catalog whose loaders read through the live overlay. */
  private val catalog: Catalog = Catalog(
    baseCatalog.tables.map { case (name, td) =>
      name -> td.copy(load = s => live.getOrElse(name, td.load(s)))
    },
    baseCatalog.timezoneTable)

  private val service = new QueryService(catalog, spark)
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  server.createContext("/query/aql", (ex: HttpExchange) => handle(ex) {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
    if (accept == "application/hll") {
      val first = graft.aql.AqlJson.parseRequest(body).queries.head
      val bin = service.aqlBinary(write(first))
      respondBytes(ex, 200, "application/hll", bin)
    } else {
      respond(ex, 200, service.aql(body))
    }
  })

  server.createContext("/query/sql", (ex: HttpExchange) => handle(ex) {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    respond(ex, 200, service.sql(body))
  })

  server.createContext("/data/", (ex: HttpExchange) => handle(ex) {
    val table = ex.getRequestURI.getPath.stripPrefix("/data/").takeWhile(_ != '/')
    val td = catalog(table)
    if (td.primaryKey.isEmpty)
      throw new IllegalArgumentException(s"table $table has no primary key")
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val n = ingest(td, body)
    respond(ex, 200, s"""{"rowsInserted":$n}""")
  })

  server.createContext("/schema/tables", (ex: HttpExchange) => handle(ex) {
    val rest = ex.getRequestURI.getPath.stripPrefix("/schema/tables")
      .stripPrefix("/")
    if (rest.isEmpty) {
      val names = JArray(catalog.tables.keys.toList.sorted.map(JString(_)))
      respond(ex, 200, JsonMethods.compact(JsonMethods.render(names)))
    } else {
      val td = catalog(rest)
      val schema = td.load(spark).schema
      val body = JObject(
        "name" -> JString(td.name),
        "isFactTable" -> JBool(td.isFact),
        "timeColumn" -> td.timeColumn.map(JString(_)).getOrElse(JNull),
        "primaryKeyColumns" -> JArray(td.primaryKey.map(JString(_)).toList),
        "columns" -> JArray(schema.fields.map(f => JObject(
          "name" -> JString(f.name),
          "type" -> JString(f.dataType.simpleString))).toList))
      respond(ex, 200, JsonMethods.compact(JsonMethods.render(body)))
    }
  })

  /** JSON array of row objects → PK upsert into the live overlay. */
  private def ingest(td: TableDef, jsonBody: String): Long = {
    import spark.implicits._
    val rows = JsonMethods.parse(jsonBody) match {
      case JArray(objs) => objs.map(o => JsonMethods.compact(JsonMethods.render(o)))
      case other => throw new IllegalArgumentException("expected a JSON array of rows")
    }
    val current = live.getOrElse(td.name, td.load(spark))
    // arrival order within the batch: later record wins (ingestion.go:172+);
    // single-partition read makes monotonically_increasing_id the row order
    val seq0 = seqCounter.getAndAdd(rows.length)
    val withSeq = spark.read.schema(current.schema)
      .json(rows.toDS().coalesce(1))
      .withColumn("__seq", monotonically_increasing_id() + seq0)
    val updated = Upsert(current, withSeq, td.primaryKey, "__seq")
      .localCheckpoint(true) // pin the view; breaks unbounded lineage growth
    live.put(td.name, updated)
    rows.length
  }

  private def write(q: graft.aql.AqlQuery): String = {
    implicit val formats: Formats = DefaultFormats
    org.json4s.jackson.Serialization.write(q)
  }

  private def handle(ex: HttpExchange)(f: => Unit): Unit =
    try f
    catch {
      case NonFatal(e) =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        respond(ex, 400, JsonMethods.compact(JsonMethods.render(
          JObject("error" -> JString(msg)))))
    } finally ex.close()

  private def respond(ex: HttpExchange, code: Int, body: String): Unit =
    respondBytes(ex, code, "application/json", body.getBytes(StandardCharsets.UTF_8))

  private def respondBytes(ex: HttpExchange, code: Int, contentType: String,
      body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, body.length)
    ex.getResponseBody.write(body)
  }

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort
}
