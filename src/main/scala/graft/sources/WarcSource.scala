package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC / WET crawl-archive reader — the ingestion format of a real
  * 100 TB pretraining corpus (Common Crawl ships ~64k gzipped WARC files
  * of ~1 GB per crawl; its WET sibling carries extracted plain text in
  * the same record framing).
  *
  * Scale design: the FILE is the unit of parallelism — exactly how the
  * corpus arrives (tens of thousands of ~1 GB members), so a directory
  * glob fans out one task per file with no shuffle at all. Records are
  * parsed STREAMING off a `PortableDataStream` (this is the one place the
  * RDD API is the right tool: per-partition imperative byte parsing with
  * no Catalyst equivalent, and it never materializes a whole archive
  * member in memory the way `binaryFile`'s content column would at 1 GB
  * per row). Gzip is detected per file by magic bytes; WARC members are
  * multi-member gzip streams (one member per record) which
  * `GZIPInputStream` concatenates transparently.
  *
  * Everything downstream is a DataFrame: `readWarc` returns typed record
  * rows, `warcToDocuments` projects the `documents`-table shape so the
  * whole curation stack (dedup, quality, packing) runs unchanged on
  * crawl input.
  */
object WarcSource {

  /** One row per WARC record. `content` is the raw payload (binary);
    * decode to text with `contentText` only for text-bearing types.
    */
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Read every record of every WARC/WET file matched by `path` (a file,
    * directory, or glob — Hadoop semantics). `maxRecordBytes` bounds one
    * record's payload so a malformed Content-Length cannot OOM an
    * executor; oversized records fail loudly with the file name.
    */
  def readWarc(spark: SparkSession, path: String,
      maxRecordBytes: Long = 1L << 30,
      minPartitions: Int = 0): DataFrame = {
    require(maxRecordBytes > 0 && maxRecordBytes <= Int.MaxValue,
      s"maxRecordBytes $maxRecordBytes must be in (0, Int.MaxValue]")
    val parts =
      if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val rows = spark.sparkContext.binaryFiles(path, parts)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        val in = if (isGzip(raw)) new BufferedInputStream(
          new GZIPInputStream(raw, 1 << 16), 1 << 16) else raw
        recordIterator(file, new DataInputStream(in), maxRecordBytes)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Project WARC rows into the `documents` table shape (doc_id, url,
    * ts, text) so crawl input drops straight into the curation operators.
    * Only text-bearing records survive: WET `conversion` records and
    * WARC `response` records whose Content-Type is textual. doc_id is a
    * deterministic 63-bit hash of the record id (stable across runs and
    * engines — xxhash64 masked non-negative).
    *
    * `extractHtml = true` additionally runs raw `response` text/html
    * payloads through [[graft.operators.Curation.htmlToText]] — the
    * markup-to-text projection a raw-crawl (non-WET) pipeline needs
    * before any token-level operator; WET `conversion` records and
    * non-HTML textual responses (text/plain etc.) pass through
    * untouched. Map-side, codegen'd — the projection adds no shuffle.
    */
  def warcToDocuments(warc: DataFrame, extractHtml: Boolean = false): DataFrame = {
    val textual = warc.filter(
      col("record_type") === "conversion" ||
        (col("record_type") === "response" &&
          col("content_type").startsWith("text/")))
    val raw = decode(col("content"), "UTF-8")
    val text =
      if (!extractHtml) raw
      else when(col("record_type") === "response" &&
          col("content_type").startsWith("text/html"),
        graft.operators.Curation.htmlToText(raw)).otherwise(raw)
    textual.select(
      (xxhash64(col("record_id")).bitwiseAND(lit(Long.MaxValue))).as("doc_id"),
      col("target_uri").as("url"),
      to_timestamp(col("warc_date")).as("ts"),
      text.as("text"))
  }

  /** Peek 2 bytes for the gzip magic without consuming them. */
  private def isGzip(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    b0 == 0x1f && b1 == 0x8b
  }

  /** Streaming record parser: WARC framing is
    * `WARC/1.x\r\n` header lines `\r\n` blank `\r\n` payload
    * (Content-Length bytes) `\r\n\r\n`. Tolerates leading blank lines
    * between records and stops cleanly at EOF; a torn final record
    * (truncated payload) is dropped with the clean prefix kept — the
    * same torn-tail discipline as the upsert journal replay.
    */
  private def recordIterator(file: String, in: DataInputStream,
      maxRecordBytes: Long): Iterator[Row] = new Iterator[Row] {
    private var nextRow: Row = null
    private var done = false

    private def readLine(): String = {
      // WARC header lines are ASCII; CRLF-terminated. Bounded: a
      // malformed member with no newlines must fail loudly, not buffer
      // the whole (possibly 1 GB) stream into one line.
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      if (c < 0) throw new EOFException()
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        if (sb.length > 64 * 1024)
          throw new IllegalArgumentException(
            s"$file: header line exceeds 64 KiB — not WARC framing")
        c = in.read()
      }
      sb.toString
    }

    private def advance(): Unit = {
      if (done) return
      try {
        // skip inter-record blank lines; find the version line
        var line = readLine()
        while (line.isEmpty) line = readLine()
        if (!line.startsWith("WARC/"))
          throw new IllegalArgumentException(
            s"$file: expected WARC version line, got '${line.take(40)}'")
        var recordType: String = null
        var recordId: String = null
        var uri: String = null
        var date: String = null
        var contentType: String = null
        var contentLength = -1L
        var h = readLine()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) {
            val k = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
            val v = h.substring(i + 1).trim
            k match {
              case "warc-type" => recordType = v
              case "warc-record-id" => recordId = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "content-type" => contentType = v
              case "content-length" => contentLength = v.toLong
              case _ =>
            }
          }
          h = readLine()
        }
        if (contentLength < 0)
          throw new IllegalArgumentException(s"$file: record missing Content-Length")
        if (contentLength > maxRecordBytes)
          throw new IllegalArgumentException(
            s"$file: record payload $contentLength exceeds maxRecordBytes $maxRecordBytes")
        val payload = new Array[Byte](contentLength.toInt)
        in.readFully(payload)
        nextRow = Row(file, recordType, recordId, uri, date, contentType,
          contentLength, payload)
      } catch {
        case _: EOFException => done = true; close()
        case e: Throwable => close(); throw e
      }
    }

    private def close(): Unit = try in.close() catch { case _: Throwable => }

    override def hasNext: Boolean = {
      if (nextRow == null && !done) advance()
      nextRow != null
    }
    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRow; nextRow = null; r
    }
  }
}
