package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC/WET parsing against fixtures the spec writes itself (the WARC
  * framing is public: version line, CRLF headers, blank line,
  * Content-Length payload, double CRLF terminator; CC-style gzip is one
  * gzip member per record, concatenated).
  */
class WarcSourceSpec extends SparkSpec {

  private def record(recType: String, id: String, uri: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $recType\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$id>\r\n"
    if (uri != null) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2024-03-01T12:00:00Z\r\n"
    if (contentType != null) h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    val out = new ByteArrayOutputStream()
    out.write(h.toString.getBytes(UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private val records = Seq(
    record("warcinfo", "info-1", null, "application/warc-fields",
      "software: graft-spec\r\n".getBytes(UTF_8)),
    record("response", "resp-1", "https://example.com/a", "text/html",
      "<html><body>hello warc</body></html>".getBytes(UTF_8)),
    record("response", "resp-2", "https://example.com/img", "image/png",
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3)),
    record("conversion", "wet-1", "https://example.com/a", "text/plain",
      "hello warc extracted text".getBytes(UTF_8)))

  private def writePlain(dir: String): String = {
    val f = s"$dir/sample.warc"
    val out = new FileOutputStream(f)
    records.foreach(out.write)
    out.close()
    f
  }

  private def writeGz(dir: String): String = {
    // CC-style: one gzip member PER RECORD, members concatenated
    val f = s"$dir/sample.warc.gz"
    val out = new FileOutputStream(f)
    records.foreach { r =>
      val buf = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(buf)
      g.write(r); g.close()
      out.write(buf.toByteArray)
    }
    out.close()
    f
  }

  test("plain and multi-member-gzip WARC parse identically") {
    val dir = Files.createTempDirectory("warc").toString
    writePlain(dir); writeGz(dir)
    val df = WarcSource.readWarc(spark, dir)
    assert(df.count() == 8) // 4 records × 2 files
    val byType = df.groupBy("record_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("warcinfo" -> 2, "response" -> 4, "conversion" -> 2))
    // field fidelity incl. binary payload integrity
    val img = df.filter(col("record_id") === "<urn:uuid:resp-2>")
      .select("content_type", "content_length", "content").collect()
    assert(img.length == 2)
    img.foreach { r =>
      assert(r.getString(0) == "image/png")
      assert(r.getLong(1) == 8L)
      assert(r.getAs[Array[Byte]](2).toSeq ==
        Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0, 1, 2, 3).map(_.toByte))
    }
    // gzip and plain decode byte-identically
    val texts = df.filter(col("record_id") === "<urn:uuid:wet-1>")
      .select(decode(col("content"), "UTF-8")).collect().map(_.getString(0))
    assert(texts.toSeq == Seq.fill(2)("hello warc extracted text"))
  }

  test("warcToDocuments keeps text-bearing records with stable ids") {
    val dir = Files.createTempDirectory("warcdoc").toString
    writePlain(dir)
    val docs = WarcSource.warcToDocuments(WarcSource.readWarc(spark, dir))
    val rows = docs.orderBy("url", "text").collect()
    // resp-1 (text/html) + wet-1 (conversion) survive; warcinfo and the
    // image response are dropped
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("url") == "https://example.com/a"))
    assert(rows.map(_.getAs[String]("text")).toSet ==
      Set("<html><body>hello warc</body></html>", "hello warc extracted text"))
    assert(rows.forall(_.getAs[Long]("doc_id") >= 0L))
    assert(rows.forall(_.getAs[java.sql.Timestamp]("ts") != null))
    // determinism: re-read gives the same ids
    val again = WarcSource.warcToDocuments(WarcSource.readWarc(spark, dir))
      .orderBy("url", "text").collect().map(_.getAs[Long]("doc_id"))
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == again.toSeq)
  }

  test("warcToDocuments extractHtml strips markup from html responses only") {
    val dir = Files.createTempDirectory("warchtml").toString
    writePlain(dir)
    val docs = WarcSource.warcToDocuments(WarcSource.readWarc(spark, dir),
      extractHtml = true)
    val byText = docs.orderBy("text").collect().map(_.getAs[String]("text"))
    // the html response is projected to text; the WET conversion record
    // passes through byte-identical
    assert(byText.toSet == Set("hello warc", "hello warc extracted text"),
      byText.mkString("|"))
  }

  test("torn tail: truncated final record drops, clean prefix kept") {
    val dir = Files.createTempDirectory("warctorn").toString
    val full = records.flatMap(_.toSeq).toArray
    val torn = full.dropRight(30) // cuts into wet-1's payload/terminator
    val out = new FileOutputStream(s"$dir/torn.warc")
    out.write(torn); out.close()
    val df = WarcSource.readWarc(spark, dir)
    assert(df.count() == 3)
    assert(df.filter(col("record_id") === "<urn:uuid:wet-1>").count() == 0)
  }

  test("newline-free garbage fails loudly instead of buffering the file") {
    val dir = Files.createTempDirectory("warcgarbage").toString
    val out = new FileOutputStream(s"$dir/garbage.warc")
    out.write("WARC/1.0\r\n".getBytes(UTF_8))
    val junk = new Array[Byte](200 * 1024)
    java.util.Arrays.fill(junk, 'x'.toByte)
    out.write(junk); out.close()
    val e = intercept[org.apache.spark.SparkException] {
      WarcSource.readWarc(spark, dir).count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("64 KiB"))
  }

  test("oversized Content-Length fails loudly with the file name") {
    val dir = Files.createTempDirectory("warcbig").toString
    writePlain(dir)
    val e = intercept[org.apache.spark.SparkException] {
      WarcSource.readWarc(spark, dir, maxRecordBytes = 10).count()
    }
    assert(e.getMessage.contains("maxRecordBytes") ||
      e.getCause != null && e.getCause.getMessage.contains("maxRecordBytes"))
  }
}
