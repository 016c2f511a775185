package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Client-side connector for the reference's binary ingestion wire — the
  * publishing half of [[UpsertBatchWire]] (the server accepts this layout
  * at `POST /data/{table}`). Mirrors the reference connector's Insert flow
  * (/root/reference/client/connector.go:148-190):
  *
  *   1. fetch the table schema and resolve column names → (id, type);
  *   2. validate the primary key columns and (for fact tables) the event
  *      time column are present (connector.go:254-295);
  *   3. resolve enum strings against the column dictionaries, POSTing
  *      unseen cases first (prepareEnumCases — dictionary auto-expansion
  *      is the CLIENT's job on this wire; the batch carries indexes);
  *   4. serialize the reference layout (upsert_batch.go:119-148: version
  *      word, row/col counts, offsets/types/ids/modes headers, 8-byte
  *      aligned null/value vectors) and POST `application/upsert-data`.
  *
  * Value types accepted per wire type: integral (Int/Long) for the int
  * widths, Float/Double for Float32, Boolean for Bool, String for
  * SmallEnum/BigEnum (dictionary-resolved) and UUID
  * ("xxxxxxxx-xxxx-xxxx-xxxx-xxxxxxxxxxxx"), (Float, Float) for GeoPoint.
  * `null` (or None) writes a null; a column of all nulls ships as mode 0.
  */
final class UpsertClient(baseUrl: String) {
  import UpsertBatchWire._

  private val http = HttpClient.newHttpClient()
  private implicit val formats: Formats = DefaultFormats

  private def getJson(path: String): JValue = {
    val resp = http.send(HttpRequest.newBuilder(URI.create(baseUrl + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"GET $path -> ${resp.statusCode()}: ${resp.body().take(200)}")
    JsonMethods.parse(resp.body())
  }

  private def postJson(path: String, body: String): JValue = {
    val resp = http.send(HttpRequest.newBuilder(URI.create(baseUrl + path))
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"POST $path -> ${resp.statusCode()}: ${resp.body().take(200)}")
    JsonMethods.parse(resp.body())
  }

  private val wireTypes: Map[String, Int] = Map(
    "Bool" -> Bool, "Int8" -> Int8, "Uint8" -> Uint8, "Int16" -> Int16,
    "Uint16" -> Uint16, "Int32" -> Int32, "Uint32" -> Uint32,
    "Float32" -> Float32, "SmallEnum" -> SmallEnum, "BigEnum" -> BigEnum,
    "UUID" -> Uuid, "GeoPoint" -> GeoPoint, "GeoShape" -> GeoShape,
    "Int64" -> Int64)

  /** Insert `rows` (each aligned with `columnNames`) into `table`.
    * Returns the server-reported inserted row count.
    */
  def insert(table: String, columnNames: Seq[String], rows: Seq[Seq[Any]],
      arrivalTime: Long = System.currentTimeMillis() / 1000): Long = {
    require(columnNames.nonEmpty, "no column names specified")
    if (rows.isEmpty) return 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.length == columnNames.length,
        s"row $i has ${r.length} values for ${columnNames.length} columns")
    }

    // ---- schema: name -> (columnId, wire type) ---------------------------
    val schema = getJson(s"/schema/tables/$table")
    val cols = (schema \ "columns").extract[List[JValue]].zipWithIndex.map {
      case (c, id) => ((c \ "name").extract[String], id, (c \ "type").extract[String])
    }
    val byName = cols.map { case (n, id, t) => n -> ((id, t)) }.toMap
    def wireType(n: String, t: String): Int =
      if (t.endsWith("[]"))
        wireTypes.get(t.dropRight(2)).map(_ | ArrayBit).getOrElse(
          throw new IllegalArgumentException(s"column $n has unsupported type $t"))
      else wireTypes.getOrElse(t,
        throw new IllegalArgumentException(s"column $n has unsupported type $t"))
    val resolved = columnNames.map { n =>
      val (id, t) = byName.getOrElse(n,
        throw new IllegalArgumentException(s"column $n not in $table's schema"))
      (n, id, wireType(n, t))
    }

    // ---- presence checks (connector.go checkPrimaryKeys / time column) ---
    val pkIds = (schema \ "primaryKeyColumns").extract[List[Int]]
    pkIds.foreach { id =>
      val pkName = cols.find(_._2 == id).map(_._1).getOrElse(s"#$id")
      require(columnNames.contains(pkName), s"missing primary key column $pkName")
    }
    if ((schema \ "isFactTable").extract[Boolean])
      require(resolved.exists(_._2 == 0),
        "missing time column (fact-table column 0 must be present)")

    // ---- enum dictionaries: auto-expand then index -----------------------
    val dicts: Map[Int, Map[String, Long]] = resolved.zipWithIndex.collect {
      case ((name, _, t), colIdx)
          if elementType(t) == SmallEnum || elementType(t) == BigEnum =>
        // unwrap Option-wrapped values the same way toWireValue does, or
        // Some("case") would skip auto-expansion and silently write null;
        // enum-array columns contribute every element string
        def strings(v: Any): Seq[String] = v match {
          case s: String => Seq(s)
          case Some(x) => strings(x)
          case xs: scala.collection.Seq[_] => xs.flatMap(strings).toSeq
          case xs: Array[_] => xs.toSeq.flatMap(strings)
          case _ => Nil
        }
        val seen = rows.flatMap(r => strings(r(colIdx))).distinct
        val existing = getJson(s"/schema/tables/$table/columns/$name/enum-cases")
          .extract[List[String]]
        val unseen = seen.filterNot(existing.toSet)
        if (unseen.nonEmpty)
          postJson(s"/schema/tables/$table/columns/$name/enum-cases",
            JsonMethods.compact(JsonMethods.render(
              JObject("enumCases" -> JArray(unseen.map(JString(_)).toList)))))
        val current = getJson(s"/schema/tables/$table/columns/$name/enum-cases")
          .extract[List[String]]
        colIdx -> current.zipWithIndex.map { case (s, i) => s -> i.toLong }.toMap
    }.toMap

    // ---- serialize + POST ------------------------------------------------
    val columns = resolved.zipWithIndex.map { case ((_, id, t), colIdx) =>
      val values = rows.map(r => toWireValue(r(colIdx), t, dicts.get(colIdx))).toIndexedSeq
      (id, t, values)
    }
    val body = UpsertClient.encode(rows.length, arrivalTime, columns)
    val resp = http.send(HttpRequest.newBuilder(URI.create(s"$baseUrl/data/$table"))
      .header("Content-Type", "application/upsert-data")
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"POST /data/$table -> ${resp.statusCode()}: ${resp.body().take(200)}")
    (JsonMethods.parse(resp.body()) \ "rowsInserted").extract[Long]
  }

  /** Normalize a user value to the wire-writable form (None = null). An
    * enum string absent from the dictionary after expansion writes null —
    * the reference abandons such rows (connector.go prepareEnumCases).
    */
  private def toWireValue(v: Any, t: Int,
      dict: Option[Map[String, Long]]): Option[Any] = v match {
    case null | None => None
    case Some(x) => toWireValue(x, t, dict)
    case s: String if t == SmallEnum || t == BigEnum =>
      dict.flatMap(_.get(s))
    case xs if isArrayType(t) =>
      // normalize each element through the scalar path (enum strings
      // resolve through the dictionary; unknown cases → null element)
      val elem = elementType(t)
      val seq: IndexedSeq[Any] = xs match {
        case s: scala.collection.Seq[_] => s.toIndexedSeq
        case a: Array[_] => a.toIndexedSeq
        case other => throw new IllegalArgumentException(
          s"expected a sequence for an array column, got ${other.getClass.getSimpleName}")
      }
      Some(seq.map(e => toWireValue(e, elem, dict)))
    case x => Some(x)
  }
}

object UpsertClient {
  import UpsertBatchWire._

  private def align(v: Int, to: Int): Int = (v + to - 1) / to * to

  /** Normalize one user-supplied array value into the element sequence
    * the writer consumes. Elements may be bare values, `null`, `None`,
    * or `Some(x)`.
    */
  private def arrayElems(v: Any): IndexedSeq[Option[Any]] = (v match {
    case s: scala.collection.Seq[_] => s.toIndexedSeq
    case a: Array[_] => a.toIndexedSeq
    case other => throw new IllegalArgumentException(
      s"expected a sequence for an array column, got ${other.getClass.getSimpleName}")
  }).map {
    case null | None => None
    case Some(x) => Some(x)
    case x => Some(x)
  }

  /** Serialize one batch in the reference layout
    * (upsert_batch.go:119-148; array columns :509-532 with per-value
    * layout data_value.go:615-728). Exposed for spec round-trips.
    */
  def encode(numRows: Int, arrivalTime: Long,
      cols0: Seq[(Int, Int, IndexedSeq[Option[Any]])]): Array[Byte] = {
    // normalize variable-length values ONCE per column: the layout pass
    // and the write pass both consume them, and WKT parsing / element
    // normalization are the expensive part of exactly the largest types
    val cols: Seq[(Int, Int, IndexedSeq[Option[Any]])] = cols0.map {
      case (id, tpe, values) if tpe == GeoShape =>
        (id, tpe, values.map(_.map(parseWkt)))
      case (id, tpe, values) if isArrayType(tpe) =>
        (id, tpe, values.map(_.map(arrayElems)))
      case other => other
    }
    val n = cols.length
    val headerSize = (n + 1) * 4 + n * 4 + n * 4 + n * 4 + n * 2 + n
    def valueBytes(tpe: Int): Int =
      if (tpe == Bool) align(numRows, 8) / 8
      else numRows * ((tpe & 0xFFFF) / 8)
    var cur = align(28 + headerSize, 8)
    val starts = new Array[Int](n + 1)
    val layouts = cols.zipWithIndex.map { case ((_, tpe, values), i) =>
      starts(i) = cur
      val mode = if (values.forall(_.isEmpty)) 0 else if (values.exists(_.isEmpty)) 2 else 1
      // Go-type columns (GeoShape) carry no null vector even in mode 2 —
      // nulls are in-band offset equality (upsert_batch_builder.go:120-123)
      val nullBase = if (mode == 2 && tpe != GeoShape) {
        val b = cur; cur += align(numRows, 8) / 8; Some(b)
      } else None
      val valueBase = if (mode == 0) None
      else if (tpe == GeoShape) {
        cur = align(cur, 4)
        val ob = cur
        cur += (numRows + 1) * 4
        cur = align(cur, 8)
        val vb = cur
        values.foreach(_.foreach(v =>
          cur += geoShapeSerBytes(v.asInstanceOf[Seq[IndexedSeq[(Float, Float)]]])))
        Some((ob, vb))
      }
      else if (isArrayType(tpe)) {
        // offset vector at 4-byte alignment, value vector at 8
        // (upsert_batch_builder.go:125-132)
        cur = align(cur, 4)
        val ob = cur
        cur += (numRows + 1) * 4
        cur = align(cur, 8)
        val vb = cur
        val elem = elementType(tpe)
        values.foreach(_.foreach(v =>
          cur += arraySerBytes(elem, v.asInstanceOf[IndexedSeq[Option[Any]]].length)))
        Some((ob, vb))
      } else { cur = align(cur, 8); val b = cur; cur += valueBytes(tpe); Some((-1, b)) }
      (mode, nullBase, valueBase)
    }
    starts(n) = cur
    val buf = ByteBuffer.allocate(cur).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, VersionV1)
    buf.putInt(4, numRows)
    buf.putShort(8, n.toShort)
    buf.putInt(24, arrivalTime.toInt)
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
      var arrOff = 0 // running local offset into an array column's value vector
      values.zipWithIndex.foreach { case (v, row) =>
        nullBase.foreach { nb =>
          if (v.isDefined) {
            val pos = nb + row / 8
            buf.put(pos, (buf.get(pos) | (1 << (row % 8))).toByte)
          }
        }
        (v, valueBase) match {
          case (_, Some((ob, vb))) if tpe == GeoShape =>
            buf.putInt(ob + row * 4, arrOff)
            v.foreach(x => arrOff += writeGeoShape(buf, vb + arrOff,
              x.asInstanceOf[Seq[IndexedSeq[(Float, Float)]]]))
          case (_, Some((ob, vb))) if isArrayType(tpe) =>
            buf.putInt(ob + row * 4, arrOff)
            v.foreach { x =>
              arrOff += writeArray(buf, vb + arrOff, elementType(tpe),
                x.asInstanceOf[IndexedSeq[Option[Any]]])
            }
          case (Some(x), Some((_, vb))) => writeValue(buf, vb, row, tpe, x)
          case _ => ()
        }
      }
      valueBase.foreach { case (ob, _) =>
        if (isArrayType(tpe) || tpe == GeoShape) buf.putInt(ob + numRows * 4, arrOff)
      }
    }
    buf.array()
  }

  /** WKT `POLYGON((lng lat, …), (…))` → rings of (lat, lng) float32 —
    * the reference's parse (data_type.go:484-515): case-insensitive,
    * lng-lat pair order, range-checked.
    */
  private def parseWkt(v: Any): Seq[IndexedSeq[(Float, Float)]] = {
    val s = v match {
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"expected WKT text for a GeoShape column, got ${other.getClass.getSimpleName}")
    }
    val trimmed = s.toLowerCase.dropWhile(c => "polygon( ".contains(c))
      .reverse.dropWhile(c => ") ".contains(c)).reverse
    trimmed.split("\\),\\s*\\(").toSeq.map { ring =>
      ring.split(",").toIndexedSeq.map { pair =>
        val lngLat = pair.trim.split("\\s+")
        require(lngLat.length == 2, s"invalid WKT point '$pair'")
        val lng = lngLat(0).toFloat
        val lat = lngLat(1).toFloat
        require(lng >= -180 && lng <= 180, s"longitude $lng out of range")
        require(lat >= -90 && lat <= 90, s"latitude $lat out of range")
        (lat, lng)
      }
    }
  }

  private def geoShapeSerBytes(polys: Seq[IndexedSeq[(Float, Float)]]): Int =
    4 + polys.map(p => 4 + p.length * 8).sum

  /** One GeoShape value at absolute `pos` (data_value.go:562-588):
    * uint32 polygon count, then per polygon uint32 point count and
    * (f32 lat, f32 lng) pairs. Returns the serialized size.
    */
  private def writeGeoShape(buf: ByteBuffer, pos: Int,
      polys: Seq[IndexedSeq[(Float, Float)]]): Int = {
    buf.putInt(pos, polys.length)
    var cur = pos + 4
    polys.foreach { p =>
      buf.putInt(cur, p.length)
      cur += 4
      p.foreach { case (lat, lng) =>
        buf.putFloat(cur, lat)
        buf.putFloat(cur + 4, lng)
        cur += 8
      }
    }
    cur - pos
  }

  /** One array value at absolute `pos` (data_value.go:615-728): uint32
    * count, packed items (null elements leave zero bytes), item validity
    * bits; returns the serialized byte size (8-byte multiple).
    */
  private def writeArray(buf: ByteBuffer, pos: Int, elemType: Int,
      elems: IndexedSeq[Option[Any]]): Int = {
    buf.putInt(pos, elems.length)
    if (elems.nonEmpty) {
      val itemsBase = pos + 4
      val validityBase = itemsBase + ((elemType & 0xFFFF) * elems.length + 7) / 8
      elems.zipWithIndex.foreach { case (e, i) =>
        e.foreach { x =>
          writeValue(buf, itemsBase, i, elemType, x)
          val vp = validityBase + i / 8
          buf.put(vp, (buf.get(vp) | (1 << (i % 8))).toByte)
        }
      }
    }
    UpsertBatchWire.arraySerBytes(elemType, elems.length)
  }

  private def asLong(x: Any): Long = x match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"expected an integral value, got ${other.getClass.getSimpleName}")
  }

  private def writeValue(buf: ByteBuffer, base: Int, row: Int, tpe: Int,
      x: Any): Unit = tpe match {
    case Bool =>
      if (x.asInstanceOf[Boolean]) {
        val pos = base + row / 8
        buf.put(pos, (buf.get(pos) | (1 << (row % 8))).toByte)
      }
    case Int8 | Uint8 | SmallEnum => buf.put(base + row, asLong(x).toByte)
    case Int16 | Uint16 | BigEnum => buf.putShort(base + row * 2, asLong(x).toShort)
    case Int32 | Uint32 => buf.putInt(base + row * 4, asLong(x).toInt)
    case Int64 => buf.putLong(base + row * 8, asLong(x))
    case Float32 => buf.putFloat(base + row * 4, x match {
      case f: Float => f
      case d: Double => d.toFloat
      case other => throw new IllegalArgumentException(
        s"expected a float value, got ${other.getClass.getSimpleName}")
    })
    case Uuid =>
      val hex = x.asInstanceOf[String].replace("-", "")
      require(hex.length == 32, s"UUID literal must be 32 hex chars, got $x")
      (0 until 16).foreach { i =>
        buf.put(base + row * 16 + i,
          Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16).toByte)
      }
    case GeoPoint =>
      val (lat, lng) = x match {
        case (a: Float, b: Float) => (a, b)
        case (a: Double, b: Double) => (a.toFloat, b.toFloat)
        case other => throw new IllegalArgumentException(
          s"expected (lat, lng), got $other")
      }
      buf.putFloat(base + row * 8, lat)
      buf.putFloat(base + row * 8 + 4, lng)
    case other =>
      throw new IllegalArgumentException(f"data type 0x$other%08x not supported")
  }
}
