package graft.api

import java.nio.{ByteBuffer, ByteOrder}

/** Decoder for the reference's serialized upsert-batch wire format — the
  * unit a reference client POSTs to `/data/{table}` (and writes to redo
  * logs). Layout (all little-endian, byte-aligned;
  * /root/reference/memstore/common/upsert_batch.go:119-148):
  *
  *   [uint32] version (V1 = 0xFEED0001, upsert_batch_builder.go:46)
  *   [int32]  num_rows            (read at offset 4, upsert_batch.go:446)
  *   [uint16] num_columns         (offset 8, :457)
  *   <14 reserved bytes>
  *   [uint32] arrival_time        (offset 24, :463)
  *   column headers at offset 28 (upsert_batch_header.go:21-29):
  *     [(n+1) x uint32] column data offsets (absolute into this buffer)
  *     [n x uint32]     enum dict lengths
  *     [n x uint32]     reserved
  *     [n x uint32]     data types
  *     [n x uint16]     logical column ids
  *     [n x uint8]      mode (bits 0-2) | update mode (bits 3-5)
  *   per column at its offset (upsert_batch.go:512-532):
  *     mode 0: nothing (all values default)
  *     mode 2: null bitvector, ceil8(num_rows)/8 bytes, bit i = row i valid
  *     mode 1|2: value vector at the next 8-byte alignment
  *
  * Data-type codes are `width | baseType<<16 | isArray<<24`
  * (data_type.go:38-74). Bool values are bit-packed like the null vector.
  *
  * Array columns (isArray bit set, data_type.go:61-74) are variable
  * length: after the (optional) null vector the column carries a 4-byte
  * aligned offset vector of (numRows+1) uint32 LOCAL offsets into the
  * 8-byte-aligned value vector (upsert_batch.go:509-532). A row whose
  * offset equals the next row's offset is null (upsert_batch.go:74-81).
  * Each array value is serialized as (data_value.go:615-728):
  *
  *   [uint32] item count
  *   items: elementBits x count, bit-packed for Bool, rounded to byte
  *   item validity bits: 1 x count, rounded to byte
  *   padding to 8 bytes
  *
  * An EMPTY array (distinct from a null row) is count=0 padded to 8
  * bytes (data_value.go:599-604).
  *
  * This is an independent implementation of the published layout (the
  * RefHllWire precedent): wire constants necessarily match, code does not.
  */
object UpsertBatchWire {

  val VersionV1: Int = 0xFEED0001

  // data_type.go:43-58
  val Bool = 0x00000001
  val Int8 = 0x00010008
  val Uint8 = 0x00020008
  val Int16 = 0x00030010
  val Uint16 = 0x00040010
  val Int32 = 0x00050020
  val Uint32 = 0x00060020
  val Float32 = 0x00070020
  val SmallEnum = 0x00080008
  val BigEnum = 0x00090010
  val Uuid = 0x000a0080
  val GeoPoint = 0x000b0040
  val GeoShape = 0x000c0000
  val Int64 = 0x000d0040

  /** isArray flag bit (data_type.go:187-189). `Int32 | ArrayBit` is the
    * reference's ArrayInt32 (0x01050020), etc.
    */
  val ArrayBit = 0x01000000

  def isArrayType(dataType: Int): Boolean = (dataType & ArrayBit) != 0
  def elementType(dataType: Int): Int = dataType & 0x00FFFFFF

  /** Serialized byte size of one array value of `count` elements of
    * `elemType` (data_value.go:790-800 CalculateListElementBytes, plus
    * the empty-array 8-byte special case from GetSerBytes).
    */
  def arraySerBytes(elemType: Int, count: Int): Int = {
    val l = arraySerBytesL(elemType, count)
    require(l <= Int.MaxValue, s"array of $count elements overflows the format")
    l.toInt
  }

  /** Long-arithmetic form: the validation path MUST size crafted counts
    * without Int overflow (a count near 2^25 with a 128-bit element
    * wrapped the 32-bit product to ~0, defeating every bounds `require`
    * downstream — found by review of the untrusted-body walls).
    */
  private def arraySerBytesL(elemType: Int, count: Int): Long =
    if (count == 0) 8L
    else {
      val itemBytes = ((elemType & 0xFFFF).toLong * count + 7) / 8
      (4L + itemBytes + (count + 7L) / 8 + 7) / 8 * 8
    }

  /** One decoded column: logical id, type code, and per-row values
    * (None = null / all-default). Array rows decode as
    * `Some(IndexedSeq[Option[Any]])` — one Option per element, None for
    * an invalid element; an empty array is `Some(empty)`.
    */
  final case class Column(columnId: Int, dataType: Int, values: IndexedSeq[Option[Any]])

  final case class Batch(numRows: Int, arrivalTime: Long, columns: Seq[Column])

  /** Does this body look like a V1 upsert batch? (Content sniff for
    * clients that do not set the application/upsert-data content type.)
    */
  def looksLikeBatch(body: Array[Byte]): Boolean =
    body.length >= 28 &&
      ByteBuffer.wrap(body, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == VersionV1

  private def align(v: Int, to: Int): Int = (v + to - 1) / to * to

  def decode(body: Array[Byte]): Batch = {
    // the fixed header spans bytes [0, 28); a shorter body must fail as
    // a layout error before any absolute read (found by the
    // WirePropertySpec truncation fuzzer)
    require(body.length >= 28,
      s"batch body of ${body.length} bytes is shorter than the 28-byte header")
    val buf = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt(0) == VersionV1,
      f"unsupported upsert batch version 0x${buf.getInt(0)}%08x")
    val numRows = buf.getInt(4)
    // the reference constrains batches to 0..65535 rows
    // (upsert_batch.go:153); the bound also stops a tiny crafted body
    // from driving numRows-sized allocations on the server
    require(numRows >= 0 && numRows <= 65535, s"row count $numRows out of range")
    val numCols = buf.getShort(8) & 0xFFFF
    val arrival = buf.getInt(24).toLong & 0xFFFFFFFFL
    val headerBase = 28
    val offsetsBase = headerBase
    val typesBase = offsetsBase + (numCols + 1) * 4 + numCols * 4 + numCols * 4
    val idsBase = typesBase + numCols * 4
    val modesBase = idsBase + numCols * 2
    require(body.length >= modesBase + numCols, "incomplete header section")

    def bit(base: Int, i: Int): Boolean =
      (body(base + i / 8) & (1 << (i % 8))) != 0

    val cols = (0 until numCols).map { c =>
      val start = buf.getInt(offsetsBase + c * 4)
      val dataType = buf.getInt(typesBase + c * 4)
      val columnId = buf.getShort(idsBase + c * 2) & 0xFFFF
      val mode = body(modesBase + c) & 0x07
      require((dataType >>> 24) == 0 || (dataType >>> 24) == 1,
        f"data type 0x$dataType%08x not supported")
      require(start >= 0 && start <= body.length,
        s"column $c data offset $start outside the ${body.length}-byte buffer")

      val values: IndexedSeq[Option[Any]] = mode match {
        case 0 => IndexedSeq.fill(numRows)(None) // all default
        case 1 | 2 if dataType == GeoShape =>
          // the Go-type path (IsGoType, data_type.go:198-202): NO null
          // vector even in mode 2 (upsert_batch.go:515-517 skips it) —
          // nulls are in-band offset equality; offset vector at 4-byte
          // alignment, value vector at 8 (like arrays). Each value is
          // [uint32 nPolygons]{[uint32 nPoints][(f32 lat, f32 lng)]*}
          // (data_value.go:531-560), surfaced as the WKT text the JSON
          // ingest path accepts (data_type.go:484-515 lng-lat order).
          val offBase = align(start, 4)
          val valueBase = align(offBase + (numRows + 1) * 4, 8)
          require(valueBase <= body.length,
            s"column $c (id $columnId) geoshape offset vector needs bytes " +
              s"[$offBase, $valueBase) but the batch body has ${body.length}")
          (0 until numRows).map { row =>
            val off = buf.getInt(offBase + row * 4)
            val next = buf.getInt(offBase + (row + 1) * 4)
            require(off >= 0 && next >= off,
              s"column $c (id $columnId) row $row: offsets [$off, $next) " +
                "are negative or non-monotonic")
            if (off == next) None
            else Some(readGeoShape(buf, body, valueBase + off, next - off,
              s"column $c (id $columnId) row $row"))
          }
        case 1 | 2 if isArrayType(dataType) =>
          var cur = start
          val nullBase = if (mode == 2) {
            val b = cur; cur += align(numRows, 8) / 8; Some(b)
          } else None
          val offBase = align(cur, 4)
          val valueBase = align(offBase + (numRows + 1) * 4, 8)
          require(valueBase <= body.length,
            s"column $c (id $columnId) array offset vector needs bytes " +
              s"[$offBase, $valueBase) but the batch body has ${body.length}")
          def valid(row: Int): Boolean = nullBase.forall(bit(_, row))
          val elem = elementType(dataType)
          (0 until numRows).map { row =>
            val off = buf.getInt(offBase + row * 4)
            val next = buf.getInt(offBase + (row + 1) * 4)
            require(off >= 0 && next >= off,
              s"column $c (id $columnId) row $row: offsets [$off, $next) " +
                "are negative or non-monotonic")
            // offset==nextOffset is the reference's in-band null for
            // variable-length rows (upsert_batch.go:74-81)
            if (!valid(row) || off == next) None
            else Some(readArray(buf, body, valueBase + off, next - off, elem,
              s"column $c (id $columnId) row $row"))
          }
        case 1 | 2 =>
          var cur = start
          val nullBase = if (mode == 2) {
            val b = cur; cur += align(numRows, 8) / 8; Some(b)
          } else None
          val valueBase = align(cur, 8)
          // a truncated or crafted batch must fail as a layout error, not
          // surface as a bare IndexOutOfBoundsException from a row read:
          // require the column's full null+value extent inside the body
          val valueBytes =
            if (dataType == Bool) align(numRows, 8) / 8
            else numRows * ((dataType & 0xFFFF) / 8)
          require(valueBase + valueBytes <= body.length,
            s"column $c (id $columnId, mode $mode) needs bytes " +
              s"[$start, ${valueBase + valueBytes}) but the batch body has " +
              s"${body.length} bytes — truncated or malformed batch")
          def valid(row: Int): Boolean = nullBase.forall(bit(_, row))
          (0 until numRows).map { row =>
            if (!valid(row)) None
            else Some(readValue(buf, body, valueBase, row, dataType))
          }
        case other =>
          throw new IllegalArgumentException(s"column mode $other not supported")
      }
      Column(columnId, dataType, values)
    }
    Batch(numRows, arrival, cols)
  }

  /** One array value at absolute position `pos` spanning `span` bytes:
    * uint32 count, packed items, item validity bits (data_value.go:615-728).
    * A crafted count that does not fit its span fails as a layout error.
    */
  private def readArray(buf: ByteBuffer, body: Array[Byte], pos: Int,
      span: Int, elemType: Int, what: String): IndexedSeq[Option[Any]] = {
    require(pos >= 0 && pos + 4 <= body.length && span >= 4,
      s"$what: array header at $pos outside the ${body.length}-byte buffer")
    val count = buf.getInt(pos)
    // all sizing in Long: a crafted count must fail the walls, never
    // wrap them (see arraySerBytesL)
    val ser = if (count >= 0) arraySerBytesL(elemType, count) else -1L
    require(count >= 0 && ser <= span,
      s"$what: array of $count elements needs $ser bytes " +
        s"but the row spans $span")
    require(pos.toLong + ser <= body.length,
      s"$what: array value extends past the ${body.length}-byte buffer")
    if (count == 0) IndexedSeq.empty
    else {
      val itemsBase = pos + 4
      val validityBase = itemsBase + (((elemType & 0xFFFF).toLong * count + 7) / 8).toInt
      (0 until count).map { i =>
        if (!bit(body, validityBase, i)) None
        else Some(readValue(buf, body, itemsBase, i, elemType))
      }
    }
  }

  private def bit(body: Array[Byte], base: Int, i: Int): Boolean =
    (body(base + i / 8) & (1 << (i % 8))) != 0

  /** One GeoShape value at absolute `pos` spanning `span` bytes →
    * `POLYGON((lng lat, …), (…))` WKT text (the reference's string form,
    * data_type.go:484-515; floats render shortest-round-trip so the text
    * re-parses to the identical float32s).
    */
  private def readGeoShape(buf: ByteBuffer, body: Array[Byte], pos: Int,
      span: Int, what: String): String = {
    require(pos >= 0 && pos + 4 <= body.length && span >= 4,
      s"$what: geoshape header at $pos outside the ${body.length}-byte buffer")
    val nPoly = buf.getInt(pos)
    require(nPoly >= 0 && nPoly <= span / 4,
      s"$what: $nPoly polygons cannot fit the $span-byte row")
    var cur = pos + 4
    val polys = (0 until nPoly).map { _ =>
      require(cur + 4 <= pos + span && cur + 4 <= body.length,
        s"$what: polygon header at $cur past the row/body end")
      val nPts = buf.getInt(cur)
      cur += 4
      // Long arithmetic: a crafted nPts near 2^28 wraps nPts*8 negative
      // in Int and slips past these walls
      require(nPts >= 0 && cur + nPts * 8L <= pos + span &&
        cur + nPts * 8L <= body.length,
        s"$what: $nPts points cannot fit the remaining row bytes")
      val pts = (0 until nPts).map { j =>
        val lat = buf.getFloat(cur + j * 8)
        val lng = buf.getFloat(cur + j * 8 + 4)
        s"${fmtF(lng)} ${fmtF(lat)}"
      }
      cur += nPts * 8
      pts.mkString("(", ", ", ")")
    }
    polys.mkString("POLYGON(", ", ", ")")
  }

  /** Shortest float rendering without the Java `.0` suffix on integers. */
  private def fmtF(f: Float): String = {
    val s = f.toString
    if (s.endsWith(".0")) s.dropRight(2) else s
  }

  /** Fixed-width scalar read at `base + row*width`. UUIDs render in
    * canonical 8-4-4-4-12 hex; GeoPoint as (lat, lng) — the reference
    * stores [2]float32 in that order (data_type.go:56).
    */
  private def readValue(buf: ByteBuffer, body: Array[Byte], base: Int,
      row: Int, dataType: Int): Any = dataType match {
    case Bool => (body(base + row / 8) & (1 << (row % 8))) != 0
    case Int8 => body(base + row).toLong
    case Uint8 | SmallEnum => (body(base + row) & 0xFF).toLong
    case Int16 => buf.getShort(base + row * 2).toLong
    case Uint16 | BigEnum => (buf.getShort(base + row * 2) & 0xFFFF).toLong
    case Int32 => buf.getInt(base + row * 4).toLong
    case Uint32 => buf.getInt(base + row * 4).toLong & 0xFFFFFFFFL
    case Float32 => buf.getFloat(base + row * 4)
    case Int64 => buf.getLong(base + row * 8)
    case Uuid =>
      val hex = (0 until 16).map(i => f"${body(base + row * 16 + i) & 0xFF}%02x").mkString
      s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
        s"${hex.substring(16, 20)}-${hex.substring(20)}"
    case GeoPoint =>
      (buf.getFloat(base + row * 8), buf.getFloat(base + row * 8 + 4))
    case other =>
      throw new IllegalArgumentException(f"data type 0x$other%08x not supported")
  }
}
