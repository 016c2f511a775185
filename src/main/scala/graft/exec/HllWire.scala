package graft.exec

import java.nio.{ByteBuffer, ByteOrder}

import graft.functions.Hll

/** ENGINE-NATIVE binary serialization of HLL query results (uniform
  * 8-byte dims, 3-byte sparse registers) — a compact internal round-trip
  * codec. The `application/hll` HTTP endpoint serves [[RefHllWire]], the
  * byte-exact reference layout; this format remains for internal sketch
  * transport where the uniform layout is simpler and smaller to produce.
  * (Reference format doc: /root/reference/query/common/hll.go:30-70;
  * writer at query/hll.go:27-108.)
  *
  * Layout implemented (little-endian, 8-byte aligned sections, magic
  * 0xACED0102):
  *
  * {{{
  *   [uint32 magic] [uint32 padding]
  *   -- one query result block --
  *   [uint32 block size] [uint8 isErr] [3 bytes padding]
  *   [uint8 numDims] [7 bytes padding]
  *   [uint32 resultSize] [uint32 rawDimValuesVectorLength]
  *   <dim values vector>  per dim: resultSize * 8 bytes (int64 LE)
  *   <dim nulls vector>   per dim: resultSize bytes (1 = valid)
  *   [padding to 8]
  *   <counts vector>      resultSize * uint16 non-zero register counts
  *   [padding to 8]
  *   <hll vector>         per row: sparse (3 bytes per non-zero register,
  *                        uint16 LE index + uint8 rho) when
  *                        nonZero * 4 < 16384, else dense 16 KiB
  *   [padding to 8]
  * }}}
  *
  * Deviations from the reference, by design: dimension values are written
  * as uniform 8-byte integers rather than width-bucketed vectors (our
  * engine has no 1/2-byte packed dim encoding), and enum-dictionary
  * sections are absent (strings are first-class here, so dims must be
  * numeric — the caller formats string dims before serialization).
  * The sparse/dense encoding, counts semantics, magic, and the row-major
  * result structure match, and [[read]] round-trips.
  */
object HllWire {

  val Magic: Int = 0xACED0102

  /** Delimiter between dictionary cases (ref EnumDelimiter hll.go:35). */
  val EnumDelimiter = "\u0000\n"

  /** One result row: dim values (null = missing) + the register array. */
  final case class HllRow(dims: Seq[Option[Long]], registers: Array[Byte])

  /** @param dicts per-dimension string dictionary (the reference's enum
    *   cases section): when present for dim i, that dim's values are
    *   indexes into the dictionary
    */
  final case class HllResult(rows: Seq[HllRow],
      dicts: Map[Int, Seq[String]] = Map.empty) {
    def estimates: Seq[Long] = rows.map(r => Hll.estimate(r.registers))

    /** Dim value of row r at position d, dictionary-decoded when one
      * applies.
      */
    def dimString(r: Int, d: Int): Option[String] =
      rows(r).dims(d).map { v =>
        dicts.get(d) match {
          case Some(dict) if v >= 0 && v < dict.length => dict(v.toInt)
          case _ => v.toString
        }
      }
  }

  private def aligned(n: Int): Int = (n + 7) / 8 * 8

  /** Serialize rows whose string dimensions have been dictionary-encoded
    * (see [[dictEncode]]); `dicts` travels in the enum-cases section.
    */
  def writeWithDicts(rows: Seq[HllRow], dicts: Map[Int, Seq[String]]): Array[Byte] = {
    val body = write(rows)
    if (dicts.isEmpty) return body
    // dictionary section appended after the body: [int32 nDicts] then per
    // dict: [int32 dimIndex][int32 byteLen][bytes: cases joined by the
    // enum delimiter, padded to 8]
    val encoded = dicts.toSeq.sortBy(_._1).map { case (d, cases) =>
      (d, cases.mkString(EnumDelimiter).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val extra = 4 + encoded.map(e => 8 + aligned(e._2.length)).sum
    val buf = ByteBuffer.allocate(body.length + extra).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(body)
    buf.putInt(encoded.length)
    encoded.foreach { case (d, bytes) =>
      buf.putInt(d)
      buf.putInt(bytes.length)
      buf.put(bytes)
      buf.position(buf.position() + (aligned(bytes.length) - bytes.length))
    }
    buf.array()
  }

  def write(rows: Seq[HllRow]): Array[Byte] = {
    val numDims = rows.headOption.map(_.dims.length).getOrElse(0)
    val resultSize = rows.length

    val nonZeroCounts = rows.map { r =>
      var c = 0
      var i = 0
      while (i < r.registers.length) { if (r.registers(i) != 0) c += 1; i += 1 }
      c
    }
    val hllLens = nonZeroCounts.map(c => if (c * 4 < Hll.M) c * 3 else Hll.M)

    val dimValuesLen = numDims * resultSize * 8
    val dimNullsLen = numDims * resultSize
    val rawDimsLen = aligned(dimValuesLen + dimNullsLen)
    val countsLen = aligned(resultSize * 2)
    val hllLen = aligned(hllLens.sum)

    val blockSize = 8 + 8 + rawDimsLen + countsLen + hllLen
    val total = 8 + 8 + blockSize
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)

    buf.putInt(Magic)
    buf.putInt(0)
    buf.putInt(blockSize)
    buf.put(0.toByte) // result, not error
    buf.put(new Array[Byte](3))

    buf.put(numDims.toByte)
    buf.put(new Array[Byte](7))
    buf.putInt(resultSize)
    buf.putInt(rawDimsLen)

    // dim values, column-major per dimension
    for (d <- 0 until numDims; r <- rows)
      buf.putLong(r.dims(d).getOrElse(0L))
    // validity bytes
    for (d <- 0 until numDims; r <- rows)
      buf.put(if (r.dims(d).isDefined) 1.toByte else 0.toByte)
    buf.position(buf.position() + (rawDimsLen - dimValuesLen - dimNullsLen))

    nonZeroCounts.foreach(c => buf.putShort(c.toShort))
    buf.position(buf.position() + (countsLen - resultSize * 2))

    rows.zip(nonZeroCounts).foreach { case (r, nonZero) =>
      if (nonZero * 4 < Hll.M) {
        var i = 0
        while (i < Hll.M) {
          if (r.registers(i) != 0) {
            buf.putShort(i.toShort)
            buf.put(r.registers(i))
          }
          i += 1
        }
      } else {
        buf.put(r.registers, 0, Hll.M)
      }
    }
    buf.array()
  }

  def read(data: Array[Byte]): HllResult = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == Magic, f"bad magic 0x$magic%08X")
    buf.getInt() // padding
    buf.getInt() // block size
    val isErr = buf.get()
    require(isErr == 0, "error result block")
    buf.position(buf.position() + 3)

    val numDims = buf.get().toInt & 0xFF
    buf.position(buf.position() + 7)
    val resultSize = buf.getInt()
    val rawDimsLen = buf.getInt()

    val dimStart = buf.position()
    val values = Array.ofDim[Long](numDims, resultSize)
    for (d <- 0 until numDims; r <- 0 until resultSize)
      values(d)(r) = buf.getLong()
    val valid = Array.ofDim[Byte](numDims, resultSize)
    for (d <- 0 until numDims) buf.get(valid(d))
    buf.position(dimStart + rawDimsLen)

    val counts = (0 until resultSize).map(_ => buf.getShort().toInt & 0xFFFF)
    buf.position(dimStart + rawDimsLen + aligned(resultSize * 2))

    val rows = (0 until resultSize).map { r =>
      val regs = new Array[Byte](Hll.M)
      if (counts(r) * 4 < Hll.M) {
        var i = 0
        while (i < counts(r)) {
          val idx = buf.getShort().toInt & 0xFFFF
          regs(idx) = buf.get()
          i += 1
        }
      } else {
        buf.get(regs)
      }
      HllRow(
        (0 until numDims).map(d => if (valid(d)(r) == 1) Some(values(d)(r)) else None),
        regs)
    }

    // optional trailing dictionary section
    val hllLens = counts.map(c => if (c * 4 < Hll.M) c * 3 else Hll.M)
    buf.position(dimStart + rawDimsLen + aligned(resultSize * 2) + aligned(hllLens.sum))
    val dicts =
      if (buf.remaining() >= 4) {
        val nDicts = buf.getInt()
        (0 until nDicts).map { _ =>
          val d = buf.getInt()
          val len = buf.getInt()
          val bytes = new Array[Byte](len)
          buf.get(bytes)
          buf.position(buf.position() + (aligned(len) - len))
          d -> new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            .split(java.util.regex.Pattern.quote(EnumDelimiter), -1).toSeq
        }.toMap
      } else Map.empty[Int, Seq[String]]

    HllResult(rows, dicts)
  }
}
