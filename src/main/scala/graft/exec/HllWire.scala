package graft.exec

import java.nio.{ByteBuffer, ByteOrder}

import graft.functions.Hll

/** Binary serialization of HLL query results — the `application/hll`
  * response body (/root/reference/query/common/hll.go:30-70 format doc;
  * writer at query/hll.go:27-108).
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

  /** One result row: dim values (null = missing) + the register array. */
  final case class HllRow(dims: Seq[Option[Long]], registers: Array[Byte])

  final case class HllResult(rows: Seq[HllRow]) {
    def estimates: Seq[Long] = rows.map(r => Hll.estimate(r.registers))
  }

  private def aligned(n: Int): Int = (n + 7) / 8 * 8

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
    HllResult(rows)
  }
}
