package graft.api

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the binary upsert wire: encode∘decode is the
  * identity over arbitrary batches — every scalar type, array type and
  * GeoShape, any null/empty/mode combination, any row count the format
  * allows. The decoder is also the server's parser of UNTRUSTED bodies,
  * so the generator doubles as a structured fuzzer for the layout
  * bounds (a crafted length that escapes its row span must raise, never
  * read out of bounds — the `require` walls in UpsertBatchWire.decode).
  *
  * Deterministic: fixed-seed generators (the PropertySpec discipline —
  * no scalatestplus bridge in the dependency set).
  */
class WirePropertySpec extends AnyFunSuite {
  import UpsertBatchWire._

  private def forAllN[A](gen: Gen[A], n: Int = 120)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0xBEEF00L + i)))
    }

  private val scalarTypes =
    Seq(Bool, Int8, Uint8, Int16, Uint16, Int32, Uint32, Float32,
      SmallEnum, BigEnum, Uuid, GeoPoint, Int64)

  private def genScalar(tpe: Int): Gen[Any] = tpe match {
    case Bool => Gen.oneOf(true, false)
    case Int8 => Gen.chooseNum(-128, 127).map(_.toLong)
    case Uint8 | SmallEnum => Gen.chooseNum(0, 255).map(_.toLong)
    case Int16 => Gen.chooseNum(-32768, 32767).map(_.toLong)
    case Uint16 | BigEnum => Gen.chooseNum(0, 65535).map(_.toLong)
    case Int32 => Gen.chooseNum(Int.MinValue, Int.MaxValue).map(_.toLong)
    case Uint32 => Gen.chooseNum(0L, 0xFFFFFFFFL)
    case Int64 => Gen.chooseNum(Long.MinValue, Long.MaxValue)
    case Float32 => Gen.chooseNum(-1e6f, 1e6f)
    case Uuid => Gen.listOfN(32, Gen.hexChar).map { h =>
      val s = h.mkString.toLowerCase
      s"${s.substring(0, 8)}-${s.substring(8, 12)}-${s.substring(12, 16)}-" +
        s"${s.substring(16, 20)}-${s.substring(20)}"
    }
    case GeoPoint =>
      for (a <- Gen.chooseNum(-90f, 90f); b <- Gen.chooseNum(-180f, 180f))
        yield (a, b)
    case other => sys.error(f"no generator for 0x$other%08x")
  }

  private def genOpt[A](g: Gen[A]): Gen[Option[Any]] =
    Gen.frequency(3 -> g.map(Some(_): Option[Any]), 1 -> Gen.const(None))

  private def genColumn(numRows: Int, id: Int): Gen[(Int, Int, IndexedSeq[Option[Any]])] =
    Gen.oneOf(
      // scalar column
      for {
        tpe <- Gen.oneOf(scalarTypes)
        vs <- Gen.listOfN(numRows, genOpt(genScalar(tpe)))
      } yield (id, tpe, vs.toIndexedSeq),
      // array column: null rows, empty arrays, null elements all mixed
      for {
        elem <- Gen.oneOf(Bool, Int8, Int16, Int32, Int64, Float32, Uuid, GeoPoint)
        vs <- Gen.listOfN(numRows, Gen.frequency(
          1 -> Gen.const(None),
          1 -> Gen.const(Some(IndexedSeq.empty[Option[Any]]): Option[Any]),
          4 -> Gen.chooseNum(1, 9).flatMap(k =>
            Gen.listOfN(k, genOpt(genScalar(elem)))
              .map(es => Some(es.toIndexedSeq): Option[Any]))))
      } yield (id, elem | ArrayBit, vs.toIndexedSeq),
      // geoshape column via WKT round trip
      for {
        vs <- Gen.listOfN(numRows, Gen.frequency(
          1 -> Gen.const(None),
          3 -> (for {
            nPoly <- Gen.chooseNum(1, 3)
            polys <- Gen.listOfN(nPoly, for {
              nPts <- Gen.chooseNum(1, 5)
              pts <- Gen.listOfN(nPts,
                for (lat <- Gen.chooseNum(-89, 89); lng <- Gen.chooseNum(-179, 179))
                  yield s"$lng $lat")
            } yield pts.mkString("(", ", ", ")"))
          } yield Some(polys.mkString("POLYGON(", ", ", ")")): Option[Any])))
      } yield (id, GeoShape, vs.toIndexedSeq))

  private val genBatch: Gen[(Int, Seq[(Int, Int, IndexedSeq[Option[Any]])])] =
    for {
      numRows <- Gen.chooseNum(0, 40)
      nCols <- Gen.chooseNum(1, 6)
      cols <- Gen.sequence[Seq[(Int, Int, IndexedSeq[Option[Any]])],
        (Int, Int, IndexedSeq[Option[Any]])](
        (0 until nCols).map(genColumn(numRows, _)))
    } yield (numRows, cols)

  test("encode then decode is the identity over arbitrary batches") {
    forAllN(genBatch) { case (numRows, cols) =>
      val bytes = UpsertClient.encode(numRows, 1706659200L, cols)
      val batch = UpsertBatchWire.decode(bytes)
      assert(batch.numRows == numRows)
      assert(batch.columns.length == cols.length)
      batch.columns.zip(cols).foreach { case (got, (id, tpe, want)) =>
        assert(got.columnId == id && got.dataType == tpe)
        val normalized: IndexedSeq[Option[Any]] =
          if (numRows == 0) IndexedSeq.empty
          else if (want.forall(_.isEmpty)) IndexedSeq.fill(numRows)(None)
          else want
        if (tpe == GeoShape) {
          // WKT text round-trips through float32 values; integer-valued
          // generator coords render back identically
          assert(got.values.map(_.map(_.asInstanceOf[String].toLowerCase)) ==
            normalized.map(_.map(_.asInstanceOf[String].toLowerCase)),
            s"geoshape mismatch for column $id")
        } else {
          assert(got.values == normalized,
            s"type 0x${tpe.toHexString} column $id: ${got.values} != $normalized")
        }
      }
    }
  }

  test("crafted counts that overflow Int sizing fail the walls, never escape") {
    // a valid single-row array batch, then the count word inflated to a
    // value whose Int-sized byte math wraps (~2^25 elements x 128-bit
    // items): the decoder must raise a layout error, not read past the
    // buffer or decode a wrong null mask
    val base = UpsertClient.encode(1, 1706659200L, Seq(
      (0, Uuid | ArrayBit, IndexedSeq(Some(IndexedSeq(
        Some("00112233-4455-6677-8899-aabbccddeeff")))))))
    val bb = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // find the array value: column data starts at the first offset word
    val colStart = bb.getInt(28)
    // layout: offset vector (2 words, 4-aligned) then 8-aligned value
    val valueBase = (colStart + 2 * 4 + 7) / 8 * 8
    Seq(1 << 25, Int.MaxValue, -5).foreach { crafted =>
      val evil = base.clone()
      java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(valueBase, crafted)
      try { UpsertBatchWire.decode(evil); fail(s"count $crafted decoded") }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"count $crafted escaped the walls: $e")
      }
    }
    // same for geoshape point counts
    val gs = UpsertClient.encode(1, 1706659200L, Seq(
      (0, GeoShape, IndexedSeq(Some("POLYGON((0 0, 1 0, 1 1, 0 0))")))))
    val gsStart = java.nio.ByteBuffer.wrap(gs)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(28)
    val gsValue = (gsStart + 2 * 4 + 7) / 8 * 8
    Seq(1 << 28, -3).foreach { crafted =>
      val evil = gs.clone()
      java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(gsValue + 4, crafted) // nPoints of polygon 0
      try { UpsertBatchWire.decode(evil); fail(s"nPts $crafted decoded") }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"nPts $crafted escaped the walls: $e")
      }
    }
  }

  test("a truncated body fails loudly, never reads out of bounds") {
    forAllN(genBatch, n = 60) { case (numRows, cols) =>
      val bytes = UpsertClient.encode(numRows, 1706659200L, cols)
      // every strict prefix either throws IllegalArgumentException (a
      // require wall) or decodes a batch (a prefix that happens to stay
      // self-consistent) — an IndexOutOfBounds/NegativeArraySize escape
      // would fail this test
      Seq(bytes.length / 4, bytes.length / 2, bytes.length - 1).foreach { cut =>
        if (cut >= 0 && cut < bytes.length) {
          val prefix = java.util.Arrays.copyOfRange(bytes, 0, cut)
          try { UpsertBatchWire.decode(prefix); () }
          catch {
            case _: IllegalArgumentException => ()
            case e: Throwable =>
              fail(s"decode escaped the bounds walls on a $cut-byte prefix: $e")
          }
        }
      }
    }
  }
}
