package graft.exec

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hll

/** Round-trip + merge-interop tests for the application/hll binary format. */
class HllWireSpec extends AnyFunSuite {

  private def sketchOf(values: Seq[Long]): Array[Byte] = {
    val regs = new Array[Byte](Hll.M)
    values.foreach(v => Hll.insert(regs, Hll.hashAny(v, org.apache.spark.sql.types.LongType)))
    regs
  }

  test("sparse and dense rows round-trip bit-for-bit") {
    val rnd = new Random(42)
    val sparse = sketchOf(Seq.tabulate(100)(_ => rnd.nextLong())) // ~100 regs -> sparse
    val dense = sketchOf(Seq.tabulate(40000)(_ => rnd.nextLong())) // >4096 regs -> dense
    val rows = Seq(
      HllWire.HllRow(Seq(Some(1L), Some(10L)), sparse),
      HllWire.HllRow(Seq(Some(2L), None), dense))

    val bytes = HllWire.write(rows)
    val back = HllWire.read(bytes)

    assert(back.rows.length == 2)
    assert(back.rows(0).dims == Seq(Some(1L), Some(10L)))
    assert(back.rows(1).dims == Seq(Some(2L), None))
    assert(back.rows(0).registers.toSeq == sparse.toSeq)
    assert(back.rows(1).registers.toSeq == dense.toSeq)
    assert(back.estimates == Seq(Hll.estimate(sparse), Hll.estimate(dense)))
  }

  test("magic header enforced") {
    val bytes = HllWire.write(Seq(HllWire.HllRow(Seq(Some(1L)), sketchOf(Seq(1, 2, 3)))))
    assert(java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt() == 0xACED0102)
    bytes(0) = 0x00
    intercept[IllegalArgumentException](HllWire.read(bytes))
  }

  test("string-dim dictionaries round-trip through the dictionary section") {
    val rows = Seq(
      HllWire.HllRow(Seq(Some(0L), Some(5L)), sketchOf(Seq(1, 2))),
      HllWire.HllRow(Seq(Some(1L), None), sketchOf(Seq(3))),
      HllWire.HllRow(Seq(Some(2L), Some(7L)), sketchOf(Seq(4, 5, 6))))
    val dicts = Map(0 -> Seq("click", "purchase", "view"))
    val back = HllWire.read(HllWire.writeWithDicts(rows, dicts))
    assert(back.dicts == dicts)
    assert(back.dimString(0, 0).contains("click"))
    assert(back.dimString(1, 0).contains("purchase"))
    assert(back.dimString(2, 0).contains("view"))
    assert(back.dimString(0, 1).contains("5")) // numeric dim unaffected
    assert(back.dimString(1, 1).isEmpty)       // null stays null
    assert(back.rows.map(_.registers.toSeq) == rows.map(_.registers.toSeq))
  }

  test("deserialized sketches merge to the same estimate as a direct union sketch") {
    val a = Seq.tabulate(5000)(i => i.toLong)
    val b = Seq.tabulate(5000)(i => (i + 2500).toLong)
    val bytes = HllWire.write(Seq(
      HllWire.HllRow(Seq(Some(1L)), sketchOf(a)),
      HllWire.HllRow(Seq(Some(2L)), sketchOf(b))))
    val back = HllWire.read(bytes)

    val merged = back.rows(0).registers.clone()
    Hll.mergeInto(merged, back.rows(1).registers)
    val direct = sketchOf(a ++ b)
    assert(merged.toSeq == direct.toSeq)
    assert(Hll.estimate(merged) == Hll.estimate(direct))
  }

  // ---- reference golden fixtures (RefHllWire) -----------------------------

  private def golden(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/reference/testing/data/query/$name"))

  test("reference golden hll_query_results: decode matches hll_test.go expectations") {
    val blocks = RefHllWire.readResults(golden("hll_query_results"))
    assert(blocks.length == 2)
    assert(blocks(1) == Left("test"))
    val b = blocks(0).toOption.get
    assert(b.numDimsPerDimWidth == Seq(0, 0, 1, 1, 1))
    assert(b.enumDicts == Map(1 -> Seq("a", "b", "c", "d")))
    assert(b.rows.length == 3)
    // row 0: all-NULL dims, sparse registers (1,255) (2,254) (3,253)
    assert(b.rows(0).dims == Seq(None, None, None))
    assert(b.rows(0).sparse.get == Seq((1, 255), (2, 254), (3, 253)))
    // row 1: dims ("1", "c", "2"), dense with registers 0 and 1 set to 1
    assert((0 until 3).map(d => b.dimString(1, d)) ==
      Seq(Some("1"), Some("c"), Some("2")))
    assert(b.rows(1).storedCount == RefHllWire.DenseDataLength)
    assert(b.rows(1).registers.count(_ != 0) == 2)
    // row 2: dims ("4294967295" — Uint32 stays unsigned, "d", "514"),
    // sparse in the file's descending-index order
    assert((0 until 3).map(d => b.dimString(2, d)) ==
      Seq(Some("4294967295"), Some("d"), Some("514")))
    assert(b.rows(2).sparse.get == Seq((255, 1), (254, 2), (253, 3), (252, 4)))
    // estimates: linear counting at tiny cardinalities ~= register count
    assert(b.estimates.forall(_ > 0))
  }

  test("reference golden: decode → encode is byte-identical (width-packed writer)") {
    val hllBody = golden("hll") // the bare serialized block hll_test.go wrote
    val decoded = RefHllWire.readBlock(hllBody)
    val reencoded = RefHllWire.writeBlock(decoded)
    assert(java.util.Arrays.equals(reencoded, hllBody),
      s"re-encode diverges: ${reencoded.length} vs ${hllBody.length} bytes, first diff at " +
        reencoded.zip(hllBody).indexWhere(p => p._1 != p._2))
    // and the full envelope, including the reference's error-padding quirk
    val full = golden("hll_query_results")
    val reenvelope = RefHllWire.writeResults(Seq(Right(reencoded), Left("test")))
    assert(java.util.Arrays.equals(reenvelope, full))
  }

  test("reference golden hll_empty_results round-trips") {
    val data = golden("hll_empty_results")
    val blocks = RefHllWire.readResults(data)
    assert(blocks.length == 1)
    val reencoded = RefHllWire.writeResults(Seq(Right(Array.empty[Byte])))
    assert(java.util.Arrays.equals(reencoded, data))
  }

  test("native sketches translate into the reference wire format losslessly") {
    // bridge: engine-native HLL registers → RefHllWire rows → decode agrees
    val regs = new Array[Byte](graft.functions.Hll.M)
    regs(7) = 3; regs(100) = 1; regs(16000) = 9
    val row = RefHllWire.RefRow(Seq(Some(42L)), regs, storedCount = 3)
    val block = RefHllWire.RefBlock(Seq(0, 0, 1, 0, 0), Seq(0),
      Seq(0x00060020L), Map.empty, Seq(row))
    val decoded = RefHllWire.readBlock(RefHllWire.writeBlock(block))
    assert(decoded.rows.head.dims == Seq(Some(42L)))
    assert(decoded.rows.head.registers.toSeq == regs.toSeq)
    assert(decoded.estimates == Seq(graft.functions.Hll.estimate(regs)))
  }
}
