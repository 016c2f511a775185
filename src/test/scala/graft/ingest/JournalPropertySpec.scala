package graft.ingest

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the redo-log file framing: for ANY sequence of
  * appended batches and ANY corruption of the file's tail — truncation
  * at an arbitrary byte (the torn append), or arbitrary byte garbage
  * overwriting the tail — `replay` returns exactly the longest prefix of
  * clean records and never throws. The deterministic torn-tail spec in
  * GraftServerSpec pins the crash-mid-append story; this fuzzes the
  * frame walker itself (the r14-s3 review found an Int overflow in the
  * bounds check — `pos + 9 + len` wrapping negative for a corrupt
  * length near Int.MaxValue — that exactly this generator class
  * catches).
  *
  * Deterministic: fixed-seed generators (the PropertySpec discipline).
  */
class JournalPropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 120)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0x10A1L + i)))
    }

  private val genPayload: Gen[Array[Byte]] =
    Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  private val genBatches: Gen[List[(Byte, Array[Byte])]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n,
      for {
        kind <- Gen.oneOf(UpsertJournal.KindJson, UpsertJournal.KindBinary)
        payload <- genPayload
      } yield (kind, payload)))

  private def withJournal[T](f: (UpsertJournal, String) => T): T = {
    val dir = Files.createTempDirectory("jprop").toString
    val j = new UpsertJournal(dir)
    try f(j, dir) finally j.close()
  }

  private def sameRecords(a: Seq[(Byte, Array[Byte])],
      b: Seq[(Byte, Array[Byte])]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((k1, p1), (k2, p2)) =>
      k1 == k2 && java.util.Arrays.equals(p1, p2)
    }

  test("replay is the identity over any appended batch sequence") {
    forAllN(genBatches, n = 60) { batches =>
      withJournal { (j, _) =>
        batches.foreach { case (k, p) => j.append("t", k, p) }
        assert(sameRecords(j.replay("t"), batches))
        j.truncate("t")
        assert(j.replay("t").isEmpty && j.size("t") == 0L)
      }
    }
  }

  test("a tail truncated at ANY byte replays the longest clean prefix, never throws") {
    val gen = for {
      batches <- genBatches.suchThat(_.nonEmpty)
      cut <- Gen.chooseNum(0, 1000)
    } yield (batches, cut)
    forAllN(gen, n = 80) { case (batches, cutSeed) =>
      withJournal { (j, dir) =>
        batches.foreach { case (k, p) => j.append("t", k, p) }
        j.close()
        val f = Paths.get(dir, "t.redolog")
        val bytes = Files.readAllBytes(f)
        val cut = cutSeed % (bytes.length + 1)
        Files.write(f, java.util.Arrays.copyOf(bytes, cut),
          StandardOpenOption.TRUNCATE_EXISTING)
        val j2 = new UpsertJournal(dir)
        try {
          val replayed = j2.replay("t")
          // the replay must be a PREFIX of what was appended — never a
          // partial record, never an invented one
          assert(replayed.length <= batches.length)
          assert(sameRecords(replayed, batches.take(replayed.length)))
          // every fully-intact record before the cut must survive
          var pos = 0L
          var intact = 0
          batches.foreach { case (_, p) =>
            pos += 9L + p.length
            if (pos <= cut) intact += 1
          }
          assert(replayed.length == intact,
            s"cut=$cut intact=$intact replayed=${replayed.length}")
        } finally j2.close()
      }
    }
  }

  test("arbitrary garbage over the tail stops replay at the last clean record, never throws") {
    val gen = for {
      batches <- genBatches
      garbage <- Gen.chooseNum(1, 32).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    } yield (batches, garbage)
    forAllN(gen, n = 80) { case (batches, garbage) =>
      withJournal { (j, dir) =>
        batches.foreach { case (k, p) => j.append("t", k, p) }
        j.close()
        val f = Paths.get(dir, "t.redolog")
        // CREATE too: an empty batch list never opened the file
        Files.write(f, garbage, StandardOpenOption.CREATE,
          StandardOpenOption.APPEND)
        val j2 = new UpsertJournal(dir)
        try {
          // garbage after the clean records: all records survive, the
          // tail is dropped (random garbage parsing as a clean frame
          // needs its first 4 bytes to spell the magic — ~2^-32)
          val replayed = j2.replay("t")
          assert(replayed.length >= batches.length)
          assert(sameRecords(replayed.take(batches.length), batches))
        } finally j2.close()
      }
    }
  }

  test("a corrupt length near Int.MaxValue stops replay cleanly (overflow regression)") {
    withJournal { (j, dir) =>
      j.append("t", UpsertJournal.KindJson, Array[Byte](1, 2, 3))
      j.close()
      val f = Paths.get(dir, "t.redolog")
      // append a frame with magic intact and len = 0x7FFFFFF0: the int
      // bounds check wrapped negative and replay crashed in copyOfRange
      val buf = java.nio.ByteBuffer.allocate(9)
      buf.putInt(UpsertJournal.Magic).put(UpsertJournal.KindJson)
        .putInt(0x7FFFFFF0)
      Files.write(f, buf.array(), StandardOpenOption.APPEND)
      val j2 = new UpsertJournal(dir)
      try {
        val replayed = j2.replay("t")
        assert(replayed.length == 1)
        assert(java.util.Arrays.equals(replayed.head._2, Array[Byte](1, 2, 3)))
      } finally j2.close()
    }
  }
}
