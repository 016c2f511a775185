package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Drain-marker failure-direction contract: every corruption / regression
  * mode must fail toward CONSERVATIVE shared-archive serving (cache-less
  * but correct), never toward a member trusting its stale local cache —
  * and a drain must never silently restart the seq counter (members whose
  * `.synced-seq` is ahead of a reset counter would serve stale days for
  * every subsequent rewrite until the counter caught back up).
  */
class DrainMarkerSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private def tmp(): String =
    Files.createTempDirectory("drainmarker").toString

  test("bump/read/staleDays happy path") {
    val dir = tmp()
    assert(DrainMarker.bump(dir, conf, Seq("2024-01-01")) == 1L)
    assert(DrainMarker.bump(dir, conf, Seq("2024-01-02", "2024-01-03")) == 2L)
    val m = DrainMarker.read(dir, conf)
    assert(m.seq == 2L && !m.corrupt)
    assert(DrainMarker.staleDays(m, 2L) == Some(Set.empty))
    assert(DrainMarker.staleDays(m, 1L) ==
      Some(Set("2024-01-02", "2024-01-03")))
    assert(DrainMarker.staleDays(m, 0L) ==
      Some(Set("2024-01-01", "2024-01-02", "2024-01-03")))
  }

  test("corrupt marker file reads as corrupt and staleDays fails conservative") {
    val dir = tmp()
    DrainMarker.bump(dir, conf, Seq("2024-01-01"))
    Files.write(Paths.get(dir, DrainMarker.MarkerFile),
      "{not json".getBytes(StandardCharsets.UTF_8))
    val m = DrainMarker.read(dir, conf)
    assert(m.corrupt, "parse failure must be distinguishable from 'no marker'")
    // a member synced through seq 3 must NOT read the reset-to-0 marker as
    // "fully synced" — None = serve every owned day from shared
    assert(DrainMarker.staleDays(m, 3L) == None)
    // even a fresh member (synced 0) serves conservative under corruption
    assert(DrainMarker.staleDays(m, 0L) == None)
  }

  test("missing marker is NOT corrupt (fresh deployment serves local)") {
    val m = DrainMarker.read(tmp(), conf)
    assert(m.seq == 0L && !m.corrupt)
    assert(DrainMarker.staleDays(m, 0L) == Some(Set.empty))
  }

  test("seq regression (marker behind synced-seq) fails conservative") {
    val dir = tmp()
    DrainMarker.bump(dir, conf, Seq("2024-01-01"))
    val m = DrainMarker.read(dir, conf) // seq 1
    // a member recorded synced-through-5; the marker says 1 — someone
    // replaced/reset the marker. "No stale days" would be a lie.
    assert(DrainMarker.staleDays(m, 5L) == None)
  }

  test("bump refuses to restart the counter over an unparseable marker") {
    val dir = tmp()
    DrainMarker.bump(dir, conf, Seq("2024-01-01"))
    DrainMarker.bump(dir, conf, Seq("2024-01-02"))
    Files.write(Paths.get(dir, DrainMarker.MarkerFile),
      "garbage".getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException](
      DrainMarker.bump(dir, conf, Seq("2024-01-03")))
    assert(e.getMessage.contains("unparseable"))
  }

  test("window overflow past RecentCap returns None, never a partial set") {
    val dir = tmp()
    (1 to DrainMarker.RecentCap + 3).foreach { i =>
      DrainMarker.bump(dir, conf, Seq(f"2024-02-$i%02d"))
    }
    val m = DrainMarker.read(dir, conf)
    // synced 1: drains 2..cap+3 are newer but drain 2 fell out of the
    // bounded window — the member cannot enumerate its stale days
    assert(DrainMarker.staleDays(m, 1L) == None)
    // synced just inside the window: exact enumeration still works
    val inside = m.seq - 5
    assert(DrainMarker.staleDays(m, inside).exists(_.size == 5))
  }
}
