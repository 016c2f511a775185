package graft.exec

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The topology's partial-answer refusals (no Spark, no HTTP — slices()
  * throws before any fan-out happens).
  *
  * The dynamic broker fans over whatever slices() returns, so the two
  * DOWN-slice shapes must fail the query loudly rather than narrow the
  * fan-out: a silently missing slice turns every merged aggregate into a
  * silent undercount — strictly worse than an error.
  */
class BrokerTopologySpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("topo-spec").toString

  test("a slice with registered members but none fresh fails queries loudly") {
    var now = 0L
    val dir = tmp()
    val topo = new BrokerTopology(dir, staleMillis = 5000, cacheMillis = 0,
      clock = () => now)
    val ra = topo.register("a", "http://a:1", beatMillis = 3600000)
    val rb = topo.register("b", "http://b:1", beatMillis = 3600000)
    try {
      assert(topo.slices().length == 2)
      // b crashes: its heartbeat goes stale while its member file remains
      now += 6000
      ra.beatNow()
      val e = intercept[IllegalStateException](topo.slices())
      assert(e.getMessage.contains("b"), e.getMessage)
      assert(e.getMessage.contains("down"), e.getMessage)
      // b recovers: one heartbeat and the fan-out is whole again
      rb.beatNow()
      assert(topo.slices().length == 2)
      // b DEPARTS (deregistration deletes the file): one slice, no error
      rb.close()
      assert(topo.slices().length == 1)
    } finally { ra.close(); rb.close() }
  }

  test("an assigned slice with no member at all fails queries loudly (typo guard)") {
    var now = 0L
    val dir = tmp()
    val topo = new BrokerTopology(dir, staleMillis = 5000, cacheMillis = 0,
      clock = () => now)
    val ra = topo.register("a", "http://a:1", beatMillis = 3600000)
    try {
      // the rebalancer has published an assignment giving days to slice
      // "b", but no member ever registered under that id (never started,
      // or running under a typo'd slice name)
      Files.writeString(Paths.get(dir, "assignment.json"),
        """{"version": 3, "owners": {"a": ["2024-01-01"], "b": ["2024-01-02"]}}""")
      val e = intercept[IllegalStateException](topo.slices())
      assert(e.getMessage.contains("b") && e.getMessage.contains("v3"),
        e.getMessage)
      assert(e.getMessage.contains("no live member"), e.getMessage)
      // an assigned slice with an EMPTY day list is a new member of a
      // small corpus — nothing unserved, no error
      Files.writeString(Paths.get(dir, "assignment.json"),
        """{"version": 4, "owners": {"a": ["2024-01-01"], "b": []}}""")
      assert(topo.slices().length == 1)
      // the missing member registers: whole again
      Files.writeString(Paths.get(dir, "assignment.json"),
        """{"version": 5, "owners": {"a": ["2024-01-01"], "b": ["2024-01-02"]}}""")
      val rb = topo.register("b", "http://b:1", beatMillis = 3600000)
      try assert(topo.slices().length == 2)
      finally rb.close()
    } finally ra.close()
  }

  test("a crashed slice the assignment no longer names does not block serving") {
    // the crash-triggered rebalance endgame: b died, the watcher
    // reassigned its days to a, but b's stale registry file remains —
    // queries must flow (erroring on unassigned garbage would keep the
    // tier down forever after the data fully recovered)
    var now = 0L
    val dir = tmp()
    val topo = new BrokerTopology(dir, staleMillis = 5000, cacheMillis = 0,
      clock = () => now)
    val ra = topo.register("a", "http://a:1", beatMillis = 3600000)
    val rb = topo.register("b", "http://b:1", beatMillis = 3600000)
    try {
      // b crashes while still assigned: loud
      Files.writeString(Paths.get(dir, "assignment.json"),
        """{"version": 7, "owners": {"a": ["2024-01-01"], "b": ["2024-01-02"]}}""")
      now += 6000
      ra.beatNow()
      val e = intercept[IllegalStateException](topo.slices())
      assert(e.getMessage.contains("b") && e.getMessage.contains("no live member"),
        e.getMessage)
      // the watcher reassigns b's days to a: serving resumes despite b's
      // stale file still sitting in the registry
      Files.writeString(Paths.get(dir, "assignment.json"),
        """{"version": 8, "owners": {"a": ["2024-01-01", "2024-01-02"]}}""")
      assert(topo.slices().length == 1)
    } finally { ra.close(); rb.close() }
  }

  test("assignmentDir decouples the assignment location from the members dir") {
    var now = 0L
    val membersDir = tmp()
    val assignDir = tmp()
    val topo = new BrokerTopology(membersDir, staleMillis = 5000,
      cacheMillis = 0, clock = () => now, assignmentDir = assignDir)
    val ra = topo.register("a", "http://a:1", beatMillis = 3600000)
    try {
      // an assignment in the MEMBERS dir is ignored under an explicit
      // assignmentDir...
      Files.writeString(Paths.get(membersDir, "assignment.json"),
        """{"version": 1, "owners": {"ghost": ["2024-01-01"]}}""")
      assert(topo.slices().length == 1)
      // ...the configured dir is consulted
      Files.writeString(Paths.get(assignDir, "assignment.json"),
        """{"version": 1, "owners": {"ghost": ["2024-01-01"]}}""")
      val e = intercept[IllegalStateException](topo.slices())
      assert(e.getMessage.contains("ghost"), e.getMessage)
    } finally ra.close()
  }
}
