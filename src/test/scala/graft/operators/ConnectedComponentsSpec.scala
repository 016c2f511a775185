package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Local union-find ground truth. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n.toLong.toInt)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // path-compress to the true minimum root
    touched.map(v => v -> find(v.toInt).toLong).toMap
  }

  /** Every shape runs through BOTH implementations — the driver
    * union-find (default dispatch at this scale) and the distributed
    * large-star/small-star (localThreshold = 0 disables the shortcut) —
    * and they must agree exactly.
    */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val local = Dedup.connectedComponents(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Dedup.connectedComponents(edges.toDF("s", "d"), "s", "d",
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == distributed,
      s"local union-find and distributed CC disagree: $local vs $distributed")
    local
  }

  test("path graph collapses to its minimum (needs transitive propagation)") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("disjoint cliques keep separate representatives") {
    val cliqueA = for (i <- 0 to 3; j <- i + 1 to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 13; j <- i + 1 to 13) yield (i.toLong, j.toLong)
    val got = run(cliqueA ++ cliqueB)
    assert((0L to 3L).forall(got(_) == 0L))
    assert((10L to 13L).forall(got(_) == 10L))
  }

  test("random graph matches union-find ground truth") {
    val rnd = new scala.util.Random(42)
    val n = 500
    val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val got = run(edges)
    val want = unionFind(n, edges)
    assert(got == want)
  }

  test("self-loops and duplicate/reversed edges are harmless; empty input returns empty") {
    val got = run(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d").count() == 0)
  }
}
