package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {

  test("pageRank matches the hand-iterated values on a 3-node path") {
    import spark.implicits._
    // undirected path 1–2–3 (symmetrized): deg(1)=deg(3)=1, deg(2)=2
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("s", "d")
    val got = GraphRank.pageRank(edges, "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand iteration, damping .85, uniform 1/3 start:
    // r1(1) = .15/3 + .85*(r0(2)/2)        = .05 + .85/6
    // r1(2) = .15/3 + .85*(r0(1) + r0(3))  = .05 + .85*2/3
    // r1(3) = r1(1)
    val r11 = 0.05 + 0.85 * (1.0 / 3 / 2)
    val r12 = 0.05 + 0.85 * (2.0 / 3)
    val r21 = 0.05 + 0.85 * (r12 / 2)
    val r22 = 0.05 + 0.85 * (r11 + r11)
    assert(math.abs(got(1L) - r21) < 1e-12, s"$got vs $r21")
    assert(math.abs(got(2L) - r22) < 1e-12)
    assert(math.abs(got(3L) - r21) < 1e-12)
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      "rank mass is conserved on a dangling-free graph")
  }

  test("pageRank centrality: the hub of a star outranks the spokes") {
    import spark.implicits._
    val spokes = (2L to 9L)
    val edges = (spokes.map(s => (1L, s)) ++ spokes.map(s => (s, 1L))).toDF("s", "d")
    val got = GraphRank.pageRank(edges, "s", "d", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(spokes.forall(s => got(1L) > got(s) * 3),
      s"hub must dominate: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank handles sinks: dangling mass redistributes, totals stay 1") {
    import spark.implicits._
    // 1 → 2, node 2 is a pure sink (appears only as a destination)
    val edges = Seq((1L, 2L)).toDF("s", "d")
    val got = GraphRank.pageRank(edges, "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand iteration, damping .85, n=2, uniform 1/2 start:
    // iter1: dm = r0(2) = .5; r1(1) = .075 + .85*(.5/2)        = .2875
    //                         r1(2) = .075 + .85*(.5 + .5/2)   = .7125
    // iter2: dm = r1(2);      r2(1) = .075 + .85*(.7125/2)     = .3778125
    //                         r2(2) = .075 + .85*(.2875 + .7125/2)
    assert(got.keySet == Set(1L, 2L), s"dst-only node must hold rank: $got")
    assert(math.abs(got(1L) - 0.3778125) < 1e-12, s"$got")
    assert(math.abs(got(2L) - 0.6221875) < 1e-12, s"$got")
    assert(math.abs(got.values.sum - 1.0) < 1e-12,
      "rank mass must be conserved on a sink-bearing graph")
  }

  test("pageRank keeps teleport mass for zero-in-degree nodes") {
    import spark.implicits._
    // 1 → 2 → 3: node 1 has no in-links and must keep (1-d)/n + dangling
    // share every iteration, not drop out of the rank table
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val got = GraphRank.pageRank(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) > 0, s"zero-in-degree node lost its rank: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // chain order: the sink accumulates, the source holds least
    assert(got(3L) > got(2L) && got(2L) > got(1L), s"$got")
  }

  test("weighted pageRank flows rank proportionally to edge weight") {
    import spark.implicits._
    // node 1 sends 3/4 of its mass to 2 and 1/4 to 3 (weights 3 and 1);
    // 2 and 3 each return everything to 1. One iteration, by hand.
    val edges = Seq(
      (1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0))
      .toDF("s", "d", "w")
    val got = GraphRank.pageRank(edges, "s", "d", iters = 1,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val t = 0.15 / 3
    assert(math.abs(got(1L) - (t + 0.85 * (1.0 / 3 + 1.0 / 3))) < 1e-12, got.toString)
    assert(math.abs(got(2L) - (t + 0.85 * (1.0 / 3 * 3 / 4))) < 1e-12, got.toString)
    assert(math.abs(got(3L) - (t + 0.85 * (1.0 / 3 * 1 / 4))) < 1e-12, got.toString)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("weighted pageRank with unit weights equals the unweighted path") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L))
      .toDF("s", "d")
    val unweighted = GraphRank.pageRank(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val unit = GraphRank.pageRank(edges.withColumn("w", lit(1.0)), "s", "d",
        iters = 3, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(unweighted == unit, s"$unweighted vs $unit")
  }

  test("freqSpectrum buckets exactly at powers of two") {
    import spark.implicits._
    // token a ×1 (bucket 0), b ×2 (bucket 1), c ×4 (bucket 2), d ×7 (bucket 2)
    val df = Seq("a b b", "c c c c d d d", "d d d d").toDF("text")
    val got = TextRank.freqSpectrum(df, "text")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(0 -> ((1L, 1L)), 1 -> ((1L, 2L)), 2 -> ((2L, 11L))))
  }

  test("kCenterSelect picks one point per planted orthogonal cluster first") {
    import spark.implicits._
    // 4 tight clusters along orthogonal axes; 3 points each. Greedy
    // farthest-point must cover all 4 clusters within the first 4 picks
    // (cosine distance between clusters = 1, within ≈ 0).
    val pts = for {
      c <- 0 until 4
      j <- 0 until 3
    } yield {
      val v = Array.fill(8)(0.001f * (j + 1))
      v(c * 2) = 1f
      ((c * 10 + j).toLong, v.toSeq)
    }
    val df = pts.toDF("id", "vec")
    val sel = Similarity.kCenterSelect(df, "id", "vec", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), Option(r.get(2))))
    assert(sel.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(sel.map(_._2 / 10).toSet == Set(0L, 1L, 2L, 3L),
      s"first 4 picks must cover the 4 clusters: ${sel.toSeq}")
    assert(sel.head._3.isEmpty, "seed has no radius")
    val radii = sel.tail.map(_._3.get.asInstanceOf[Double]).toSeq
    assert(radii == radii.sorted.reverse,
      s"coverage radius must be non-increasing: ${radii.toSeq}")
    // 5th pick falls inside a covered cluster → radius collapses near 0
    val five = Similarity.kCenterSelect(df, "id", "vec", k = 5)
      .collect().map(r => Option(r.get(2))).last.get.asInstanceOf[Double]
    assert(five < 0.1, s"5th radius must be within-cluster: $five")
  }

  // --- HITS ---------------------------------------------------------------

  test("hits matches the hand-iterated hub/authority values") {
    import spark.implicits._
    // 1 → {3,4}, 2 → 3. Uniform auth₀ = 1:
    // hub₁ raw  = (2, 1, 0, 0), L1 → (2/3, 1/3, 0, 0)
    // auth₁ raw = a(3)=hub(1)+hub(2)=1, a(4)=hub(1)=2/3, L1 sum 5/3
    //           → auth = (0, 0, 3/5, 2/5)
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L)).toDF("s", "d")
    val got = GraphRank.hits(edges, "s", "d", iters = 1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(math.abs(got(1L)._1 - 2.0 / 3) < 1e-12, s"$got")
    assert(math.abs(got(2L)._1 - 1.0 / 3) < 1e-12)
    assert(got(3L)._1 == 0.0 && got(4L)._1 == 0.0,
      "nodes without out-edges hold hub 0")
    assert(math.abs(got(3L)._2 - 0.6) < 1e-12, s"$got")
    assert(math.abs(got(4L)._2 - 0.4) < 1e-12)
    assert(got(1L)._2 == 0.0 && got(2L)._2 == 0.0,
      "nodes without in-links hold authority 0")
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-12 &&
      math.abs(got.values.map(_._2).sum - 1.0) < 1e-12,
      "both score vectors are L1-normalized every iteration")
  }

  test("hits separates hubs from authorities where pageRank cannot") {
    import spark.implicits._
    // directory d links to every content site; sites never link back.
    // HITS: d is the unique hub, contents split authority; pageRank would
    // give d only teleport mass.
    val contents = (10L to 14L)
    val edges = contents.map(c => (1L, c)).toDF("s", "d")
    val got = GraphRank.hits(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 1.0, s"sole out-linker takes all hub mass: $got")
    contents.foreach { c =>
      assert(math.abs(got(c)._2 - 0.2) < 1e-12,
        s"authority splits evenly over targets: $got")
    }
  }
}
