package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // --- KMV ----------------------------------------------------------------

  test("kmv: below k the sketch is the exact sorted hashed set") {
    val df = Seq("a", "b", "c", "b", "a").toDF("x").repartition(3)
    val sk = df.agg(Sketches.kmv(col("x"), 16)).collect().head.getSeq[Long](0)
    val expect = Seq("a", "b", "c").map(Sketches.hash60).sorted
    assert(sk == expect)
  }

  test("kmv: hash matches Spark's own md5/conv arithmetic") {
    val viaCol = Seq("hello world").toDF("x")
      .select(Sketches.hash60Col(col("x"))).collect().head.getLong(0)
    assert(viaCol == Sketches.hash60("hello world"))
  }

  test("kmv: estimate within 15% on 20k distinct values; partitioning-invariant") {
    val df = (0 until 20000).map(i => s"value_$i").toDF("x")
    val k = 256
    val est = df.repartition(7)
      .agg(Sketches.kmvEstimate(Sketches.kmv(col("x"), k), k))
      .collect().head.getDouble(0)
    assert(math.abs(est - 20000) < 3000, s"estimate $est")
    val a = df.repartition(2).agg(Sketches.kmv(col("x"), k)).collect().head.getSeq[Long](0)
    val b = df.repartition(13).agg(Sketches.kmv(col("x"), k)).collect().head.getSeq[Long](0)
    assert(a == b, "sketch must not depend on partitioning")
  }

  test("kmv: combine estimates jaccard of overlapping sets") {
    val k = 128
    val left = (0 until 3000).map(i => s"v$i")
    val right = (1500 until 4500).map(i => s"v$i") // true jaccard = 1500/4500 = 1/3
    val df = left.map(("L", _)).union(right.map(("R", _))).toDF("s", "x")
    val sk = df.groupBy("s").agg(Sketches.kmv(col("x"), k).as("sk"))
    val row = sk.where($"s" === "L").select($"sk".as("a"))
      .crossJoin(sk.where($"s" === "R").select($"sk".as("b")))
      .select(Sketches.kmvCombine(col("a"), col("b"), k).as("c"))
      .select($"c.shared", $"c.usize").collect().head
    val jacc = row.getInt(0).toDouble / row.getInt(1)
    assert(math.abs(jacc - 1.0 / 3) < 0.12, s"jaccard estimate $jacc")
  }

  // --- Bloom --------------------------------------------------------------

  test("bloom: zero false negatives, deterministic membership, partitioning-invariant") {
    val members = (0 until 500).map(i => s"gram_$i")
    val df = members.toDF("x")
    val m = 8192; val s = 3
    def bits(parts: Int) = df.repartition(parts)
      .agg(Sketches.bloom(col("x"), m, s)).collect().head.getSeq[Int](0)
    val b2 = bits(2); val b11 = bits(11)
    assert(b2 == b11, "bitset must not depend on partitioning")
    // no false negatives: every member probes true
    val probe = members.toDF("x")
      .crossJoin(df.agg(Sketches.bloom(col("x"), m, s).as("bf")))
      .where(!Sketches.bloomMightContain(col("bf"), col("x"), m, s))
      .count()
    assert(probe == 0, s"$probe false negatives")
    // false positive rate is low at this load factor (500*3/8192 bits set)
    val fp = (0 until 2000).map(i => s"absent_$i").toDF("x")
      .crossJoin(df.agg(Sketches.bloom(col("x"), m, s).as("bf")))
      .where(Sketches.bloomMightContain(col("bf"), col("x"), m, s))
      .count()
    assert(fp < 100, s"false positive count $fp out of 2000")
  }

  // --- Count-Min ----------------------------------------------------------

  test("cms: never undercounts, exact for isolated keys, partitioning-invariant") {
    val data = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"tok_$i"))
    val df = data.toDF("x")
    val w = 1024; val d = 4
    def sketch(parts: Int) = df.repartition(parts)
      .agg(Sketches.cms(col("x"), w, d)).collect().head.getSeq[Long](0)
    assert(sketch(3) == sketch(9), "counters must not depend on partitioning")
    val probes = (0 until 50).map(i => s"tok_$i").toDF("x")
    val ests = probes
      .crossJoin(df.agg(Sketches.cms(col("x"), w, d).as("sk")))
      .select(col("x"), Sketches.cmsEstimate(col("sk"), col("x"), w, d).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 50).foreach { i =>
      val truth = i + 1L
      val est = ests(s"tok_$i")
      assert(est >= truth, s"tok_$i undercounted: $est < $truth")
      // 50 keys in 1024 buckets: collisions are rare; total mass bound
      assert(est <= truth + data.size, s"tok_$i implausible: $est")
    }
  }

  test("cms: estimate bounded by true + eps*N with planted heavy key") {
    val heavy = Seq.fill(5000)("heavy")
    val light = (0 until 400).flatMap(i => Seq.fill(3)(s"light_$i"))
    val df = scala.util.Random.shuffle(heavy ++ light).toDF("x").repartition(8)
    val w = 1024; val d = 4
    val est = df.agg(Sketches.cms(col("x"), w, d).as("sk"))
      .select(Sketches.cmsEstimate(col("sk"), lit("heavy"), w, d))
      .collect().head.getLong(0)
    val n = heavy.size + light.size
    assert(est >= 5000 && est <= 5000 + 2L * n / w * 10,
      s"heavy estimate $est outside CMS bound")
  }
}
