package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("sign matrix is deterministic and balanced-ish") {
    assert(Projection.sign(0, 0) == Projection.sign(0, 0))
    val signs = for (i <- 0 until 64; j <- 0 until 8) yield Projection.sign(i, j)
    val pos = signs.count(_ > 0)
    assert(pos > 180 && pos < 330, s"suspiciously unbalanced: $pos of ${signs.size}")
  }

  test("projection matches the hand-computed fold") {
    val v = Seq(1f, 2f, 3f)
    val got = Seq(Tuple1(v)).toDF("vec")
      .select(Projection.project(col("vec"), inDim = 3, outDim = 2))
      .collect().head.getSeq[Double](0)
    val scale = 1.0 / math.sqrt(2.0)
    val want = (0 until 2).map { j =>
      (0 until 3).map(i => v(i).toDouble * Projection.sign(i, j) * scale).sum
    }
    assert(got == want, s"$got vs $want")
  }

  test("JL projection approximately preserves pairwise cosine structure") {
    // the statistical contract: after 64->16 projection, planted
    // near-identical pairs stay far more similar than random pairs
    val emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 60)
    val proj = Projection.reduce(emb, "embedding", 64, 16)
      .select(col("vec_id"), col("embedding").as("p"))
    val pairs = proj.as("a").join(proj.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        graft.functions.VectorOps.cosineDouble(col("a.p"), col("b.p")).as("pc"))
    // correlation proxy — the top-5 original-cosine pairs must keep
    // projected cosine above the median projected cosine
    val o = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        graft.functions.VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("oc"))
    val joined = o.join(pairs.withColumnRenamed("pc", "pc")
        .toDF("x", "y", "pc"), Seq("x", "y"))
      .select("oc", "pc").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val topOrig = joined.sortBy(-_._1).take(5).map(_._2)
    val medianProj = joined.map(_._2).sorted.apply(joined.length / 2)
    assert(topOrig.forall(_ > medianProj),
      s"top original pairs lost similarity under projection: ${topOrig.toSeq} vs median $medianProj")
  }

  test("jlRerankTopK surfaces exact planted copies at rank 1") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 100000)
    val out = Similarity.jlRerankTopK(emb, "vec_id", "embedding", queries,
        k = 3, inDim = 64, outDim = 16, candK = 10, nlist = 8, nProbe = 4)
      .where(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    (0 until 5).foreach { i =>
      assert(out.get(i + 100000L).contains(i.toLong),
        s"query ${i + 100000} should find its exact copy at rank 1: $out")
    }
  }

  test("fitPca recovers hand-computed axis-aligned components") {
    // mean 0; cov = diag(2/4, 0.5/4) -> eigenvalues (0.5, 0.125),
    // components e1 then e2, both sign-canonicalized positive
    val pts = Seq(Seq(1f, 0f), Seq(-1f, 0f), Seq(0f, 0.5f),
      Seq(0f, -0.5f), Seq(0f, 0f))
    val df = pts.map(Tuple1(_)).toDF("vec")
    val m = Projection.fitPca(df, "vec", inDim = 2, k = 2)
    assert(m.mean.forall(v => math.abs(v) < 1e-12), m.mean.toSeq.toString)
    assert(math.abs(m.eigenvalues(0) - 0.5) < 1e-9 &&
      math.abs(m.eigenvalues(1) - 0.125) < 1e-9, m.eigenvalues.toSeq.toString)
    assert(math.abs(m.components(0)(0) - 1.0) < 1e-9 &&
      math.abs(m.components(0)(1)) < 1e-9, m.components(0).toSeq.toString)
    assert(math.abs(m.components(1)(1) - 1.0) < 1e-9, m.components(1).toSeq.toString)
  }

  test("fitPca on the embeddings fixture: orthonormal, descending, beats axes") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = Projection.fitPca(emb, "embedding", inDim = 64, k = 8)
    // orthonormal rows
    for (a <- 0 until 8; b <- a until 8) {
      val dot = (0 until 64).map(i => m.components(a)(i) * m.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"W[$a]·W[$b] = $dot")
    }
    // eigenvalues descending, non-negative
    m.eigenvalues.sliding(2).foreach { case Array(x, y) =>
      assert(x >= y - 1e-12, m.eigenvalues.toSeq.toString)
    }
    assert(m.eigenvalues.last >= -1e-9)
    // optimality vs ANY k coordinate axes: top-8 eigenvalue mass >= the
    // top-8 per-dimension variances
    val axisVars = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim").agg(var_samp(col("v")).as("s"))
      .collect().map(_.getDouble(1)).sorted.reverse.take(8).sum
    assert(m.eigenvalues.sum >= axisVars - 1e-9,
      s"${m.eigenvalues.sum} vs axis $axisVars")
  }

  test("pcaProject equals the hand-computed centered fold") {
    val pts = Seq(Seq(1f, 2f, 3f), Seq(3f, 2f, 1f), Seq(2f, 2f, 2f),
      Seq(0f, 1f, 5f))
    val df = pts.map(Tuple1(_)).toDF("vec")
    val m = Projection.fitPca(df, "vec", inDim = 3, k = 2)
    val got = df.select(Projection.pcaProject(col("vec"), m).as("p"))
      .collect().map(_.getSeq[Double](0))
    pts.zip(got).foreach { case (v, p) =>
      (0 until 2).foreach { j =>
        val want = (0 until 3)
          .map(i => (v(i).toDouble - m.mean(i)) * m.components(j)(i)).sum
        assert(math.abs(p(j) - want) < 1e-9, s"$v dim $j: ${p(j)} vs $want")
      }
    }
  }
}
