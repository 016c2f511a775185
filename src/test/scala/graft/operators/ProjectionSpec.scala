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
}
