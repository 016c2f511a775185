package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)

  test("train produces an m x k codebook of d/m-dim centroids") {
    val book = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    assert(book.length == 8)
    assert(book.forall(_.length == 16))
    assert(book.forall(_.forall(_.length == 8))) // 64 / 8
    assert(book.flatten.flatten.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("training is deterministic") {
    val a = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val b = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
  }

  test("encode assigns every row m codes in [0, k)") {
    val book = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    val codes = Pq.encode(emb, "vec_id", "embedding", book)
    assert(codes.count() == emb.count())
    val bad = codes.where(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
  }

  test("ADC top-1 recovers a planted exact copy of each query") {
    // the test embeddings are geometrically unclustered (labels are not
    // neighborhoods — exact L2 top-1 crosses labels 9/10 times), so the
    // recall contract plants EXACT copies: a copy shares all m codes with
    // its source, and for random data its ADC distance (the query's own
    // quantization error) is far below any other row's.
    val book = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    val queries = emb.where(col("vec_id") < 10)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(queries.select((col("vec_id") + 100000).as("vec_id"),
        col("embedding")))
    val codes = Pq.encode(corpus, "vec_id", "embedding", book)
    val top1 = Pq.adcTopK(codes, "vec_id", queries, "vec_id", "embedding", book, 1)
    val hits = top1.where(col("neighbor_id") === col("query_id") + 100000).count()
    assert(top1.count() == 10)
    assert(hits == 10, s"only $hits/10 queries recovered their planted copy at rank 1")
  }

  test("training caps at maxTrain via a deterministic id-hash sample") {
    val a = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2, maxTrain = 50)
    val b = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2, maxTrain = 50)
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
    assert(a.length == 4 && a.forall(_.length == 8))
    assert(a.flatten.flatten.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("IVF-PQ top-1 recovers a planted exact copy through the probed cells") {
    // an exact copy lands in the same coarse cell as its source probes
    // first, has an identical residual, hence identical codes — its ADC
    // distance is the query's own quantization error, below any other row
    val queries = emb.where(col("vec_id") < 10)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(queries.select((col("vec_id") + 100000).as("vec_id"),
        col("embedding")))
    val top1 = Pq.ivfpqTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1, nlist = 16, nProbe = 2)
    val hits = top1.where(col("neighbor_id") === col("query_id") + 100000).count()
    assert(top1.count() == 10)
    assert(hits == 10, s"only $hits/10 queries recovered their planted copy at rank 1")
  }
}
