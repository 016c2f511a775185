package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{IvfIndex, Pq}
import org.apache.spark.sql.functions._

/** Build-once ANN fixtures: the cached model is bit-exact against a fresh
  * training run (determinism is what makes the cache sound), and the
  * persisted index directory is promoted once and never rebuilt while the
  * source fingerprint holds.
  */
class AnnFixturesSpec extends SparkSpec {

  test("cached PQ codebook is bit-exact vs fresh training and stable across reads") {
    val cached = AnnFixtures.pqBook(spark, sfDir, m = 4, k = 8, iters = 2)
    val fresh = Pq.train(Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      m = 4, k = 8, iters = 2)
    assert(java.util.Arrays.deepEquals(
      cached.asInstanceOf[Array[AnyRef]], fresh.asInstanceOf[Array[AnyRef]]),
      "cached codebook diverged from a fresh deterministic training run")
    val again = AnnFixtures.pqBook(spark, sfDir, m = 4, k = 8, iters = 2)
    assert(java.util.Arrays.deepEquals(
      cached.asInstanceOf[Array[AnyRef]], again.asInstanceOf[Array[AnyRef]]))
  }

  test("ivf index dir is built once and serves searches") {
    val d1 = AnnFixtures.ivfIndexDir(spark, sfDir, nlist = 8)
    val marker = java.nio.file.Paths.get(d1, "centroids", "_SUCCESS")
    assert(java.nio.file.Files.exists(marker))
    val mtime = java.nio.file.Files.getLastModifiedTime(marker)
    val d2 = AnnFixtures.ivfIndexDir(spark, sfDir, nlist = 8)
    assert(d1 == d2)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == mtime,
      "second call rebuilt the index")
    val emb = Tables.embeddings(spark, sfDir)
    val hits = IvfIndex.search(spark, d1, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 3, nProbe = 4)
    assert(hits.count() > 0)
  }
}
