package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {

  private val oneHot =
    Array.tabulate(4)(j => Array.tabulate(64)(i => if (i == j) 1.0 else 0.0))

  test("scaled planted copies are all found within their cell") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val copy = emb.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * 2f).as("embedding"))
    val found = Similarity.semanticNearDups(emb.unionByName(copy),
        "vec_id", "embedding", oneHot, threshold = 0.99)
      .where(col("b_id") === col("a_id") + 100000)
      .count()
    assert(found == emb.count(),
      "every vector and its 2x copy share a cell and have cosine 1")
  }

  test("pairs in different cells are not candidates (the recall trade)") {
    import spark.implicits._
    // e1-ish and e2-ish directions: cosine 0 < threshold anyway, but the
    // point is they never meet: different argmax → different cells
    val df = Seq(
      (1L, Array(1f) ++ Array.fill(63)(0f)),
      (2L, Array(0f, 1f) ++ Array.fill(62)(0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDups(df, "vec_id", "embedding", oneHot, -1.0)
    assert(pairs.count() == 0, "cross-cell pairs must not be generated")
  }

  test("the DEFAULT cap bounds a hot cell by the pair budget") {
    import spark.implicits._
    // 2100 identical vectors land in one cell: 2.2M pairs, above the ~2M
    // default pair budget (maxCell ≈ 2000) — the cell must be dropped
    // without an explicit cap from the caller
    assert(Similarity.maxCellForPairBudget(Similarity.DefaultCellPairBudget) <= 10000)
    val hot = (1L to 2100L).map(i => (i, Array(1f) ++ Array.fill(63)(0f)))
    val df = hot.toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDups(df, "vec_id", "embedding", oneHot,
      threshold = 0.99)
    assert(pairs.count() == 0, "a 2100-vector cell exceeds the default pair-budget cap")
  }

  test("degenerate cells are dropped by the cap before the self-join") {
    import spark.implicits._
    val same = (1L to 50L).map(i => (i, Array(1f) ++ Array.fill(63)(0f)))
    val df = same.toDF("vec_id", "embedding")
    val capped = Similarity.semanticNearDups(df, "vec_id", "embedding", oneHot,
      threshold = 0.99, maxCell = 10)
    assert(capped.count() == 0, "a 50-vector cell exceeds maxCell=10")
  }
}
