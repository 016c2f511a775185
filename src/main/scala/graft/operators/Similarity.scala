package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus row, per-query window top-k. Scales linearly in the
  * corpus: one pass, no corpus self-join.
  *
  * Scale path: random-hyperplane LSH — 16 sign bits per vector form a
  * bucket; candidates only join within a bucket, so the pair space shrinks
  * ~2^16 for near-dup search. Multi-probe/repetition can be layered on by
  * unioning several independent bucket sets (seed parameter).
  */
object Similarity {

  /** Sum of squares / dot products as codegen'd higher-order functions,
    * computed in double.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbors for each query vector.
    * Output: (query_id, rank, neighbor_id, cos) — rank ties broken by
    * neighbor id for determinism.
    */
  def topKCosine(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic random hyperplanes (fixed seed) for sign-bit LSH. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** 16-bit random-hyperplane bucket id per vector. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p.toSeq)) > 0, lit(1L << i)).otherwise(lit(0L)): Column
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate near-neighbor pairs: candidates share a sign-bit bucket in
    * at least one of `tables` independent hashings (multi-table LSH — a
    * single table's recall at moderate similarity is near zero), then exact
    * cosine verification against the threshold. Recall for similarity s:
    * 1 - (1 - (1 - acos(s)/pi)^bits)^tables.
    */
  def lshNearPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 12, tables: Int = 4): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val bucketed = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      array((0 until tables).map { t =>
        lshBucket(col(vecCol), hyperplanes(dim, bits, seed = 7L + t))
      }: _*).as("buckets"))
      .select(col("id"), col("v"), posexplode(col("buckets")).as(Seq("table", "bucket")))
    val a = bucketed.select(col("id").as("a_id"), col("v").as("a_v"), col("table"), col("bucket"))
    val b = bucketed.select(col("id").as("b_id"), col("v").as("b_v"), col("table"), col("bucket"))
    a.join(b, Seq("table", "bucket"))
      .where(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"), cosine(col("a_v"), col("b_v")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Exact cosine pairs over the full corpus (for verification / small n —
    * O(n²), do not run on the full 100 TB corpus).
    */
  def brutePairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("a_id"), col(vecCol).as("a_v"))
    val b = corpus.select(col(idCol).as("b_id"), col(vecCol).as("b_v"))
    a.crossJoin(b).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("a_v"), col("b_v")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
