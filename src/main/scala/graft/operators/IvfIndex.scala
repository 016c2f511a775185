package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index — the production form of [[Similarity.ivfTopK]],
  * which (as a gate) trains and assigns in the same job as the search. A
  * real deployment builds the index ONCE over the corpus and serves many
  * query batches from it; at 100 TB re-clustering per query batch is the
  * difference between an index and a table scan.
  *
  * Layout on storage:
  *   - `dir/centroids`   — (cell, centroid: array<double>), nlist rows
  *   - `dir/assignments` — (id, vec) parquet PARTITIONED BY cell
  *
  * Search loads only the centroids to the driver (nlist × dim doubles,
  * KBs), computes each query's nProbe cells, and joins the broadcast
  * probe set against the assignments on the PARTITION column — dynamic
  * partition pruning reads only the probed ~nProbe/nlist of the index
  * files, which is the IVF contract realized at the storage layer (the
  * reference's per-batch vector pages play the same role for its scans,
  * /root/reference/memstore/archive_store.go).
  */
object IvfIndex {

  /** Cluster the corpus and write the index. Deterministic for a fixed
    * corpus (hash-sampled centroids + fixed Lloyd rounds).
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int,
      dir: String, refineIterations: Int = 2): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sampled = Similarity.ivfCentroids(corpus, idCol, vecCol, nlist)
    val centroids =
      if (refineIterations > 0)
        Similarity.refineCentroids(corpus, idCol, vecCol, sampled, refineIterations)
      else sampled
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    Similarity.assignCells(
        corpus.select(col(idCol), col(vecCol)), idCol, vecCol, centroids)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(s"$dir/assignments")
  }

  /** Load the centroids (tiny driver collect — the only non-distributed
    * piece of a search).
    */
  def centroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(s"$dir/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)

  /** Top-k cosine neighbors for each query from the persisted index.
    * Output: (query_id, rank, neighbor_id, cos) — same contract as
    * [[Similarity.ivfTopK]], same recall trade (pairs whose cells are not
    * probed are missed).
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val scored = probedPairs(spark, dir, queries, idCol, vecCol, nProbe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Radius search from the persisted index: every indexed vector with
    * cosine ≥ `minCosine` among the probed cells — the scale path of
    * [[Similarity.rangeSearch]] (which scans the whole corpus): the
    * threshold filter runs only over the ~nProbe/nlist partition-pruned
    * slice, with the same recall trade as [[search]].
    * Output: (query_id, neighbor_id, cos).
    */
  def searchRange(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, minCosine: Double, nProbe: Int): DataFrame =
    probedPairs(spark, dir, queries, idCol, vecCol, nProbe)
      .where(col("cos") >= minCosine)

  /** Shared probe scaffold: broadcast each query's nProbe cells against
    * the cell-partitioned assignments (dynamic partition pruning reads
    * only the probed files) and score the surviving pairs.
    */
  private def probedPairs(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val cents = centroids(spark, dir)
    val assigned = spark.read.parquet(s"$dir/assignments")
    val q = Similarity.probeCells(queries, idCol, vecCol, cents, nProbe)
    assigned.join(broadcast(q), "cell")
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        Similarity.cosine(col("q_vec"), col(vecCol)).as("cos"))
  }
}
