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

  /** Append a batch of new vectors to an existing index WITHOUT rebuilding:
    * assign each to its nearest existing centroid and append files under
    * the matching cell partitions. The production maintenance path — at
    * corpus scale an index is built once and grows incrementally; searches
    * pick the new files up on their next partition read, and the probe
    * math is unchanged because the centroids are. (Centroid drift from
    * accumulated appends is the documented trade — FAISS's add-with-ids
    * makes the same one; rebuild when cell-size skew says so, cheaply
    * observable from the partition file sizes.)
    */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val cents = centroids(spark, dir)
    Similarity.assignCells(batch.select(col(idCol), col(vecCol)),
        idCol, vecCol, cents)
      .write.mode(SaveMode.Append)
      .partitionBy("cell")
      .parquet(s"$dir/assignments")
  }

  /** Fold fragmented cell partitions back to `targetFiles` files each —
    * [[append]] adds a file set per batch per cell without bound (the
    * [[graft.operators.TextIndex.compact]] situation over `cell=`
    * partitions). Probe results are invariant: a search scores the
    * probed cells' vector multiset, which compaction preserves; only
    * file counts (listing cost, task counts) shrink. Crash-safe via the
    * shared Compactor temp-write + rename swap; cells within budget are
    * untouched.
    */
  def compact(spark: SparkSession, dir: String, maxFiles: Int = 8,
      targetFiles: Int = 1): Seq[graft.ingest.Compactor.DayReport] =
    graft.ingest.Compactor.compact(spark, s"$dir/assignments",
      sortCols = Nil, maxFiles = maxFiles, targetFiles = targetFiles,
      partitionPrefix = "cell=")

  /** Top-k cosine neighbors for each query from the persisted index.
    * Output: (query_id, rank, neighbor_id, cos) — same contract as
    * [[Similarity.ivfTopK]], same recall trade (pairs whose cells are not
    * probed are missed).
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame =
    search(spark, dir, centroids(spark, dir), queries, idCol, vecCol, k, nProbe)

  /** [[search]] with pre-loaded centroids — a caller sweeping nProbe (the
    * recall-tuning loop) loads the nlist×dim model once instead of paying
    * a parquet read + driver collect per sweep point (r15).
    */
  def search(spark: SparkSession, dir: String, cents: Array[Array[Double]],
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    val scored = probedPairs(spark, dir, cents, queries, idCol, vecCol, nProbe)
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
    probedPairs(spark, dir, centroids(spark, dir), queries, idCol, vecCol,
      nProbe).where(col("cos") >= minCosine)

  /** Shared probe scaffold: broadcast each query's nProbe cells against
    * the cell-partitioned assignments (dynamic partition pruning reads
    * only the probed files) and score the surviving pairs.
    */
  private def probedPairs(spark: SparkSession, dir: String,
      cents: Array[Array[Double]], queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val assigned = spark.read.parquet(s"$dir/assignments")
    val q = Similarity.probeCells(queries, idCol, vecCol, cents, nProbe)
    assigned.join(broadcast(q), "cell")
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        Similarity.cosine(col("q_vec"), col(vecCol)).as("cos"))
  }

  // ---- IVF-SQ8: coarse cells + scalar-quantized residual codes ----------

  /** Build the IVF-SQ8 index: coarse cells as in [[build]], but members
    * store d 8-bit [[Sq]] codes of their RESIDUAL (vector − cell centroid)
    * instead of the raw floats — 4× smaller at rest, and residual
    * magnitudes are a fraction of vector magnitudes so the 255-level
    * per-dimension grid quantizes far finer than it would raw (the same
    * residual trick [[Pq.ivfpqTopK]] uses, FAISS's `IndexIVFScalarQuantizer`
    * with by-residual encoding). This is the composition that turns [[Sq]]
    * from a compression layer into a search structure: [[Sq.adcTopK]] scans
    * the whole corpus per query batch, while [[searchSq8]] touches only the
    * probed ~nProbe/nlist cell partitions via dynamic partition pruning.
    *
    * Layout on storage:
    *   - `dir/centroids` — (cell, centroid: array<double>), nlist rows
    *   - `dir/sqbounds`  — one row (mins, scales): residual-trained
    *                       per-dimension affine bounds (2·d doubles)
    *   - `dir/codes`     — (id, codes: array<int>) parquet PARTITIONED BY
    *                       cell
    *
    * Scale shape: one assignment pass over the corpus (centroids
    * broadcast), the bounds pass partial-aggregates min/max map-side
    * (shuffle carries d rows per partition — see [[Sq.train]]), encode is
    * map-side; the assignment UDF runs once per row (the residual frame is
    * checkpointed across the bounds and encode consumers, then released).
    */
  def buildSq8(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int,
      dir: String, refineIterations: Int = 2): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sampled = Similarity.ivfCentroids(corpus, idCol, vecCol, nlist)
    val cents =
      if (refineIterations > 0)
        Similarity.refineCentroids(corpus, idCol, vecCol, sampled, refineIterations)
      else sampled
    cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    val centsB = spark.sparkContext.broadcast(cents)
    val residUdf = udf { (vec: Seq[Float], cell: Int) =>
      val c = centsB.value(cell)
      val n = math.min(vec.length, c.length)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = vec(i).toDouble - c(i); i += 1 }
      out
    }
    val resid = Similarity.assignCells(
        corpus.select(col(idCol), col(vecCol)), idCol, vecCol, cents)
      .withColumn("__resid", residUdf(col(vecCol), col("cell")))
      .select(col(idCol), col("cell"), col("__resid"))
      .localCheckpoint(true)
    try {
      val bounds = Sq.train(resid, "__resid")
      Seq((bounds.mins.toSeq, bounds.scales.toSeq)).toDF("mins", "scales")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/sqbounds")
      val enc = udf { (r: Seq[Double]) =>
        val n = math.min(r.length, bounds.mins.length)
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = Sq.quantize(r(i), bounds.mins(i), bounds.scales(i))
          i += 1
        }
        out
      }
      resid.select(col(idCol), col("cell"), enc(col("__resid")).as("codes"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("cell")
        .parquet(s"$dir/codes")
    } finally Staged.releaseCheckpoint(resid)
  }

  /** ADC top-k from the persisted IVF-SQ8 index: squared L2 between each
    * TRUE (unquantized) query vector and `centroid(cell) + dequantized
    * residual` for every member of the query's nProbe nearest cells,
    * smallest first, ties broken by neighbor id; self-ids excluded (same
    * contract as [[Sq.adcTopK]]). The probe join keys on the `cell`
    * partition column, so dynamic partition pruning reads only the probed
    * ~nProbe/nlist of the code files; only the nlist centroids and 2·d
    * bounds reach the driver. Output: (query_id, rank, neighbor_id,
    * adc_dist).
    */
  def searchSq8(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cents = centroids(spark, dir)
    val bRow = spark.read.parquet(s"$dir/sqbounds").collect().head
    val bounds = Sq.Bounds(bRow.getSeq[Double](0).toArray,
      bRow.getSeq[Double](1).toArray)
    val codes = spark.read.parquet(s"$dir/codes")
    val q = Similarity.probeCells(queries, idCol, vecCol, cents, nProbe)
    val adc = udf { (qv: Seq[Float], cell: Int, cs: Seq[Int]) =>
      val cent = cents(cell)
      val mins = bounds.mins
      val scales = bounds.scales
      var s = 0.0
      var i = 0
      val n = math.min(qv.length, cs.length)
      while (i < n) {
        val d = qv(i) - cent(i) - Sq.dequantize(cs(i), mins(i), scales(i))
        s += d * d
        i += 1
      }
      s
    }
    val scored = codes.join(broadcast(q), "cell")
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        adc(col("q_vec"), col("cell"), col("codes")).as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"))
  }
}
