package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the standard billion-scale compression
  * layer under IVF: each d-dim vector is split into `m` subvectors, each
  * subvector is vector-quantized against its own `k`-centroid codebook, and
  * a vector is stored as `m` small codes (m bytes at k=256) instead of d
  * floats. Query-time ADC (asymmetric distance computation) scores a code
  * against a query with `m` table lookups instead of d multiplies.
  *
  * Scale design (100 TB):
  *  - TRAINING is distributed Lloyd per subspace: one `posexplode` pass
  *    turns the corpus into (subspace, subvector) rows; each iteration is
  *    one broadcast-assign map pass + one groupBy((subspace, code))
  *    aggregation into m·k cells. Only the m·k·(d/m) = k·d floats of the
  *    codebook ever reach the driver.
  *  - ENCODE is a map-side pass with the codebook broadcast; output codes
  *    are `array<int>` (k ≤ 256 fits a byte; int keeps the gate SQL
  *    simple).
  *  - ADC SEARCH broadcasts the (small) query set, precomputes each
  *    query's m·k lookup table ONCE per executor via a lazily-initialized
  *    broadcast, and scores each corpus code with m array lookups — no
  *    per-row distance in the original d-dim space, no corpus shuffle
  *    until the per-query top-k window on (dist, id).
  *
  * Determinism: centroid init takes the subvectors of the `k` smallest-id
  * sampled rows and Lloyd runs a FIXED number of iterations with floats
  * upcast to double, so the codebook is a pure function of the input
  * (empty cells keep their previous centroid).
  */
object Pq {

  /** codebook(subspace)(code) = centroid of that cell (length d/m). */
  type Codebook = Array[Array[Array[Double]]]

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def argminCode(sub: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val d = sqDist(sub, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** (id, subspace, subvector) rows — the training/encode layout. */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
      m: Int): DataFrame = {
    val d = col(vecCol)
    val sub = sequence(lit(0), lit(m - 1))
    df.select(col(idCol).as("__id"),
        posexplode(transform(sub, j =>
          slice(d, j * (size(d) / m) + 1, size(d) / m))).as(Seq("j", "sub")))
      .select(col("__id"), col("j"),
        transform(col("sub"), x => x.cast("double")).as("sub"))
  }

  /** Train an (m × k) codebook by `iters` rounds of distributed Lloyd per
    * subspace. Initial centroids are the subvectors of the k smallest-id
    * sampled rows (deterministic).
    *
    * Training is capped at `maxTrain` rows by a deterministic id-hash
    * sample — codebook quality saturates long before the corpus does
    * (k·m cells need ~256 samples each), so at 100 TB the Lloyd passes
    * run over a fixed-size sample while encode/search stay full-corpus.
    *
    * The sample needs no corpus count and no global sort, and is EXACT —
    * the corpus-wide maxTrain smallest (hash, id) pairs, a pure function
    * of the input rows independent of partition layout or skew. Phase 1
    * scans (hash, id) PAIRS only, each partition keeping its smallest
    * maxTrain in a fixed heap (16 bytes × maxTrain ≈ 1 MB per task — the
    * cap any single partition could contribute, so no winner is ever
    * lost to a skewed layout; an earlier 2·maxTrain/numPartitions quota
    * made the sample depend on how rows were split). Phase 2 fetches the
    * winners' vectors with one broadcast semi-join (≤ maxTrain ids).
    * Every later training job runs over the checkpointed sample, never
    * the corpus.
    */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      iters: Int = 5, maxTrain: Int = 65536): Codebook = {
    val spark = df.sparkSession
    val src = df.select(col(idCol).cast("long").as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__vec"))
    // phase 1: (hash, id) pairs only; per-partition max-heap capped at
    // maxTrain — the most any one partition could contribute to the
    // global winners — then the global smallest maxTrain among the
    // survivors (≤ parts × maxTrain pairs, tiny)
    val idsOnly = df.select(xxhash64(col(idCol)).as("__h"),
      col(idCol).cast("long").as("__id"))
    val rowEnc = org.apache.spark.sql.Encoders.row(idsOnly.schema)
    val pruned = idsOnly.mapPartitions { it =>
      val ord = Ordering.by[org.apache.spark.sql.Row, (Long, Long)](r =>
        (r.getLong(0), r.getLong(1)))
      val heap = new scala.collection.mutable.PriorityQueue[org.apache.spark.sql.Row]()(ord)
      it.foreach { r =>
        heap.enqueue(r)
        if (heap.size > maxTrain) heap.dequeue()
      }
      heap.iterator
    }(rowEnc)
    val winners = pruned.orderBy(col("__h"), col("__id")).limit(maxTrain)
    // phase 2: fetch the winners' vectors (broadcast semi-join on ids)
    val sampled = src.join(broadcast(winners.select("__id")), Seq("__id"), "left_semi")
      .localCheckpoint(true)
    val subs = subvectors(sampled, "__id", "__vec", m).localCheckpoint(true)
    // init ids: the k smallest-id SAMPLED rows — a tiny job over the
    // checkpointed sample, not a corpus round-trip. (Smallest-id, not
    // smallest-hash: when the corpus fits in maxTrain the sample is the
    // whole corpus and the codebook is bit-identical to untrained-sample
    // runs; on a hash sample the smallest ids are arbitrary rows anyway.)
    val initIds = sampled.orderBy(col("__id"))
      .limit(k).select("__id").collect().map(_.getLong(0)).toSeq
    val initRows = subs.where(col("__id").isin(initIds: _*))
      .orderBy("j", "__id")
      .collect()
    val dSub = initRows.head.getSeq[Double](2).length
    val book: Codebook = Array.tabulate(m, k)((j, c) => {
      val row = initRows.filter(_.getInt(1) == j).lift(c)
      row.map(_.getSeq[Double](2).toArray).getOrElse(Array.fill(dSub)(0.0))
    })
    var it = 0
    while (it < iters) {
      val bookB = spark.sparkContext.broadcast(book)
      val assign = udf { (j: Int, sub: Seq[Double]) =>
        argminCode(sub.toArray, bookB.value(j))
      }
      // new centroid = per-dimension mean over the cell
      val cells = subs.withColumn("c", assign(col("j"), col("sub")))
        .select(col("j"), col("c"), posexplode(col("sub")).as(Seq("dim", "x")))
        .groupBy("j", "c", "dim").agg(avg("x").as("mu"))
        .groupBy("j", "c")
        .agg(map_from_arrays(collect_list("dim"), collect_list("mu")).as("mus"))
        .collect()
      cells.foreach { r =>
        val (j, c) = (r.getInt(0), r.getInt(1))
        val mus = r.getMap[Int, Double](2)
        book(j)(c) = Array.tabulate(dSub)(i => mus.getOrElse(i, book(j)(c)(i)))
      }
      bookB.destroy()
      it += 1
    }
    // training is fully driver-eager — release the sample checkpoints so
    // repeated training jobs leave no resident blocks
    Staged.releaseCheckpoint(subs)
    Staged.releaseCheckpoint(sampled)
    book
  }

  /** Encode every row's vector as m codes (map-side, codebook broadcast). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      book: Codebook): DataFrame = {
    val spark = df.sparkSession
    val bookB = spark.sparkContext.broadcast(book)
    val m = book.length
    val enc = udf { (vec: Seq[Float]) =>
      val b = bookB.value
      val dSub = vec.length / m
      Array.tabulate(m) { j =>
        val sub = Array.tabulate(dSub)(i => vec(j * dSub + i).toDouble)
        argminCode(sub, b(j))
      }
    }
    df.select(col(idCol), enc(col(vecCol)).as("codes"))
  }

  /** ADC top-k: for each query (raw vector), rank encoded corpus rows by
    * the sum of per-subspace (query-subvector → centroid) squared
    * distances. Ties broken by id. Output: (query_id, rank, neighbor_id,
    * adc_dist).
    */
  def adcTopK(codes: DataFrame, idCol: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, book: Codebook, k: Int): DataFrame = {
    val spark = codes.sparkSession
    val m = book.length
    val kCodes = book.head.length
    // per-query LUT: lut(q)(j)(c) = ||q_sub_j - centroid_jc||²
    val qRows = queries.select(col(qIdCol).cast("long"), col(qVecCol)).collect()
    val luts: Map[Long, Array[Array[Double]]] = qRows.map { r =>
      val qid = r.getLong(0)
      val vec = r.getSeq[Float](1).map(_.toDouble).toArray
      val dSub = vec.length / m
      qid -> Array.tabulate(m, kCodes) { (j, c) =>
        sqDist(java.util.Arrays.copyOfRange(vec, j * dSub, (j + 1) * dSub), book(j)(c))
      }
    }.toMap
    val lutsB = spark.sparkContext.broadcast(luts)
    val qids = luts.keys.toSeq.sorted
    val adc = udf { (qid: Long, codes: Seq[Int]) =>
      val lut = lutsB.value(qid)
      var s = 0.0; var j = 0
      while (j < codes.length) { s += lut(j)(codes(j)); j += 1 }
      s
    }
    import spark.implicits._
    val qidDf = qids.toDF("query_id")
    val scored = codes
      .crossJoin(broadcast(qidDf))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        adc(col("query_id"), col("codes")).as("adc_dist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  // ---- IVF-PQ (the billion-scale composition) -----------------------------

  /** residual = vec − coarse_centroid[cell], kept as float to reuse the
    * encode path (the sub-ulp loss is far below quantization error).
    */
  private def residualUdf(cents: Array[Array[Double]]) =
    udf { (vec: Seq[Float], cell: Int) =>
      val c = cents(cell)
      Array.tabulate(vec.length)(i => (vec(i) - c(i)).toFloat)
    }

  /** IVF-PQ top-k (Jégou et al. §V): corpus vectors are assigned to a
    * coarse cell ([[Similarity.assignCells]]) and their RESIDUALS
    * (vector − cell centroid) are PQ-encoded — residual magnitudes are a
    * fraction of vector magnitudes, so the same codebook budget quantizes
    * much finer. Query-time probes the `nProbe` nearest cells and scores
    * only their members with a per-(query, cell) LUT built from the
    * query's residual against that cell.
    *
    * Scale shape: one assignment pass + one encode pass over the corpus
    * (both map-side, centroids/codebook broadcast); search touches
    * ~nProbe/nlist of the corpus via a broadcast join on the probed cell
    * ids, then one per-query top-k window. Nothing but the nlist
    * centroids, the k·d-float codebook, and the query set ever reaches
    * the driver.
    *
    * Returns (query_id, rank, neighbor_id, adc_dist).
    */
  /** Train the IVF-PQ model alone: coarse centroids + residual codebook.
    * Both are pure functions of the corpus (hash-sampled centroids, fixed
    * Lloyd rounds), so callers may cache them per corpus fingerprint and
    * skip retraining on every query batch — at production scale the model
    * is trained once and served for months.
    */
  private def residFrame(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame =
    Similarity.assignCells(
        corpus.select(col(idCol), col(vecCol)), idCol, vecCol, cents)
      .withColumn("__resid", residualUdf(cents)(col(vecCol), col("cell")))
      .select(col(idCol), col("cell"), col("__resid"))

  def ivfpqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 32, m: Int = 8, kCodes: Int = 16, iters: Int = 3)
      : (Array[Array[Double]], Codebook) = {
    val cents = Similarity.ivfCentroids(corpus, idCol, vecCol, nlist)
    // checkpoint: train's sampling + fetch passes would otherwise run the
    // assignment UDF over the corpus more than once
    val resid = residFrame(corpus, idCol, vecCol, cents).localCheckpoint(true)
    val book =
      try train(resid, idCol, "__resid", m, kCodes, iters)
      finally Staged.releaseCheckpoint(resid)
    (cents, book)
  }

  def ivfpqTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      nlist: Int = 32, nProbe: Int = 4, m: Int = 8, kCodes: Int = 16,
      iters: Int = 3,
      trained: Option[(Array[Array[Double]], Codebook)] = None): DataFrame = {
    val spark = corpus.sparkSession
    val cents = trained.map(_._1).getOrElse(
      Similarity.ivfCentroids(corpus, idCol, vecCol, nlist))
    // (id, cell, residual) — consumed by encode+join AND (when training
    // here) by train's sample passes: ONE checkpoint serves all consumers
    // so the assignment UDF runs once per row; released after the staged
    // result materializes
    val resid = residFrame(corpus, idCol, vecCol, cents).localCheckpoint(true)
    val book = trained.map(_._2).getOrElse(
      train(resid, idCol, "__resid", m, kCodes, iters))
    val codes = encode(resid, idCol, "__resid", book)
      .join(resid.select(col(idCol), col("cell")), Seq(idCol))

    // per-(query, probed-cell) LUT: lut(j)(c) = ||resid(q, cell)_j − book_jc||²
    val qRows = queries.select(col(qIdCol).cast("long"), col(qVecCol)).collect()
    val probeOf = { (vec: Array[Double]) =>
      cents.zipWithIndex
        .map { case (c, i) => (sqDist(vec, c), i) }
        .sortBy(identity).take(nProbe).map(_._2)
    }
    val luts: Map[(Long, Int), Array[Array[Double]]] = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val vec = r.getSeq[Float](1).map(_.toDouble).toArray
      val dSub = vec.length / m
      probeOf(vec).map { cell =>
        val res = Array.tabulate(vec.length)(i => vec(i) - cents(cell)(i))
        (qid, cell) -> Array.tabulate(m, kCodes) { (j, c) =>
          sqDist(java.util.Arrays.copyOfRange(res, j * dSub, (j + 1) * dSub),
            book(j)(c))
        }
      }
    }.toMap
    val lutsB = spark.sparkContext.broadcast(luts)
    val adc = udf { (qid: Long, cell: Int, codes: Seq[Int]) =>
      val lut = lutsB.value((qid, cell))
      var s = 0.0; var j = 0
      while (j < codes.length) { s += lut(j)(codes(j)); j += 1 }
      s
    }
    import spark.implicits._
    val probes = luts.keys.toSeq.sorted.toDF("query_id", "cell")
    val scored = codes
      .join(broadcast(probes), Seq("cell"))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        adc(col("query_id"), col("cell"), col("codes")).as("adc_dist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    // top-k result is bounded (k × queries); stage it so the residual
    // checkpoint can be released before returning
    val out = Staged.materialize(
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k))
    Staged.releaseCheckpoint(resid)
    out
  }
}
