package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the third classic vector-compression layer
  * next to [[Similarity]]'s LSH/IVF and [[Pq]]'s product quantization
  * (FAISS's `ScalarQuantizer` shape): each dimension is quantized
  * independently to an 8-bit code against trained per-dimension
  * (min, max) bounds, so a d-dim float vector stores as d bytes (4×
  * smaller) with far finer granularity than PQ's shared codebooks
  * (255 levels PER DIMENSION vs k centroids per subspace). The usual
  * trade: SQ8 compresses less than PQ but reconstructs better, and its
  * "training" is two order statistics instead of Lloyd.
  *
  * Scale design (100 TB):
  *  - TRAINING is one aggregation pass producing 2·d doubles (per-dim
  *    min/max) and is exact at ANY scale — unlike Lloyd, min/max partial-
  *    aggregates, so each partition reduces to d rows map-side and the
  *    shuffle carries d·partitions rows; nothing reaches the driver but
  *    2·d doubles. No training sample is needed. (Min/max bounds are
  *    outlier-sensitive; production SQ variants train on quantiles — the
  *    same pass with `percentile_approx` slots in unchanged.)
  *  - ENCODE is a map-side UDF pass with the (tiny) bounds broadcast.
  *  - ADC SEARCH broadcasts the query set and scores each corpus code
  *    row against the true (unquantized) query in the dequantized space —
  *    squared L2 accumulated in double, one primitive loop per pair, then
  *    the per-query top-k window on (dist, id). Same plan shape as
  *    [[Pq.adcTopK]]: no corpus shuffle before the top-k window.
  *
  * Determinism: bounds are exact min/max (order-independent), codes are
  * `round` to the nearest level with ties away from zero (Java
  * `Math.round` on a non-negative operand), so encode is a pure function
  * of the input.
  */
object Sq {

  /** Per-dimension affine bounds: code c dequantizes to
    * `mins(i) + c * scales(i)`; `scales(i) = (max-min)/255` (0 for a
    * constant dimension — every value codes to 0 and reconstructs
    * exactly).
    */
  case class Bounds(mins: Array[Double], scales: Array[Double])

  /** Train per-dimension bounds: one posexplode + groupBy(dim) min/max
    * pass (partial-aggregated map-side; the shuffle carries d rows per
    * input partition).
    */
  def train(df: DataFrame, vecCol: String): Bounds = {
    val rows = df.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
      .orderBy("pos")
      .collect()
    val mins = rows.map(_.getDouble(1))
    val scales = rows.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0)
    Bounds(mins, scales)
  }

  /** The per-value quantization kernel: nearest of 256 levels on the
    * affine grid, clamped to [0, 255]; a flat dimension (scale 0) codes to
    * 0. Pure — property-tested directly (PropertySpec: round-trip error ≤
    * scale/2 in-range, clamping out-of-range, per-dim monotonicity).
    */
  def quantize(x: Double, min: Double, scale: Double): Int =
    if (scale == 0.0) 0
    else {
      val c = Math.round((x - min) / scale).toInt
      if (c < 0) 0 else if (c > 255) 255 else c
    }

  /** Inverse of [[quantize]] up to the grid: the level's reconstruction. */
  def dequantize(code: Int, min: Double, scale: Double): Double =
    min + code * scale

  /** Encode each vector as d 8-bit codes (carried as `array<int>`, same
    * carrier choice as [[Pq.encode]]). Map-side; bounds broadcast by UDF
    * closure capture (2·d doubles).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      bounds: Bounds): DataFrame = {
    val enc = udf { (vec: Seq[Float]) =>
      val n = math.min(vec.length, bounds.mins.length)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = quantize(vec(i).toDouble, bounds.mins(i), bounds.scales(i))
        i += 1
      }
      out
    }
    df.select(col(idCol), enc(col(vecCol)).as("codes"))
  }

  /** ADC top-k: squared L2 between each true query vector and every
    * dequantized corpus code, smallest first, ties broken by neighbor id;
    * queries score against every row EXCEPT themselves (same self-exclusion
    * as [[Pq.adcTopK]]). Output: (query_id, rank, neighbor_id, adc_dist).
    */
  def adcTopK(codes: DataFrame, idCol: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, bounds: Bounds, k: Int): DataFrame = {
    val spark = codes.sparkSession
    val qRows = queries.select(col(qIdCol).cast("long"), col(qVecCol)).collect()
    val qVecs: Map[Long, Array[Double]] = qRows.map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap
    val qVecsB = spark.sparkContext.broadcast(qVecs)
    val adc = udf { (qid: Long, cs: Seq[Int]) =>
      val q = qVecsB.value(qid)
      val mins = bounds.mins
      val scales = bounds.scales
      var s = 0.0
      var i = 0
      val n = math.min(q.length, cs.length)
      while (i < n) {
        val d = q(i) - dequantize(cs(i), mins(i), scales(i))
        s += d * d
        i += 1
      }
      s
    }
    import spark.implicits._
    val qidDf = qVecs.keys.toSeq.sorted.toDF("query_id")
    val scored = codes
      .crossJoin(broadcast(qidDf))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        adc(col("query_id"), col("codes")).as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"))
  }
}
