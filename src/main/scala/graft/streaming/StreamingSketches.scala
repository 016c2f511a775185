package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Cross-batch sketch maintenance for a streaming corpus: a `foreachBatch`
  * sink folding each micro-batch's KMV / Bloom / Count-Min sketches
  * ([[graft.functions.Sketches]]) into a persistent one-row state — the
  * live "what is this stream's cardinality / membership / token
  * frequency" monitor that batch re-aggregation can't give without
  * rescanning history.
  *
  * This works ONLY because the sketches are mergeable: the stored state
  * is the eval form, and each fold is pure Column algebra — KMV = k
  * smallest of the union, Bloom = pointwise max (bitwise OR on 0/1),
  * CMS = pointwise add. [[StreamingSketchesSpec]] pins the defining
  * property end-to-end: the streamed state after N batches EQUALS the
  * one-shot aggregate over the concatenated batches, array-for-array.
  *
  * Exactly-once replay: state for batch b is written to `state=<b>`
  * derived from the newest state with id < b, atomically renamed — a
  * replayed batch (same id) deterministically rewrites the same
  * directory from the same predecessor, so duplicates cannot
  * double-count ([[StreamingNearDedup]]'s store discipline). `prune`
  * drops state directories behind the replay horizon.
  *
  * Scale shape: per batch one aggregation over the batch (partial/final,
  * no shuffle of raw rows beyond the agg) plus an O(sketch-size) merge of
  * two single-row tables. State size is constant in stream length.
  */
class StreamingSketches(storeDir: String, itemCol: String,
    kmvK: Int = 128, bloomBits: Int = 8192, bloomSeeds: Int = 3,
    cmsWidth: Int = 1024, cmsDepth: Int = 4) extends Serializable {

  private val StatePrefix = "state="

  /** The foreachBatch hook. */
  def update(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val item = col(itemCol)
    val fresh = batch.agg(
      Sketches.kmv(item, kmvK).as("kmv"),
      Sketches.bloom(item, bloomBits, bloomSeeds).as("bloom"),
      Sketches.cms(item, cmsWidth, cmsDepth).as("cms"))
    val merged = latestBefore(spark, batchId) match {
      case None => fresh
      case Some(prev) =>
        fresh.select(col("kmv").as("k2"), col("bloom").as("b2"), col("cms").as("c2"))
          .crossJoin(prev)
          .select(
            slice(array_sort(array_union(col("kmv"), col("k2"))), 1, kmvK).as("kmv"),
            zip_with(col("bloom"), col("b2"), (a, b) => greatest(a, b)).as("bloom"),
            zip_with(col("cms"), col("c2"), (a, b) => a + b).as("cms"))
    }
    val fs = new Path(storeDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(storeDir))
    val tmp = new Path(storeDir, s".tmp-$StatePrefix$batchId")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val target = new Path(storeDir, s"$StatePrefix$batchId")
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"state rename failed: $tmp -> $target")
  }

  private def stateIds(spark: SparkSession): Seq[Long] = {
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(StatePrefix))
      .map(_.stripPrefix(StatePrefix).toLong).toSeq.sorted
  }

  private def latestBefore(spark: SparkSession, batchId: Long): Option[DataFrame] = {
    stateIds(spark).filter(_ < batchId).lastOption
      .map(id => spark.read.parquet(s"$storeDir/$StatePrefix$id"))
  }

  /** The newest state row (kmv, bloom, cms), if any batch has landed. */
  def current(spark: SparkSession): Option[Row] = {
    stateIds(spark).lastOption
      .map(id => spark.read.parquet(s"$storeDir/$StatePrefix$id").head())
  }

  /** Drop state directories older than the newest `keep` (replay
    * horizon); the newest always survives.
    */
  def prune(spark: SparkSession, keep: Int): Unit = {
    require(keep >= 1)
    val ids = stateIds(spark)
    val fs = new Path(storeDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    ids.dropRight(keep).foreach { id =>
      fs.delete(new Path(storeDir, s"$StatePrefix$id"), true)
    }
  }
}
