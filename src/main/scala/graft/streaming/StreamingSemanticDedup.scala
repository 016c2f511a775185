package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Staged}

/** Cross-batch SEMANTIC dedup at the ingestion edge — the streaming form
  * of [[graft.operators.Similarity.lshNearPairs]]-style embedding
  * near-dup (SemDeDup-shaped: two docs are duplicates when their
  * embeddings' cosine clears a threshold), completing the streaming dedup
  * triple: [[StreamingDedup]] (exact content keys),
  * [[StreamingNearDedup]] (MinHash over shingles), and this (embedding
  * cosine).
  *
  * Same store discipline as the MinHash stream ([[BucketStore]]):
  * `foreachBatch` against persistent sign-bit LSH buckets, NOT keyed
  * executor state — corpus-sized state belongs on storage. Per batch:
  *
  *   1. multi-table random-hyperplane buckets for the new vectors (one
  *      tight-loop UDF pass, the [[Similarity]] plane family with the
  *      same fixed seeds — batch and store agree on the hash family by
  *      construction);
  *   2. in-batch near-dups via bucket-blocked exact-cosine pairs →
  *      connected components → keep the smallest id per component;
  *   3. the batch representatives' buckets equi-join the store on
  *      (table, bucket); exact cosine against the stored vector decides;
  *      `dup_of` = smallest store representative that clears the
  *      threshold;
  *   4. survivors append (table, bucket, rep_id, v) under `batch=<id>/`
  *      with overwrite — exactly-once from idempotence + checkpointed
  *      batch ids, as in the MinHash stream.
  *
  * Scale: candidates are bounded by bucket collisions (tables × bits
  * control recall/cost; degenerate buckets are capped), vectors ride the
  * store rows once each, and every join is an equi-join on the bucket
  * key — no all-pairs anywhere.
  */
object StreamingSemanticDedup {

  /** Process one micro-batch of (idCol, vecCol: array<float>) rows against
    * the store at `storeDir`. Returns decisions: (idCol, kept, dup_of) —
    * `dup_of` is the kept representative (in-store or in-batch) for
    * dropped rows, null for kept ones.
    */
  def processBatch(batch: DataFrame, idCol: String, vecCol: String, dim: Int,
      storeDir: String, batchId: Long, threshold: Double,
      bits: Int = 12, tables: Int = 4, maxBucket: Int = 10000): DataFrame = {
    val spark = batch.sparkSession
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val vecs = batch.select(col(idCol), col(vecCol).as("__v")).persist(mem)

    // ---- in-batch semantic near-dups: representative = component min ---
    val inBatchPairs = Similarity.lshNearPairs(
      vecs.select(col(idCol), col("__v").as(vecCol)), idCol, vecCol, dim,
      threshold, bits, tables, maxBucket)
    val withComp = DedupStreamOps.withReps(vecs, idCol, col("__v"), inBatchPairs)
      .persist(mem)
    val batchReps = withComp.where(col(idCol) === col("__rep"))

    // ---- store lookup for the batch representatives --------------------
    val repBuckets = batchReps
      .select(col(idCol), col("__v"),
        posexplode(Similarity.allBucketsUdf(dim, bits, tables)(col("__v")))
          .as(Seq("table", "bucket")))
    val store = BucketStore.read(spark, storeDir, excludeBatchId = batchId)
    val hits = store match {
      case Some(st) =>
        repBuckets.join(
            st.withColumnRenamed("v", "__store_v")
              .withColumnRenamed("rep_id", "__store_rep"),
            Seq("table", "bucket"))
          .where(Similarity.cosine(col("__v"), col("__store_v")) >= threshold)
          .groupBy(col(idCol))
          .agg(min(col("__store_rep")).as("__dup_of"))
      case None => DedupStreamOps.emptyHits(batchReps, idCol)
    }

    // ---- survivors extend the store (idempotent per-batch directory) ---
    val survivors = batchReps.join(hits, Seq(idCol), "left_anti")
    repBuckets.join(survivors.select(col(idCol)), Seq(idCol))
      .select(col("table"), col("bucket"), col(idCol).as("rep_id"),
        col("__v").as("v"))
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/batch=$batchId")

    // ---- decisions -----------------------------------------------------
    val out = Staged.materialize(DedupStreamOps.decisions(
      withComp, hits, idCol, batch.schema(idCol).dataType))
    vecs.unpersist(false)
    withComp.unpersist(false)
    out
  }

  /** Fold per-batch appendices behind the replay horizon into one base —
    * [[BucketStore.compact]] with this store's row identity. Crash-window
    * duplicate rows are harmless here too: store hits fold through
    * min(rep_id).
    */
  def compactStore(spark: org.apache.spark.sql.SparkSession, dir: String,
      upToBatchId: Long): Int =
    BucketStore.compact(spark, dir, upToBatchId,
      dedupCols = Seq("table", "bucket", "rep_id"))
}
