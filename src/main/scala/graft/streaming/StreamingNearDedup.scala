package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Cross-batch NEAR-duplicate dedup at the ingestion edge — the streaming
  * form of [[graft.operators.Dedup.minhashNearDups]], completing the pair
  * with [[StreamingDedup]] (exact content keys).
  *
  * Shape: `foreachBatch` against a persistent BUCKET STORE — the
  * production pattern for stateful streaming whose state is corpus-sized.
  * Keyed executor state (flatMapGroupsWithState) would have to hold one
  * signature per (band, bucket) for the whole corpus in memory, and a
  * doc's verdict spans 16 band keys (multiple stateful operators per
  * query). Instead each micro-batch:
  *
  *   1. computes map-side MinHash signatures for the new docs;
  *   2. resolves IN-BATCH near-dups with the batch operator
  *      (banded candidates → threshold → keep smallest id);
  *   3. joins the batch reps' band buckets against the accumulated store
  *      (band, bucket, repId, sig) — an equi-join on the band key, the
  *      same blocking the batch path uses — and drops docs whose
  *      signature agrees >= threshold with any stored representative;
  *   4. appends the survivors' bucket rows to the store under
  *      `batch=<id>/` with overwrite — a REPLAYED batch rewrites the same
  *      directory, so exactly-once follows from the sink's idempotence
  *      plus Structured Streaming's checkpointed batch ids.
  *
  * Store size is O(corpus × bands) rows of (2 longs, id, 64-long sig) on
  * storage, not executor memory. [[compactStore]] bounds the DIRECTORY
  * count: per-batch appendices behind the replay horizon fold into one
  * consolidated `base=` partition, so a long-running stream lists a
  * handful of directories per batch instead of one per micro-batch ever
  * processed.
  */
object StreamingNearDedup {

  /** Process one micro-batch of (idCol, textCol) docs against the store at
    * `storeDir`. Returns decisions: (idCol, kept, dup_of) — `dup_of` is
    * the kept representative (in-store or in-batch) for dropped docs, null
    * for kept ones. Docs too short to carry a signature (< 3 tokens) pass
    * through kept.
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
      storeDir: String, batchId: Long, threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sigs = Dedup.minhashSignatures(batch, idCol, textCol).persist(mem)

    // ---- in-batch near-dups: representative = component minimum --------
    val inBatchPairs = Dedup.minhashCandidates(sigs, idCol)
      .where(col("est_jaccard") >= threshold)
    val withComp = DedupStreamOps.withReps(sigs, idCol, col("sig"), inBatchPairs)
      .persist(mem)
    val batchReps = withComp.where(col(idCol) === col("__rep"))

    // ---- store lookup for the batch representatives --------------------
    // the CURRENT batch id's directory is excluded: a replayed batch must
    // not match against its own previous (possibly partial) write — it
    // re-derives and overwrites it instead
    val store = readStore(spark, storeDir, excludeBatchId = batchId)
    val repBuckets = Dedup.bandBuckets(
      batchReps.select(col(idCol), col("sig")), idCol)
    val hits = store match {
      case Some(st) =>
        repBuckets.join(st.withColumnRenamed("sig", "__store_sig")
            .withColumnRenamed("rep_id", "__store_rep"), Seq("band", "bucket"))
          .join(batchReps.select(col(idCol), col("sig")), Seq(idCol))
          .where(Dedup.sigAgreement(col("sig"), col("__store_sig")) >= threshold)
          .groupBy(col(idCol))
          .agg(min(col("__store_rep")).as("__dup_of"))
      case None => DedupStreamOps.emptyHits(batchReps, idCol)
    }

    // ---- survivors extend the store (idempotent per-batch directory) ---
    // survivors ⊂ batchReps, so their band buckets are a FILTER of the
    // already-computed repBuckets — re-banding would run the 16-band
    // signature fan-out a second time per trigger
    val survivors = batchReps.join(hits, Seq(idCol), "left_anti")
    repBuckets.join(survivors.select(col(idCol), col("sig")), Seq(idCol))
      .select(col("band"), col("bucket"), col(idCol).as("rep_id"), col("sig"))
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/batch=$batchId")

    // ---- decisions ------------------------------------------------------
    val shortDocs = batch.select(col(idCol)).join(sigs.select(col(idCol)),
      Seq(idCol), "left_anti")
      .select(col(idCol), lit(true).as("kept"),
        lit(null).cast(batch.schema(idCol).dataType).as("dup_of"))
    // store hits attach to REPRESENTATIVES; members resolve through their
    // rep (a member of a store-hit rep traces to the STORE's keeper)
    val decided = DedupStreamOps.decisions(withComp, hits, idCol,
      batch.schema(idCol).dataType)
    // materialize BEFORE releasing the caches: the caller consumes the
    // result lazily (foreachBatch writes it after we return), and an
    // unpersisted lineage would re-run the signature UDF — the dominant
    // per-batch cost — from scratch. A micro-batch's decisions are small;
    // localCheckpoint pins them eagerly.
    val out = decided.unionByName(shortDocs).localCheckpoint(true)
    sigs.unpersist()
    withComp.unpersist()
    out
  }

  private def readStore(spark: org.apache.spark.sql.SparkSession,
      dir: String, excludeBatchId: Long): Option[DataFrame] =
    BucketStore.read(spark, dir, excludeBatchId)

  /** Fold the store's per-batch appendices behind the replay horizon into
    * one consolidated base — see [[BucketStore.compact]] for the horizon
    * contract and crash-safety discipline. A crash in the cleanup window
    * leaves duplicate rows (batch dir + base copy), which are harmless to
    * lookups here (store hits fold through min(rep_id)).
    */
  def compactStore(spark: org.apache.spark.sql.SparkSession, dir: String,
      upToBatchId: Long): Int =
    BucketStore.compact(spark, dir, upToBatchId,
      dedupCols = Seq("band", "bucket", "rep_id"))
}
