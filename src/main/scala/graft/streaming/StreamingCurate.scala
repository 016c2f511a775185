package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** The streaming curation LOOP: cross-batch exact dedup → quality floor
  * → continuous shard export, composed into one `foreachBatch` body — a
  * crawl stream goes in, deduplicated quality-filtered training shards
  * come out, with no terminal batch job anywhere.
  *
  * Per micro-batch:
  *  1. in-batch exact dedup (min id per content key keeps — the
  *     [[graft.operators.Dedup.exactKeepMin]] rule),
  *  2. cross-batch dedup against the persistent content-key store
  *     (`batch=<id>/` dirs via [[BucketStore]] — the read excludes the
  *     current batch id, so a REPLAYED batch never matches its own
  *     partial write),
  *  3. a minimum-token quality floor,
  *  4. survivors tokenize to hashed ids (`hash60(token) % vocabSize`,
  *     the classifier's bucket trick — deterministic across engines and
  *     restarts) and land as a complete shard-pair directory via
  *     [[StreamingShards.writeBatch]].
  *
  * The store records the content keys of EXPORTED documents only, so a
  * re-crawled low-quality page is re-dropped by the same quality reason
  * rather than masked as a duplicate. Exactly-once: every per-batch
  * artifact (store dir, shard dir) is an idempotent overwrite keyed by
  * the batch id.
  *
  * Returns per-document decisions `(idCol, kept, reason)` in the
  * attrition vocabulary (`exact_dup`/`store_dup`/`quality`/`kept`) for
  * observability — callers aggregate or sink them as they like.
  *
  * Scale shape: content keys (md5 hex) are the only thing shuffled or
  * stored; the store grows O(exported docs) rows on STORAGE and folds
  * behind the replay horizon with [[BucketStore.compact]] (dedup col
  * `key`); shards are written map-side by the batch's executors.
  */
object StreamingCurate {

  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, storeDir: String, shardDir: String,
      vocabSize: Int = 1 << 16, shardsPerBatch: Int = 0,
      minWords: Int = 5): DataFrame = {
    require(vocabSize > 0 && minWords >= 0)
    val spark = batch.sparkSession
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val keyed = batch.select(col(idCol), col(textCol))
      .withColumn("__key", md5(col(textCol)))
      .persist(mem)
    val minIds = keyed.groupBy("__key").agg(min(col(idCol)).as("__minId"))
    val base = keyed.join(minIds, Seq("__key"))
    val withStore = BucketStore.read(spark, storeDir, excludeBatchId = batchId) match {
      case Some(st) => base.join(
        st.select(col("key").as("__key")).distinct()
          .withColumn("__inStore", lit(true)),
        Seq("__key"), "left")
      case None => base.withColumn("__inStore", lit(null).cast("boolean"))
    }
    val flagged = withStore
      .withColumn("__toks", TextOps.tokens(lower(col(textCol))))
      .withColumn("reason",
        when(col(idCol) =!= col("__minId"), "exact_dup")
          .when(col("__inStore").isNotNull, "store_dup")
          .when(size(col("__toks")) < minWords, "quality")
          .otherwise("kept"))
      .persist(mem)
    val kept = flagged.where(col("reason") === "kept")
    // store write first (the shard write derives from the same survivors):
    // kept content keys under this batch's idempotent directory
    kept.select(col("__key").as("key")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/batch=$batchId")
    val ids = kept.select(col(idCol),
      transform(col("__toks"), t =>
        (graft.functions.Sketches.hash60Col(t) % vocabSize).cast("int"))
        .as("__ids"))
    StreamingShards.writeBatch(ids, batchId, idCol, "__ids", shardDir,
      vocabSize, shardsPerBatch)
    // materialize decisions BEFORE releasing the caches (the
    // StreamingNearDedup discipline): the caller consumes them lazily,
    // and an unpersisted lineage would re-run the whole batch
    val out = flagged
      .select(col(idCol), (col("reason") === "kept").as("kept"), col("reason"))
      .localCheckpoint(true)
    flagged.unpersist()
    keyed.unpersist()
    out
  }

  /** Attach the loop to a streaming frame; per-batch decisions are
    * summarized to the driver log (callers needing them as data run
    * [[processBatch]] in their own `foreachBatch`). Set
    * `checkpointLocation` on the returned writer — the replay contract
    * is what makes the per-batch overwrites exactly-once.
    */
  def sink(stream: DataFrame, idCol: String, textCol: String,
      storeDir: String, shardDir: String, vocabSize: Int = 1 << 16,
      shardsPerBatch: Int = 0, minWords: Int = 5):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val decisions = processBatch(batch, batchId, idCol, textCol, storeDir,
        shardDir, vocabSize, shardsPerBatch, minWords)
      val counts = decisions.groupBy("reason").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
      System.err.println(s"[StreamingCurate] batch=$batchId $counts")
    }
}
