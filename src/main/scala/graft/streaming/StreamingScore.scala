package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous quality scoring — the production form of the trained
  * classifier: each micro-batch of the document stream is scored AS A
  * BATCH against the fitted `(bucket, w_milli)` table via
  * [[graft.operators.Classifier.scoreWith]] verbatim, inside
  * `foreachBatch` — the batch and streaming paths share one scoring
  * definition, so they cannot drift. Scoring is stateless per document
  * (map-side feature fold + broadcast model probe + a doc-keyed
  * aggregate WITHIN the batch), so there is no streaming state store at
  * all: nothing to watermark, nothing that grows with history — unlike
  * expressing the per-doc aggregation as a streaming groupBy, which
  * would pin every doc id in state forever. The weights frame is
  * re-evaluated per batch, so a model stored on disk can be swapped
  * without restarting the query.
  */
object StreamingScore {

  /** Start the scoring stream; `sink` receives each scored micro-batch
    * (write to storage, publish, or accumulate — the caller's side).
    */
  /** @param checkpointDir Structured Streaming checkpoint location —
    *   set it for restart-safe scoring (without it batch ids reset on
    *   restart and a non-idempotent sink re-sees old batches)
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, bucketBits: Int, threshold: Double,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.operators.Classifier.scoreWith(batch, idCol, textCol,
          weights, bucketBits, threshold), batchId)
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }
}
