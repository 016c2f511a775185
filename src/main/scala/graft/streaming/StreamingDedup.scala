package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch exact dedup at ingest time — the streaming form of
  * [[graft.operators.Dedup.exact]]: the first document bearing a given
  * content key passes through, every later arrival of the same key (in the
  * same micro-batch or any later one) is dropped. This is the dedup a
  * training-data pipeline wants at the ingestion edge, where the batch
  * dedup jobs only run much later.
  *
  * Spark-first shape: `groupByKey(contentKey)` +
  * `flatMapGroupsWithState` with a seen-marker per key. Exactly-once
  * replay (a replayed batch re-offers keys already marked seen and emits
  * nothing new) comes from Structured Streaming checkpointing, like the
  * upsert path.
  *
  * Scale note: keyed state stores the 16-byte content key it is keyed by
  * plus a first-seen timestamp — O(distinct keys), the same cardinality
  * any exact dedup must hold somewhere. `ttl` bounds it for endless
  * streams: keys idle longer than the TTL are evicted (processing-time
  * timeout), trading state size for readmitting a duplicate that recurs
  * after the window — the standard windowed-dedup contract
  * (`dropDuplicates` with a watermark makes the same trade; this operator
  * also REPORTS the drops, which that one cannot).
  */
object StreamingDedup {

  /** An ingested document: id, 16-byte-hash content key (compute with
    * md5/xxhash upstream — [[graft.operators.Dedup]] conventions), payload.
    */
  final case class Doc(docId: Long, contentKey: String, payload: String)

  /** What happened to each arriving doc — `kept = false` rows are the
    * duplicate audit trail (counts per source feed the curation metrics).
    */
  final case class Decision(docId: Long, contentKey: String, kept: Boolean)

  /** Keyed state: the id of the first-seen doc (public — codegen
    * instantiates it from generated Java).
    */
  final case class Seen(firstDocId: Long)

  implicit private val docEnc: Encoder[Doc] = Encoders.product[Doc]
  implicit private val decEnc: Encoder[Decision] = Encoders.product[Decision]
  implicit private val seenEnc: Encoder[Seen] = Encoders.product[Seen]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  private def dedupGroup(ttlMs: Long)(key: String, rows: Iterator[Doc],
      state: GroupState[Seen]): Iterator[Decision] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = rows.toSeq.sortBy(_.docId)
      val alreadySeen = state.exists
      if (!alreadySeen && sorted.nonEmpty) state.update(Seen(sorted.head.docId))
      if (state.exists && ttlMs > 0) state.setTimeoutDuration(ttlMs)
      sorted.iterator.zipWithIndex.map { case (d, i) =>
        Decision(d.docId, key, kept = !alreadySeen && i == 0)
      }
    }
  }

  /** Dedup a stream of [[Doc]]s by content key. Emits one [[Decision]] per
    * input row; `kept` is true only for the first arrival of each key
    * (ties within a batch break by smallest docId, deterministic under
    * replay). `ttlMs` <= 0 keeps state forever.
    */
  def dedup(docs: Dataset[Doc], ttlMs: Long = 0L): Dataset[Decision] = {
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.groupByKey(_.contentKey)
      .flatMapGroupsWithState[Seen, Decision](
        OutputMode.Update(), timeout)(dedupGroup(ttlMs))
  }
}
