package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Ingestion failure handling — the reference subscriber's two recovery
  * layers, re-expressed for Structured Streaming:
  *
  *  1. **Sink retry with exponential backoff**
  *     (/root/reference/subscriber/common/job/retry_failure_handler.go:83-103:
  *     constant-or-increasing interval, capped total elapsed time, then
  *     give up and surface the error). In Spark the save site is a
  *     `foreachBatch` body; [[retryingSave]] wraps it. A batch that throws
  *     after the budget fails the query — which is what hands control to
  *     layer 2.
  *
  *  2. **Redundant-cluster failover**
  *     (/root/reference/subscriber/common/job/streaming_processor.go:48+:
  *     a job may consume from a standby Kafka cluster when the active one
  *     fails; progress is tracked PER CLUSTER because offsets are not
  *     portable across clusters). In Spark each cluster's query keeps its
  *     own checkpoint directory; [[runWithFailover]] supervises the
  *     active query and starts the next cluster's when it dies.
  */
object FailureHandling {

  /** Run `save` with exponential-backoff retry: try, sleep `initIntervalMs`,
    * multiply the interval by `multiplier` (>= 1) after each failure, stop
    * when the accumulated sleep would exceed `maxElapsedMs`, and rethrow
    * the last failure. Mirrors the reference's handler semantics including
    * the elapsed-time accounting (sleep time only, not save time).
    */
  def retryingSave(save: () => Unit, initIntervalMs: Long = 100,
      multiplier: Double = 2.0, maxElapsedMs: Long = 600000L): Unit = {
    require(multiplier >= 1.0, s"multiplier $multiplier must be >= 1")
    var interval = initIntervalMs
    var elapsed = 0L
    var last: Throwable = null
    var done = false
    while (!done) {
      try { save(); done = true }
      catch {
        // NonFatal only (the runWithFailover discipline): retrying an
        // InterruptedException would swallow query shutdown for up to
        // maxElapsedMs, and a VM error must propagate, not loop
        case scala.util.control.NonFatal(e) =>
          last = e
          if (elapsed + interval >= maxElapsedMs) throw last
          Thread.sleep(interval)
          elapsed += interval
          interval = (interval * multiplier).toLong.max(1L)
      }
    }
  }

  /** Supervise a chain of redundant ingestion clusters: start
    * `starters(0)`'s streaming query and await it; if it FAILS (source
    * down, sink retry budget exhausted), start the next cluster's query —
    * each starter builds its query with its own checkpoint location, since
    * offsets do not transfer between clusters. Returns (index, query) of
    * the first query that terminated without error (a deliberate `stop()`
    * counts); rethrows the last failure when every cluster has failed.
    */
  def runWithFailover(starters: Seq[() => StreamingQuery]): (Int, StreamingQuery) = {
    require(starters.nonEmpty)
    var last: Throwable = null
    var i = 0
    // plain while + method-level return: a `return` inside a foreach
    // lambda compiles to a thrown NonLocalReturnControl, which a
    // `catch Throwable` in the same try would swallow — the successful
    // cluster would NOT short-circuit and the next one would spuriously
    // start
    while (i < starters.length) {
      try {
        val q = starters(i)()
        q.awaitTermination() // throws if the query failed
        return (i, q)
      } catch {
        case scala.util.control.NonFatal(e) => last = e
      }
      i += 1
    }
    throw last
  }
}
