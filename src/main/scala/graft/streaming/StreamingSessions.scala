package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous gap-sessionization over an event stream — the streaming
  * form of the batch [[graft.operators.Sessions.sessionize]] (SURVEY §2.8
  * notes the reference has NO query-time session windows; Spark's
  * `session_window` closes that extension note). Sessions are
  * watermark-finalized: a session closes when the watermark passes its
  * end + gap, so late events within the watermark still MERGE sessions
  * (two bursts bridged by a late middle event collapse to one row) and
  * events behind the watermark are dropped — exactly the live/backfill
  * boundary semantics the ingestion tier applies
  * ([[StreamArchiver]]'s contract, applied to aggregation).
  *
  * Scale shape: `session_window` aggregation is keyed state per (user,
  * open session) — bounded by ACTIVE sessions, not history; closed
  * sessions leave the store on watermark advance. One shuffle on the
  * user key per micro-batch, the same exchange the batch operator pays
  * once.
  */
object StreamingSessions {

  /** (user, session_start, session_end, n_events) rows appended as the
    * watermark closes each session.
    */
  def sessionCounts(events: DataFrame, userCol: String, tsCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Drive to an in-memory table (append mode — only watermark-closed
    * sessions surface, the deterministic output contract).
    */
  def runToMemory(spark: SparkSession, events: DataFrame, userCol: String,
      tsCol: String, gap: String, watermarkDelay: String,
      sinkName: String): StreamingQuery =
    sessionCounts(events, userCol, tsCol, gap, watermarkDelay)
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
}
