package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous hopping-window aggregation — the streaming form of the
  * batch [[graft.operators.Sessions.hoppingAgg]]: every event contributes
  * to the `ceil(size/stride)` overlapping windows covering it, and a
  * window's row is emitted exactly once, when the watermark passes its
  * end (append mode — the deterministic output contract; a monitoring
  * panel reading the sink sees each window value finalized, never
  * updated). Events behind the watermark drop — the same live/backfill
  * boundary the ingestion tier applies.
  *
  * Scale shape: keyed state is one aggregation buffer per OPEN window —
  * `ceil(size/stride)` concurrently open windows per group key,
  * independent of history; closed windows leave the store on watermark
  * advance. The per-event fan-out is the same codegen'd Expand as the
  * batch operator, map-side before the one shuffle per micro-batch.
  */
object StreamingHopping {

  /** (window_start, window_end, aggs…) rows appended as the watermark
    * closes each window; epoch-second window bounds, matching the batch
    * operator's output shape.
    */
  def hoppingAgg(events: DataFrame, tsCol: String, sizeSec: Long,
      strideSec: Long, watermarkDelay: String, aggs: Seq[Column]): DataFrame = {
    require(sizeSec > 0 && strideSec > 0 && strideSec <= sizeSec,
      s"need 0 < stride ($strideSec) <= size ($sizeSec)")
    require(aggs.nonEmpty, "at least one aggregate required")
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$sizeSec seconds", s"$strideSec seconds")
        .as("__w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", unix_timestamp(col("__w.start")))
      .withColumn("window_end", unix_timestamp(col("__w.end")))
      .drop("__w")
  }

  /** Drive to an in-memory table (append mode). */
  def runToMemory(spark: SparkSession, events: DataFrame, tsCol: String,
      sizeSec: Long, strideSec: Long, watermarkDelay: String,
      aggs: Seq[Column], sinkName: String): StreamingQuery =
    hoppingAgg(events, tsCol, sizeSec, strideSec, watermarkDelay, aggs)
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
}
