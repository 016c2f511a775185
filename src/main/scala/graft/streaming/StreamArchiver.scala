package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ingest.Backfill

/** Streaming ingestion with the reference's late-data routing
  * (/root/reference/memstore/backfill_manager.go; model.go:94-113):
  * records newer than the archiving cutoff (now − archivingDelay) land in
  * the live store; older-but-within-retention records go through the
  * backfill path into their day partitions; records past retention drop.
  *
  * Expressed as `withWatermark` + `foreachBatch`: the watermark bounds
  * any stateful operators upstream, and each micro-batch splits once on
  * the event-time column — three filtered writes, no extra shuffle. The
  * live store is append-only parquet that the archiving job
  * ([[graft.ingest.Archiver]]) periodically folds into the day-partitioned
  * archive, mirroring the reference's live→archive promotion.
  */
object StreamArchiver {

  final case class Route(
      timeCol: String,
      pk: Seq[String],
      sortCols: Seq[String],
      liveDir: String,
      archiveDir: String,
      archivingDelaySeconds: Long,
      retentionDays: Int)

  /** Route one (micro-)batch. `nowEpoch` is injectable for tests. */
  def routeBatch(spark: SparkSession, batch: DataFrame, route: Route,
      nowEpoch: Long): Unit = {
    if (batch.isEmpty) return
    val t = col(route.timeCol)
    val cutoff = timestamp_seconds(lit(nowEpoch - route.archivingDelaySeconds))
    val retentionFloor = timestamp_seconds(
      lit(nowEpoch - route.retentionDays.toLong * 86400))

    val fresh = batch.where(t >= cutoff)
    if (!fresh.isEmpty)
      fresh.write.mode("append").parquet(route.liveDir)

    val late = batch.where(t < cutoff && t >= retentionFloor)
    if (!late.isEmpty)
      Backfill(spark, route.archiveDir, late, route.timeCol, route.pk, route.sortCols)
    // rows older than retention fall through — dropped, as in the reference
  }

  def start(source: DataFrame, route: Route,
      watermarkDelay: String = "10 minutes"): StreamingQuery =
    source.withWatermark(route.timeCol, watermarkDelay)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        routeBatch(batch.sparkSession, batch, route,
          System.currentTimeMillis() / 1000)
      }
      .outputMode("append")
      .start()
}
