package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous multi-touch attribution — the streaming form of the batch
  * [[graft.operators.Sessions.attribution]]: per-conversion credit rows
  * emit the MOMENT the conversion arrives ("this purchase credits
  * view 0.4 / click 0.2 / view 0.4"), feeding a live channel dashboard
  * instead of a nightly recomputation.
  *
  * Model semantics match the batch operator: a conversion credits the
  * user's touches inside `lookbackSeconds` that arrived after the
  * previous conversion (no double counting); first/last/linear/U-shaped
  * (40/20/40) and time-decay credits are computed per conversion, with
  * timestamp-tied first/last touches splitting that model's credit.
  * Within a micro-batch the group's events replay in timestamp order;
  * a cross-batch LATE touch (arriving after its conversion was already
  * credited) is dropped — the batch operator would have credited it
  * (documented trade, same as every streaming-vs-batch attribution
  * system). The reconciliation path is
  * [[graft.operators.Sessions.attributionDiff]]: run it over each closed
  * window to diff these streamed credits against the batch truth and
  * emit exactly the correcting deltas (streamed + corrections == batch,
  * pinned by AttributionEquivalenceSpec's late-touch property).
  *
  * Scale shape: keyed state is the user's touch buffer, BOUNDED by
  * `maxTouches` (oldest evicted first — last-touch/linear credits stay
  * exact, first-touch credit moves to the oldest RETAINED touch once a
  * user overflows) plus the last-conversion timestamp; `ttlMs` ages out
  * idle users. One shuffle on the user key per micro-batch.
  */
object StreamingAttribution {

  /** One event: user, epoch-second timestamp, event type. */
  final case class Event(user: Long, ts: Long, eventType: String)

  /** One credit row: at conversion time `convTs`, `touchType`'s touch at
    * `touchTs` earned the five model credits.
    */
  final case class Credit(user: Long, convTs: Long, touchType: String,
      touchTs: Long, firstTouch: Double, lastTouch: Double, linear: Double,
      positionBased: Double, timeDecay: Double)

  private[streaming] final case class AttState(
      touches: List[(Long, String)], lastConv: Long)

  implicit private val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit private val creditEnc: Encoder[Credit] = Encoders.product[Credit]
  implicit private val stateEnc: Encoder[AttState] = Encoders.product[AttState]
  implicit private val keyEnc: Encoder[Long] = Encoders.scalaLong

  /** Credits for one conversion over its eligible touch window — the
    * batch operator's model formulas, applied to an in-memory window.
    */
  private def credit(user: Long, convTs: Long, touches: Seq[(Long, String)],
      halfLifeSeconds: Long): Seq[Credit] = {
    if (touches.isEmpty) return Nil
    val n = touches.length
    val tf = touches.map(_._1).min
    val tl = touches.map(_._1).max
    val nf = touches.count(_._1 == tf)
    val nl = touches.count(_._1 == tl)
    val mid = n - nf - nl
    val ws = touches.map(t =>
      math.pow(0.5, (convTs - t._1).toDouble / halfLifeSeconds)).sum
    touches.map { case (ts, ty) =>
      val isF = ts == tf
      val isL = ts == tl
      val pos =
        if (tf == tl) 1.0 / n
        else if (isF) (if (mid > 0) 0.4 else 0.5) / nf
        else if (isL) (if (mid > 0) 0.4 else 0.5) / nl
        else 0.2 / mid
      Credit(user, convTs, ty, ts,
        firstTouch = if (isF) 1.0 / nf else 0.0,
        lastTouch = if (isL) 1.0 / nl else 0.0,
        linear = 1.0 / n,
        positionBased = pos,
        timeDecay = math.pow(0.5, (convTs - ts).toDouble / halfLifeSeconds) / ws)
    }
  }

  private[streaming] def creditGroup(touchTypes: Set[String], convType: String,
      lookbackSeconds: Long, halfLifeSeconds: Long, maxTouches: Int)(user: Long,
      rows: Iterator[Event], state: GroupState[AttState]): Iterator[Credit] = {
    var cur = state.getOption.getOrElse(AttState(Nil, Long.MinValue))
    val out = Seq.newBuilder[Credit]
    rows.toSeq.sortBy(e => (e.ts, e.eventType)).foreach { e =>
      if (e.eventType == convType) {
        // strictly-after-previous-conversion + lookback window; touches
        // in the SAME second as the conversion attribute to a later one
        // (the batch operator's boundary)
        if (e.ts > cur.lastConv) {
          val eligible = cur.touches
            .filter(t => t._1 < e.ts && t._1 >= e.ts - lookbackSeconds)
          out ++= credit(user, e.ts, eligible, halfLifeSeconds)
          // same-second retention: the batch operator's previous-
          // conversion boundary is VALUE-strict (max conversion ts < t),
          // so a touch in this conversion's second is not credited here
          // (t < convTs fails) but remains eligible for the NEXT
          // conversion — the AttributionEquivalenceSpec property found
          // the strictly-after variant diverging on exactly this tie
          cur = AttState(cur.touches.filter(_._1 >= e.ts), e.ts)
        }
      } else if (touchTypes.contains(e.eventType) && e.ts >= cur.lastConv) {
        val appended = cur.touches :+ (e.ts, e.eventType)
        // bound the buffer: oldest touch evicted first
        cur = cur.copy(touches =
          if (appended.length > maxTouches) appended.sortBy(_._1).drop(1)
          else appended)
      }
    }
    // never persist the INITIAL state: a user whose batch carried only
    // irrelevant event types must not grow keyed state (on a firehose
    // most users never touch the funnel — the StreamingFunnel guard)
    if (cur != AttState(Nil, Long.MinValue) && !state.getOption.contains(cur))
      state.update(cur)
    out.result().iterator
  }

  private[streaming] def creditGroupTtl(touchTypes: Set[String], convType: String,
      lookbackSeconds: Long, halfLifeSeconds: Long, maxTouches: Int,
      ttlMs: Long)(user: Long, rows: Iterator[Event],
      state: GroupState[AttState]): Iterator[Credit] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val out = creditGroup(touchTypes, convType, lookbackSeconds,
        halfLifeSeconds, maxTouches)(user, rows, state)
      if (state.exists) state.setTimeoutDuration(ttlMs)
      out
    }

  /** Per-conversion credit rows as conversions arrive. Aggregate
    * downstream by `touchType` for the live channel report.
    */
  def credits(events: Dataset[Event], touchTypes: Seq[String],
      convType: String, lookbackSeconds: Long, halfLifeSeconds: Long,
      maxTouches: Int = 256, ttlMs: Long = 0): Dataset[Credit] = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touch types must be non-empty and exclude the conversion type")
    require(lookbackSeconds > 0 && halfLifeSeconds > 0 && maxTouches > 0)
    val tt = touchTypes.toSet
    if (ttlMs <= 0)
      events.groupByKey(_.user)
        .flatMapGroupsWithState[AttState, Credit](
          OutputMode.Append(), GroupStateTimeout.NoTimeout())(
          creditGroup(tt, convType, lookbackSeconds, halfLifeSeconds, maxTouches) _)
    else
      events.groupByKey(_.user)
        .flatMapGroupsWithState[AttState, Credit](
          OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
          creditGroupTtl(tt, convType, lookbackSeconds, halfLifeSeconds,
            maxTouches, ttlMs) _)
  }

  /** Drive to an in-memory table (append — one row per credited touch). */
  def runToMemory(spark: SparkSession, events: Dataset[Event],
      touchTypes: Seq[String], convType: String, lookbackSeconds: Long,
      halfLifeSeconds: Long, sinkName: String,
      maxTouches: Int = 256, ttlMs: Long = 0): org.apache.spark.sql.streaming.StreamingQuery =
    credits(events, touchTypes, convType, lookbackSeconds, halfLifeSeconds,
      maxTouches, ttlMs).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
}
