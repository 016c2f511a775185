package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous ordered-funnel tracking — the streaming form of the batch
  * [[graft.operators.Sessions.funnel]]: each user's live funnel stage
  * advances as their events arrive, and every ADVANCE is emitted
  * downstream the moment it happens ("user 42 just reached checkout"),
  * instead of waiting for a batch recomputation over history.
  *
  * Stage semantics match the batch operator: a user reaches stage i when
  * an event of type `stages(i)` occurs at-or-after the time they reached
  * stage i-1 (within one micro-batch the group's events replay in
  * timestamp order, so an out-of-order burst inside a batch still chains
  * correctly); stages never regress. Cross-batch late data can never
  * OVER-advance (the one-directional stage counter rejects events older
  * than the current stage time), but it can UNDER-advance: a late
  * stage-k event arriving after later-stage events were already consumed
  * cannot retroactively chain them, where a batch recompute would — the
  * same trade as [[StreamingAttribution]], with the same reconciliation
  * operator: run [[graft.operators.Sessions.funnelDiff]] over the closed
  * span to emit exactly the users whose live stage needs correcting
  * (FunnelEquivalenceSpec pins streamed + corrections == batch over
  * random late splits). No watermark is needed; pass a TTL to bound
  * state instead.
  *
  * Scale shape: keyed state is ONE (stage, ts) pair per user ever seen —
  * bytes per user, not events; `ttlMs` ages out idle users (the
  * [[StreamingUpsert]] TTL discipline) for churning user spaces. One
  * shuffle on the user key per micro-batch.
  */
object StreamingFunnel {

  /** One funnel event: user, epoch-second timestamp, event type. */
  final case class Event(user: Long, ts: Long, eventType: String)

  /** A stage advance: `user` reached 1-based `stage` at `ts`. */
  final case class Advance(user: Long, stage: Int, ts: Long)

  private[streaming] final case class FunnelState(stage: Int, ts: Long)

  implicit private val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit private val advanceEnc: Encoder[Advance] = Encoders.product[Advance]
  implicit private val stateEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  implicit private val keyEnc: Encoder[Long] = Encoders.scalaLong

  private def advanceGroup(stages: IndexedSeq[String])(user: Long,
      rows: Iterator[Event], state: GroupState[FunnelState]): Iterator[Advance] = {
    var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
    val out = Seq.newBuilder[Advance]
    // replay the batch's events for this user in time order so an
    // out-of-order burst within one batch still chains stages correctly
    rows.toSeq.sortBy(e => (e.ts, e.eventType)).foreach { e =>
      if (cur.stage < stages.length && e.eventType == stages(cur.stage) &&
          e.ts >= cur.ts) {
        cur = FunnelState(cur.stage + 1, e.ts)
        out += Advance(user, cur.stage, e.ts)
      }
    }
    if (cur.stage > 0 && !state.getOption.contains(cur)) state.update(cur)
    out.result().iterator
  }

  /** Test hook: the group function driven directly (equivalence specs). */
  private[streaming] def advanceGroupForTest(stages: IndexedSeq[String])(user: Long,
      rows: Iterator[Event], state: GroupState[FunnelState]): Iterator[Advance] =
    advanceGroup(stages)(user, rows, state)

  private[streaming] def advanceGroupTtl(stages: IndexedSeq[String], ttlMs: Long)(user: Long,
      rows: Iterator[Event], state: GroupState[FunnelState]): Iterator[Advance] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val out = advanceGroup(stages)(user, rows, state)
      if (state.exists) state.setTimeoutDuration(ttlMs)
      out
    }

  /** Stage advances for each user as they happen. `stages` is the
    * ordered funnel (e.g. view → click → purchase).
    *
    * @param ttlMs idle-user state eviction (0 = keep forever): a user
    *   idle for `ttlMs` restarts the funnel from stage 0 on their next
    *   event — size it to the business funnel window
    */
  def advances(events: Dataset[Event], stages: Seq[String],
      ttlMs: Long = 0): Dataset[Advance] = {
    require(stages.nonEmpty && stages.distinct.length == stages.length,
      "stages must be non-empty and distinct")
    val s = stages.toIndexedSeq
    if (ttlMs <= 0)
      events.groupByKey(_.user)
        .flatMapGroupsWithState[FunnelState, Advance](
          OutputMode.Append(), GroupStateTimeout.NoTimeout())(advanceGroup(s) _)
    else
      events.groupByKey(_.user)
        .flatMapGroupsWithState[FunnelState, Advance](
          OutputMode.Append(),
          GroupStateTimeout.ProcessingTimeTimeout())(advanceGroupTtl(s, ttlMs) _)
  }

  /** Drive to an in-memory table (append — one row per stage advance). */
  def runToMemory(spark: SparkSession, events: Dataset[Event],
      stages: Seq[String], sinkName: String,
      ttlMs: Long = 0): org.apache.spark.sql.streaming.StreamingQuery =
    advances(events, stages, ttlMs).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
}
