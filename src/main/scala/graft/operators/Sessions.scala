package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events table: gap-based
  * sessionization and ordered funnel conversion — the user-behavior
  * queries a real-time analytics store serves (the reference's domain is
  * exactly this workload: rides/trips event streams).
  *
  * Scale design: both operators are ONE shuffle on the user key and one
  * within-partition sort — every window below shares the same
  * (partitionBy user, orderBy ts) spec, so Catalyst plans a single
  * Window operator over a single Sort, no repeated exchanges. No
  * driver-side state; user-key skew is the natural partitioning bound
  * (a user's event history must be sortable in one task — true at any
  * realistic per-user event count).
  */
object Sessions {

  /** Assign a session index per user: a new session starts when the gap
    * since the user's previous event exceeds `gapSeconds`. Output: input
    * columns + `session_idx` (1-based per user). Deterministic tie-break
    * on `tieCol` for equal timestamps.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val gap = unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(w))
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Ordered funnel: a user reaches stage i when an event of type
    * `stages(i)` occurs STRICTLY AFTER some event that itself reached
    * stage i-1 (the classic min-timestamp-chaining funnel). Output: one
    * row per user with boolean `reached_1 .. reached_N`.
    *
    * Each stage's reach condition references only window minima over rows
    * strictly before the current one, so the whole funnel is N window
    * expressions over one shared sort.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val wPrev = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // flag_i: this row advances the funnel to stage i
    val flags = stages.zipWithIndex.foldLeft(events) { case (df, (stage, i)) =>
      val hit = col(typeCol) === stage
      val flag =
        if (i == 0) hit
        else hit && min(when(col(s"__flag_${i - 1}"), col(tsCol)))
          .over(wPrev).isNotNull
      df.withColumn(s"__flag_$i", flag)
    }
    flags.groupBy(col(userCol))
      .agg(max(col("__flag_0")).as("reached_1"),
        stages.indices.drop(1).map(i =>
          max(col(s"__flag_$i")).as(s"reached_${i + 1}")): _*)
  }

  /** Cohort retention matrix: users cohort by the period of their FIRST
    * event; each later event marks its user retained at
    * `offset = period(event) - period(first)`. Output:
    * (cohort_period, period_offset, users) — the classic retention
    * triangle. `periodSeconds` sets the granularity (86400·7 = weekly).
    *
    * Shape: one groupBy(user) for first-event periods (partial/final
    * min), a key-partitioned join back (both sides hash on user), then
    * one distinct-count aggregation — no window, no driver state.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      periodSeconds: Long): DataFrame = {
    val period = floor(unix_timestamp(col(tsCol)) / periodSeconds).cast("long")
    val withPeriod = events.select(col(userCol).as("__u"), period.as("__p"))
    val firsts = withPeriod.groupBy("__u").agg(min("__p").as("cohort_period"))
    // dedup to one (cohort, offset, user) triple — the group keys INCLUDE
    // the user, so off a user-partitioned source (the bucketed events
    // layout) the aggregate rides the existing partitioning with no
    // exchange, and each distinct triple exists exactly once globally
    val dedup = withPeriod.join(firsts, "__u")
      .select(col("cohort_period"),
        (col("__p") - col("cohort_period")).as("period_offset"),
        col("__u"))
      .dropDuplicates()
    // every triple is globally unique, so the final count is a plain
    // aggregate over them. Catalyst's HashAggregateExec already runs the
    // partial map-side BEFORE the exchange — each task reduces its
    // partition to ≤ triangle-size rows (weeks², not corpus-sized) and
    // only those partials ride the one re-key exchange, inside whole-stage
    // codegen (an earlier hand-rolled mapPartitions partial produced the
    // identical exchange volume through an opaque RDD stage; the
    // BucketedGatesSpec 1-exchange + bounded-records assertions guard the
    // shape). A zero-exchange variant via coalesce(1) exists but its
    // narrow dependency collapses the whole upstream job — scan, join,
    // dedup — into a single task; a bounded-volume exchange is the plan
    // that survives scale.
    dedup.groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("users"))
  }

  /** Reconcile STREAMED funnel advances against the batch truth — the
    * funnel sibling of [[attributionDiff]], for the same reason: the
    * streaming funnel consumes each event against the user's stage AT
    * ARRIVAL TIME, so a late stage-k event arriving after later-stage
    * events were already consumed cannot retroactively chain them (batch
    * over the full history would). Run over a closed span to emit the
    * users whose live stage needs correcting.
    *
    * `streamedAdvances` are
    * [[graft.streaming.StreamingFunnel.Advance]] rows (user, stage, ts);
    * `events` must be the SAME event span the stream consumed (funnel
    * stage is cumulative state — in practice the span since the funnel's
    * epoch or last reset). Output: one row per diverging user —
    * `(userCol, streamed_stage, batch_stage, kind)` with kind `missed`
    * (batch reached further: the late-interleaving case) or `over`
    * (stream reached further — impossible without a TTL reset or an
    * events/advances span mismatch, surfaced rather than dropped).
    * Users absent from the diff are exactly right in the live view.
    *
    * Scale shape: the streamed side collapses to one (user, max stage)
    * row per user before the join; the batch side is [[funnel]]'s single
    * user-windowed pass; the diff joins on the user key. Nothing
    * rescans outside the span.
    */
  def funnelDiff(streamedAdvances: DataFrame, events: DataFrame,
      userCol: String, tsCol: String, tieCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    val streamed = streamedAdvances
      .groupBy(col("user").as("__u"))
      .agg(max(col("stage")).cast("int").as("streamed_stage"))
    // reached_i flags are monotone (stage i implies i-1), so the batch
    // stage is their count
    val batchStage = stages.indices
      .map(i => when(col(s"reached_${i + 1}"), 1).otherwise(0))
      .reduce(_ + _)
    val batch = funnel(events, userCol, tsCol, tieCol, typeCol, stages)
      .select(col(userCol).as("__u"), batchStage.as("batch_stage"))
    batch.join(streamed, Seq("__u"), "full_outer")
      .select(col("__u").as(userCol),
        coalesce(col("streamed_stage"), lit(0)).as("streamed_stage"),
        coalesce(col("batch_stage"), lit(0)).as("batch_stage"),
        when(coalesce(col("batch_stage"), lit(0)) >
            coalesce(col("streamed_stage"), lit(0)), lit("missed"))
          .otherwise(lit("over")).as("kind"))
      .where(col("streamed_stage") =!= col("batch_stage"))
  }

  /** Per-stage user counts for a funnel — the headline funnel report.
    * Output: (stage 1..N, users).
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String]): DataFrame = {
    val reached = funnel(events, userCol, tsCol, tieCol, typeCol, stages)
    val perStage = stages.indices.map(i =>
      sum(when(col(s"reached_${i + 1}"), 1L).otherwise(0L))
        .as(s"u_${i + 1}"))
    val totals = reached.agg(perStage.head, perStage.tail: _*)
    val stacked = stages.indices.map(i =>
      totals.select(lit(i + 1).as("stage"), col(s"u_${i + 1}").as("users")))
    stacked.reduce(_ unionByName _)
  }

  /** First-order Markov transition counts over each user's time-ordered
    * event stream: how often does event type A directly precede event
    * type B — the journey-mining primitive behind "what do users do after
    * a search?" panels and behavioral anomaly baselines. A user's FIRST
    * event transitions from the synthetic `startMarker` state, so entry
    * points are first-class rows of the same matrix.
    *
    * Output: (prev_type, next_type, n) — the transition-count matrix,
    * |types|+1 × |types| rows at most; callers derive probabilities by
    * normalizing per prev_type (a window over the tiny aggregate).
    *
    * Scale shape: the [[sessionize]] contract — ONE shuffle on the user
    * key (zero when the input is already user-bucketed, the
    * `eventsByUser` path), one within-partition sort feeding a single
    * lag(), then a partial-aggregated count whose cardinality is the
    * type-pair space, not the event count. Deterministic tie-break on
    * `tieCol` for equal timestamps.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String,
      startMarker: String = "_start"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("prev_type",
        coalesce(lag(col(typeCol), 1).over(w), lit(startMarker)))
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Exponential time-decay aggregation: each event contributes
    * `2^(-(asOf − ts)/halfLife)` to its key — the recency-weighted
    * popularity/activity score every trending panel and freshness-aware
    * ranker uses (an event a half-life ago counts half of one now).
    * `asOf` is an explicit epoch-seconds parameter, not wall clock, so
    * results are reproducible and backfillable. Output: key columns +
    * `decayed_n` (the decayed mass) + `n` (the plain count for
    * reference).
    *
    * Scale shape: the decay factor is a map-side codegen'd expression on
    * the scan; the aggregate is one partial/final SUM keyed on the
    * grouping columns — same plan as a plain count, no window, no sort.
    * The spelling `-(ln 2 · Δt) / halfLife` is IEEE-reproducible across
    * engines (negate and divide are exact given identical operands).
    */
  def decayedCount(events: DataFrame, tsCol: String, keyCols: Seq[String],
      asOfEpoch: Long, halfLifeSec: Double): DataFrame = {
    require(keyCols.nonEmpty, "decayedCount needs at least one key column")
    require(halfLifeSec > 0, s"halfLife $halfLifeSec must be > 0")
    val dt = lit(asOfEpoch).cast("double") -
      unix_timestamp(col(tsCol)).cast("double")
    events.groupBy(keyCols.map(col): _*)
      .agg(sum(exp(-(log(lit(2.0)) * dt) / lit(halfLifeSec))).as("decayed_n"),
        count(lit(1)).as("n"))
  }

  /** Association mining over per-user event-type sets: for every
    * unordered type pair, the co-occurring-user count and the LIFT
    * `P(a,b) / (P(a)·P(b))` — the unordered companion to [[transitions]]
    * (lift > 1: the behaviors attract; < 1: they repel). Counts are
    * user-level (a user contributes once per type regardless of event
    * multiplicity).
    *
    * Scale shape: ONE shuffle builds each user's distinct type set
    * (bounded by the type vocabulary, not the user's event count); the
    * pair expansion is a map-side `transform×slice` fold over the sorted
    * set — |types|²/2 per user at worst, never a self-join of an
    * event-sized table — and the pair/single counts are partial
    * aggregates of type-vocabulary cardinality. The user total rides in
    * as a broadcast 1-row cross join; the per-type counts broadcast-join
    * onto the pair table.
    */
  def coOccurrenceLift(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    // three consumers (user total, singles, pairs) — materialize the
    // user-cardinality set table once instead of re-scanning the
    // event-cardinality input three times
    val perUser = Staged.materialize(events
      .select(col(userCol).as("__u"), col(typeCol).as("__t"))
      .groupBy("__u").agg(sort_array(collect_set("__t")).as("__ts")))
    val nUsers = perUser.agg(count(lit(1)).cast("double").as("__nu"))
    val singles = perUser.select(explode(col("__ts")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).cast("double").as("__c"))
    val pairs = perUser
      .select(explode(expr(
        """flatten(transform(__ts, (x, i) ->
          |  transform(slice(__ts, i + 2, size(__ts)), y ->
          |    struct(x AS ta, y AS tb))))""".stripMargin)).as("__p"))
      .select(col("__p.ta").as("ta"), col("__p.tb").as("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("__t").as("ta"), col("__c").as("__ca"))), Seq("ta"))
      .join(broadcast(singles.select(col("__t").as("tb"), col("__c").as("__cb"))), Seq("tb"))
      .crossJoin(broadcast(nUsers))
      .select(col("ta"), col("tb"), col("n_ab"),
        (col("n_ab") * col("__nu") / (col("__ca") * col("__cb"))).as("lift"))
  }

  /** RFM segmentation: per-user Recency (seconds since last event, at an
    * EXPLICIT as-of), Frequency (event count) and Monetary (value sum,
    * rounded to 6 before ranking so bucket edges are engine-independent),
    * each quartiled by `ntile(buckets)` with best-first order (bucket 1 =
    * most recent / most frequent / highest value; id tiebreak) — the
    * classic marketing/behavior segmentation. Output: (r, f, m, users) —
    * the segment-size matrix, ≤ buckets³ rows.
    *
    * Scale shape: the 100 TB input reduces to a USER-cardinality
    * aggregate in one partial/final shuffle first; the three ntile
    * windows then globally sort only that reduced table — the honest
    * price of exact quantile edges (the approximate path would cut at
    * `approx_percentile` boundaries instead, trading edge exactness for
    * no global sort; at user counts that fit a sort, exact wins).
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, asOfEpoch: Long, buckets: Int = 4): DataFrame = {
    require(buckets >= 2, s"buckets $buckets must be >= 2")
    val per = events.groupBy(col(userCol).as("__user"))
      .agg((lit(asOfEpoch) - max(unix_timestamp(col(tsCol)))).as("recency"),
        count(lit(1)).as("frequency"),
        round(sum(col(valueCol)), 6).as("monetary"))
    per
      .select(
        ntile(buckets).over(Window.orderBy(col("recency").asc,
          col("__user").asc)).as("r"),
        ntile(buckets).over(Window.orderBy(col("frequency").desc,
          col("__user").asc)).as("f"),
        ntile(buckets).over(Window.orderBy(col("monetary").desc,
          col("__user").asc)).as("m"))
      .groupBy("r", "f", "m").agg(count(lit(1)).as("users"))
  }

  /** Transition dwell times: for every consecutive (prev→next) type
    * pair, the gap-seconds distribution — count, exact median and p90 —
    * "how long do users linger before purchasing?". The timing
    * companion to [[transitions]] (which counts; this times).
    *
    * Same zero-shuffle window shape (one lag() pair over the user sort);
    * the percentiles aggregate per type-pair key — ≤|types|² groups, each
    * holding that pair's gap list.
    *
    * `approxAccuracy`: None (default) = EXACT percentiles — the
    * per-group buffer holds the pair's full gap list and sorts it, fine
    * while per-pair cardinality fits an executor (the default for the
    * oracle gate, which demands exactness). Some(acc) = the 100 TB path:
    * `approx_percentile` keeps an O(acc)-size quantile sketch per group
    * with map-side partials, so per-group memory and the final merge are
    * BOUNDED regardless of pair cardinality; rank error is ≤ n/acc per
    * group. Measured A/B at the sf10 events rung in BENCH_NOTES r14-s2.
    */
  def transitionDwell(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String,
      approxAccuracy: Option[Int] = None): DataFrame = {
    approxAccuracy.foreach(acc =>
      require(acc >= 100, s"approxAccuracy $acc too coarse (>= 100)"))
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val secs = unix_timestamp(col(tsCol))
    def pct(q: Double) = approxAccuracy match {
      case Some(acc) =>
        expr(s"approx_percentile(__gap, $q, $acc)").cast("double")
      case None => expr(s"percentile(__gap, $q)")
    }
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__gap", secs - lag(secs, 1).over(w))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"),
        round(pct(0.5), 4).as("median_gap"),
        round(pct(0.9), 4).as("p90_gap"))
  }

  /** Conversion-window funnel: stage i counts only when it happens
    * STRICTLY AFTER stage i−1 and within `withinSec` of the user's FIRST
    * stage-1 event (first-touch attribution, the product-analytics
    * default — an unbounded [[funnel]] answers "ever converted";
    * this answers "converted within a day"). Greedy-min chaining: the
    * chain anchors at the earliest stage-1 event and each later stage
    * takes its earliest qualifying timestamp.
    *
    * Output: one row per stage — (stage, users, median_secs) where
    * median_secs is the exact median seconds from the stage-1 anchor to
    * reaching that stage, over converting users (NULL for stage 1).
    *
    * Scale shape: the stage timestamps are N conditional window minima
    * over ONE user partitioning (unbounded frame, no sort requirement —
    * chained `withColumn`s share the exchange), then a user-cardinality
    * aggregate; the events table is scanned once.
    */
  def funnelWithin(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], withinSec: Long): DataFrame = {
    require(stages.size >= 2, "funnelWithin needs at least 2 stages")
    require(withinSec > 0)
    val w = Window.partitionBy(col(userCol))
    val secs = unix_timestamp(col(tsCol))
    var df = events.select(col(userCol), secs.as("__sec"), col(typeCol))
      .withColumn("__t1", min(when(col(typeCol) === stages.head,
        col("__sec"))).over(w))
    stages.zipWithIndex.tail.foreach { case (stage, i) =>
      val prev = if (i == 1) col("__t1") else col(s"__t${i}")
      df = df.withColumn(s"__t${i + 1}", min(when(col(typeCol) === stage &&
        col("__sec") > prev && col("__sec") <= col("__t1") + withinSec,
        col("__sec"))).over(w))
    }
    val mins = stages.indices.map(i => min(col(s"__t${i + 1}")).as(s"t${i + 1}"))
    val perUser = df.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    // ONE total aggregate for every stage's count + median, then stacked
    // 1-row selects (the funnelCounts convention)
    val aggs = stages.indices.flatMap { i =>
      Seq(sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)).as(s"u${i + 1}"),
        (if (i == 0) min(lit(null).cast("double"))
         else round(expr(s"percentile(t${i + 1} - t1, 0.5)"), 4))
          .as(s"m${i + 1}"))
    }
    val totals = perUser.agg(aggs.head, aggs.tail: _*)
    stages.indices.map(i => totals.select(lit(i + 1).as("stage"),
        col(s"u${i + 1}").as("users"), col(s"m${i + 1}").as("median_secs")))
      .reduce(_ unionByName _)
  }

  /** Top-k event PATHS (fixed-depth journeys): the most common
    * `a>b>c`-style consecutive type sequences across users — the
    * deeper-view companion to [[transitions]] (a transition matrix can't
    * tell `view>click>purchase` from `click>view>purchase`; paths can).
    *
    * One user-keyed window (two lag()s over ONE sort), then a
    * partial-aggregated count at path-vocabulary cardinality (≤ |types|³)
    * and a TakeOrderedAndProject top-k — no global sort of the count
    * table. Deterministic tie-break on the path string.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__p1", lag(col(typeCol), 1).over(w))
      .withColumn("__p2", lag(col(typeCol), 2).over(w))
      .where(col("__p2").isNotNull)
      .select(concat_ws(">", col("__p2"), col("__p1"), col(typeCol)).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** Per-day event-count anomaly flags: each (type, day)'s count
    * z-scored against the TRAILING `trailing` observed days' mean and
    * sample stddev (the current day excluded — an anomaly must not mask
    * itself), |z| past the threshold flags. The monitoring primitive
    * behind "did ingestion break / did a bot arrive" panels; explicit
    * rows-based window, so gaps in the day grid compare against the
    * previous N OBSERVED days.
    *
    * Scale shape: the event stream reduces to the (type, day) count
    * matrix in one partial/final shuffle; the window sorts only that
    * tiny aggregate. z ranks on the ROUNDED value (engine-independent);
    * warm-up days (no trailing stddev yet) carry NULL z and flag false.
    *
    * A PERFECTLY FLAT baseline (trailing stddev exactly 0 — e.g. a
    * synthetic heartbeat, then a bot arrives) has no finite z; the day
    * still flags whenever its count departs the constant at all, with z
    * left NULL — the "quiet sensor suddenly screams" case must alarm,
    * not hide behind a 0/0.
    */
  def dailyAnomalies(events: DataFrame, tsCol: String, typeCol: String,
      trailing: Int = 7, zThreshold: Double = 2.0,
      roundTo: Int = 4): DataFrame = {
    require(trailing >= 2, s"trailing $trailing must be >= 2")
    val daily = events
      .groupBy(col(typeCol).as("etype"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("etype").orderBy(col("day"))
      .rowsBetween(-trailing, -1)
    daily
      .withColumn("__mu", avg(col("n")).over(w))
      .withColumn("__sd", stddev_samp(col("n")).over(w))
      .withColumn("z", when(col("__sd").isNull || col("__sd") === 0, lit(null))
        .otherwise(round((col("n") - col("__mu")) / col("__sd"), roundTo)))
      .withColumn("is_anomaly",
        when(col("__sd") === 0 && col("__mu").isNotNull,
          col("n") =!= col("__mu")) // flat baseline: ANY departure flags
        .otherwise(coalesce(abs(col("z")) > zThreshold, lit(false))))
      .select(col("etype"), col("day"), col("n"), col("z"), col("is_anomaly"))
  }

  /** Rolling distinct-active-user counts — DAU/WAU/MAU and every other
    * trailing-window active count in ONE pass, exact. For each observed
    * day, `au_w` = distinct users with ≥1 event in the trailing `w` days
    * (window (asof−w, asof]).
    *
    * Scale shape: the event stream reduces to DISTINCT (day, user) first
    * — the 100 TB reduction, one partial-aggregated shuffle; each reduced
    * row then fans out to the ≤max(windows) as-of days it can serve
    * (map-side `sequence` explode, grid-filtered by a broadcast of the
    * observed-day list), a (asof, user)-keyed partial agg keeps each
    * user's NEAREST activity gap, and the per-window counts are
    * conditional sums over that — never a sliding `countDistinct`, never
    * a theta join of events against days. Output: (asof_day,
    * au_<w>...), one row per observed day.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
      windows: Seq[Int] = Seq(1, 7, 28)): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      s"windows $windows must be >= 1")
    val maxW = windows.max
    val du = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
      .distinct()
    // observed-day grid from the RAW events, not from du: a day-only
    // distinct partial-aggregates to #days per map task, where deriving
    // it from du would re-run the (day, user)-distinct shuffle (users×days
    // keys) just to throw the user away (r15) — same day set either way
    val grid = events.select(to_date(col(tsCol)).as("asof_day")).distinct()
    val gaps = du
      .withColumn("asof_day",
        explode(sequence(col("day"), date_add(col("day"), maxW - 1))))
      .join(broadcast(grid), Seq("asof_day"), "left_semi")
      .groupBy("asof_day", "__u")
      .agg(min(datediff(col("asof_day"), col("day"))).as("__gap"))
    val counts = windows.map(w =>
      sum(when(col("__gap") < w, 1L).otherwise(0L)).as(s"au_$w"))
    gaps.groupBy("asof_day").agg(counts.head, counts.tail: _*)
  }

  /** Hopping (sliding) window aggregation: every event contributes to the
    * `ceil(size/stride)` windows covering it — the overlapping complement
    * of the tumbling time bucketizers (a 1h window hopping every 15min is
    * the "smoothed hourly rate" panel of a monitoring UI).
    *
    * Built on Spark's native `window(ts, size, stride)`: the per-event
    * fan-out is a codegen'd Expand under the aggregation (map-side
    * partial agg BEFORE the one shuffle on the window key), never a join
    * against a generated window table. Window starts align to epoch 0 in
    * microsecond arithmetic. Output: `window_start`/`window_end` (epoch
    * seconds) + the aggregate columns.
    */
  def hoppingAgg(events: DataFrame, tsCol: String, sizeSec: Long,
      strideSec: Long, aggs: Seq[Column]): DataFrame = {
    // stride > size is legal too: SAMPLING windows with gaps — Spark's
    // window() rejects that regime (slide must be <= duration), so it
    // gets its own branch below
    require(sizeSec > 0 && strideSec > 0,
      s"need size ($sizeSec) > 0 and stride ($strideSec) > 0")
    require(aggs.nonEmpty, "at least one aggregate required")
    if (strideSec > sizeSec) {
      // gap windows: starts at k·stride, an event belongs iff its offset
      // within the stride is under `size` (events in a gap drop). Plain
      // floor bucketing — no per-event fan-out, epoch-0 aligned like
      // window(); same one-shuffle partial-agg shape
      val epoch = unix_timestamp(col(tsCol))
      events
        .where(pmod(epoch, lit(strideSec)) < sizeSec)
        .groupBy((floor(epoch / strideSec) * strideSec).as("window_start"))
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("window_end", col("window_start") + sizeSec)
    } else events
      .groupBy(window(col(tsCol), s"$sizeSec seconds", s"$strideSec seconds")
        .as("__w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", unix_timestamp(col("__w.start")))
      .withColumn("window_end", unix_timestamp(col("__w.end")))
      .drop("__w")
  }

  /** Multi-touch conversion attribution: credit each touch channel for
    * the conversions it preceded, under the five standard models at once
    * — first-touch, last-touch, linear, position-based (U-shaped
    * 40/20/40) and time-decay (half-life weighted). The "which channel
    * earns the purchase" report every growth team runs.
    *
    * A touch attributes to the user's NEXT conversion when it falls
    * inside `lookbackSeconds` before it and strictly after the user's
    * previous conversion (no double counting across conversions). Next/
    * previous conversion resolve through VALUE-based RANGE window frames
    * on epoch seconds, so equal-timestamp rows cannot flip the
    * assignment run to run (a ROWS frame would depend on tie order); a
    * touch in the same second as a conversion attributes to a LATER one
    * only. Timestamp-tied first/last touches split that model's credit
    * evenly.
    *
    * Output: one row per touch type — n_touches plus the five credit
    * sums (each conversion distributes exactly 1.0 per model among its
    * touches), rounded to 4dp for cross-engine stability of the
    * time-decay pow().
    *
    * Scale shape: two shuffles, both user-prefixed keys — the window
    * pass on `user` and the per-conversion stats on `(user, conv_ts)` —
    * then the final aggregate over the tiny touch-type space. Per-user
    * histories sort in one task, the same bound as every operator here.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, touchTypes: Seq[String], convType: String,
      lookbackSeconds: Long, halfLifeSeconds: Long): DataFrame =
    attributionCredits(events, userCol, tsCol, typeCol, touchTypes, convType,
      lookbackSeconds, halfLifeSeconds)
      .groupBy(col("touch_type").as(typeCol))
      .agg(
        count(lit(1)).as("n_touches"),
        round(sum("first_touch"), 4).as("first_touch"),
        round(sum("last_touch"), 4).as("last_touch"),
        round(sum("linear"), 4).as("linear"),
        round(sum("position_based"), 4).as("position_based"),
        round(sum("time_decay"), 4).as("time_decay"))

  /** [[attribution]] at PER-TOUCH grain: one row per credited touch —
    * `(user, conv_ts, touch_type, touch_ts)` plus the five UNROUNDED
    * model credits that touch earned for that conversion. The same rows
    * [[graft.streaming.StreamingAttribution]] emits as `Credit`s, which
    * is the point: this grain is what [[attributionDiff]] reconciles.
    * [[attribution]] is exactly this grouped by touch type.
    */
  def attributionCredits(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, touchTypes: Seq[String], convType: String,
      lookbackSeconds: Long, halfLifeSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touch types must be non-empty and exclude the conversion type")
    require(lookbackSeconds > 0 && halfLifeSeconds > 0)
    val ev = events
      .where(col(typeCol).isin((touchTypes :+ convType).map(x => x: Any): _*))
      .select(col(userCol).as("__u"),
        unix_timestamp(col(tsCol)).as("__t"), col(typeCol).as("__ty"))
    val convTs = when(col("__ty") === convType, col("__t"))
    val byT = Window.partitionBy("__u").orderBy(col("__t"))
    val wNext = byT.rangeBetween(1, Window.unboundedFollowing)
    // "strictly after the previous conversion" is INHERENT in the
    // next-conversion assignment: __nc is the EARLIEST conversion after
    // the touch, so every conversion before the touch is, by
    // definition, before it — each touch attributes to exactly one
    // conversion with no explicit previous-conversion guard (an earlier
    // formulation computed a prev-conversion window whose filter was
    // provably vacuous: a whole window aggregate per event for nothing)
    val touches = ev
      .withColumn("__nc", min(convTs).over(wNext))
      .where(col("__ty") =!= convType && col("__nc").isNotNull &&
        col("__t") >= col("__nc") - lookbackSeconds)
      .withColumn("__w", pow(lit(0.5),
        (col("__nc") - col("__t")).cast("double") / halfLifeSeconds))
    val wConv = Window.partitionBy("__u", "__nc")
    val stats = touches
      .withColumn("__n", count(lit(1)).over(wConv))
      .withColumn("__tf", min("__t").over(wConv))
      .withColumn("__tl", max("__t").over(wConv))
      .withColumn("__ws", sum("__w").over(wConv))
      .withColumn("__nf",
        sum(when(col("__t") === col("__tf"), 1L).otherwise(0L)).over(wConv))
      .withColumn("__nl",
        sum(when(col("__t") === col("__tl"), 1L).otherwise(0L)).over(wConv))
    val isF = col("__t") === col("__tf")
    val isL = col("__t") === col("__tl")
    val mid = col("__n") - col("__nf") - col("__nl")
    val position =
      when(col("__tf") === col("__tl"), lit(1.0) / col("__n"))
        .when(isF, when(mid > 0, lit(0.4)).otherwise(lit(0.5)) / col("__nf"))
        .when(isL, when(mid > 0, lit(0.4)).otherwise(lit(0.5)) / col("__nl"))
        .otherwise(lit(0.2) / mid)
    stats.select(
      col("__u").as("user"),
      col("__nc").as("conv_ts"),
      col("__ty").as("touch_type"),
      col("__t").as("touch_ts"),
      when(isF, lit(1.0) / col("__nf")).otherwise(lit(0.0)).as("first_touch"),
      when(isL, lit(1.0) / col("__nl")).otherwise(lit(0.0)).as("last_touch"),
      (lit(1.0) / col("__n")).as("linear"),
      position.as("position_based"),
      (col("__w") / col("__ws")).as("time_decay"))
  }

  /** Reconcile STREAMED attribution credits against the batch truth over
    * a closed window — the correction operator the streaming operator's
    * documented trade (a cross-batch late touch is dropped where batch
    * would credit it) needs to be safe to deploy. Same family as the
    * reference's backfill-vs-live split: the stream serves the live
    * number, a nightly closed-window diff emits the corrections.
    *
    * `streamedCredits` are [[graft.streaming.StreamingAttribution.Credit]]
    * rows (camelCase columns); `events` must cover
    * `[windowFromSec - lookbackSeconds, windowToSec)` so every batch
    * credit inside the window sees its full touch history. Both sides are
    * restricted to conversions with `windowFromSec <= conv_ts <
    * windowToSec` — closed means no conversion in the window can still
    * gain touches (run it once `windowToSec + lookbackSeconds` has
    * safely passed the stream's ingestion lag).
    *
    * Output: one row per `(user, conv_ts, touch_type, touch_ts)` whose
    * credits differ, carrying the five model DELTAS (batch minus
    * streamed) and a `kind` — `missing` (batch credited, stream did not:
    * the late-touch case), `extra` (stream credited, batch did not), or
    * `adjusted` (both credited, shares moved — a late touch changes
    * EVERY sibling's linear/position/decay share, not just its own).
    * Adding the deltas to the streamed credits reproduces the batch
    * credits exactly: streamed + corrections == batch, the invariant
    * the equivalence property pins.
    *
    * Scale shape: the batch side is [[attributionCredits]] (two
    * user-keyed shuffles over the window's events); the join is
    * credit-grain (orders of magnitude smaller than events) on a
    * user-prefixed key. Nothing here rescans history outside the window.
    */
  def attributionDiff(streamedCredits: DataFrame, events: DataFrame,
      userCol: String, tsCol: String, typeCol: String,
      touchTypes: Seq[String], convType: String,
      lookbackSeconds: Long, halfLifeSeconds: Long,
      windowFromSec: Long, windowToSec: Long): DataFrame = {
    require(windowFromSec < windowToSec, "empty reconciliation window")
    val models = Seq("first_touch", "last_touch", "linear",
      "position_based", "time_decay")
    val key = Seq("user", "conv_ts", "touch_type", "touch_ts")
    val inWindow = col("conv_ts") >= windowFromSec && col("conv_ts") < windowToSec
    // both sides pre-aggregate to the credit key: duplicate events (same
    // user/ts/type twice) legitimately yield two credit rows per key, and
    // diffing them row-to-row would be a many-to-many join — summed
    // per-key credits are the well-defined comparable quantity
    def perKey(df: DataFrame, prefix: String): DataFrame =
      df.where(inWindow).groupBy(key.map(col): _*)
        .agg(count(lit(1)).as(s"${prefix}_n"),
          models.map(m => sum(col(m)).as(s"${prefix}_$m")): _*)
    val batch = perKey(attributionCredits(events, userCol, tsCol, typeCol,
      touchTypes, convType, lookbackSeconds, halfLifeSeconds), "__b")
    val streamed = perKey(streamedCredits
      .select(col("user"), col("convTs").as("conv_ts"),
        col("touchType").as("touch_type"), col("touchTs").as("touch_ts"),
        col("firstTouch").as("first_touch"), col("lastTouch").as("last_touch"),
        col("linear"), col("positionBased").as("position_based"),
        col("timeDecay").as("time_decay")), "__s")
    val deltas = models.map(m =>
      (coalesce(col(s"__b_$m"), lit(0.0)) -
        coalesce(col(s"__s_$m"), lit(0.0))).as(m))
    // 1e-6: far below any real credit share, far above the fp drift
    // between the stream's Scala fold and the batch plan's sum ordering
    val changed = models.map(m => abs(col(m)) > 1e-6).reduce(_ || _)
    batch.join(streamed, key, "full_outer")
      .select(key.map(col) ++
        (when(col("__s_n").isNull, lit("missing"))
          .when(col("__b_n").isNull, lit("extra"))
          .otherwise(lit("adjusted")).as("kind") +: deltas): _*)
      .where(changed)
  }
}
