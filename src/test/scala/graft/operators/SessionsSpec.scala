package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "sec", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("sec")).as("ts"), col("event_type"))

  test("sessionize splits on gaps over the threshold, per user") {
    val df = ev(
      (1L, 1L, 0L, "view"), (1L, 2L, 100L, "view"),
      (1L, 3L, 2000L, "view"), (1L, 4L, 2100L, "view"),
      (2L, 5L, 0L, "view"))
    val out = Sessions.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("funnel requires stages strictly in order") {
    val df = ev(
      // full conversion
      (1L, 1L, 10L, "view"), (1L, 2L, 20L, "click"), (1L, 3L, 30L, "purchase"),
      // click BEFORE view: stage 2 never reached
      (2L, 4L, 10L, "click"), (2L, 5L, 20L, "view"), (2L, 6L, 30L, "purchase"),
      // skipped stage: purchase without click
      (3L, 7L, 10L, "view"), (3L, 8L, 20L, "purchase"),
      // stops at stage 2
      (4L, 9L, 10L, "view"), (4L, 10L, 20L, "click"))
    val out = Sessions.funnel(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((true, true, true)))
    assert(out(2L) == ((true, false, false)))
    assert(out(3L) == ((true, false, false)))
    assert(out(4L) == ((true, true, false)))
  }

  test("funnelCounts stacks per-stage user counts") {
    val df = ev(
      (1L, 1L, 10L, "view"), (1L, 2L, 20L, "click"), (1L, 3L, 30L, "purchase"),
      (2L, 4L, 10L, "view"), (2L, 5L, 20L, "click"),
      (3L, 6L, 10L, "view"))
    val out = Sessions.funnelCounts(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("cohortRetention buckets users by first-seen period") {
    // periods of 100s; user 1 first in p0, returns p1 and p3; user 2
    // first in p1, returns p1 (same period twice counts once); user 3
    // only p0
    val df = ev(
      (1L, 1L, 10L, "view"), (1L, 2L, 150L, "view"), (1L, 3L, 399L, "view"),
      (2L, 4L, 110L, "view"), (2L, 5L, 190L, "view"),
      (3L, 6L, 50L, "view"))
    val out = Sessions.cohortRetention(df, "user_id", "ts", 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("sessionize and funnel share one sort: a single Window exchange") {
    val df = ev((1L, 1L, 0L, "view"), (1L, 2L, 10L, "click"))
    val plan = Sessions.funnel(df, "user_id", "ts", "event_id", "event_type",
      Seq("view", "click", "purchase")).queryExecution.optimizedPlan.toString
    val windows = plan.split("\n").count(_.trim.startsWith("Window"))
    assert(windows <= 2, s"funnel fragmented into $windows Window nodes:\n$plan")
  }

  test("hoppingAgg: each event lands in ceil(size/stride) windows, edges exact") {
    // size 10, stride 5: event at t lands in starts {5*floor(t/5), -5}
    // intersected with (t-10, t]
    val df = ev((1L, 1L, 0L, "a"), (1L, 2L, 7L, "a"), (1L, 3L, 10L, "a"))
    val got = Sessions.hoppingAgg(df, "ts", 10, 5, Seq(count(lit(1)).as("cnt")))
      .select("window_start", "window_end", "cnt")
      .orderBy("window_start")
      .as[(Long, Long, Long)].collect().toSeq
    // t=0 → windows [-5,5),[0,10); t=7 → [0,10),[5,15); t=10 → [5,15),[10,20)
    assert(got == Seq((-5L, 5L, 1L), (0L, 10L, 2L), (5L, 15L, 2L), (10L, 20L, 1L)),
      got.toString)
  }

  test("hoppingAgg stride > size samples with gaps (events between windows drop)") {
    // size 5, stride 10: windows [0,5), [10,15), ... — t=7 falls in a gap
    val df = ev((1L, 1L, 0L, "a"), (1L, 2L, 7L, "a"), (1L, 3L, 12L, "a"))
    val got = Sessions.hoppingAgg(df, "ts", 5, 10, Seq(count(lit(1)).as("cnt")))
      .select("window_start", "window_end", "cnt")
      .orderBy("window_start")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 5L, 1L), (10L, 15L, 1L)), got.toString)
  }

  test("hoppingAgg expands map-side under one aggregation shuffle") {
    val plan = Sessions.hoppingAgg(ev((1L, 1L, 0L, "a")), "ts", 3600, 900,
      Seq(count(lit(1)).as("cnt"))).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand in hopping plan:\n${plan.take(2000)}")
    assert(plan.split("\n").count(_.contains("Exchange")) <= 1,
      s"hopping agg must shuffle once:\n${plan.take(2000)}")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"expected partial aggregation:\n${plan.take(2000)}")
  }

  test("transitions counts prev→next pairs with the _start state") {
    import spark.implicits._
    // user 1: a@1, b@2, a@2 (tie with id 3 > id 2 so b precedes a);
    // user 2: b@1 alone
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 2L, 3L, "a"),
      (2L, 1L, 4L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessions.transitions(ev, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got == Map(
      ("_start", "a") -> 1L, ("_start", "b") -> 1L,
      ("a", "b") -> 1L, ("b", "a") -> 1L), s"$got")
  }

  test("transitions ties on ts break by the tie column, not input order") {
    import spark.implicits._
    // both events at ts=5; event_id order decides c→d, never d→c
    val ev = Seq((1L, 5L, 9L, "d"), (1L, 5L, 8L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessions.transitions(ev, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got == Map(("_start", "c") -> 1L, ("c", "d") -> 1L), s"$got")
  }

  test("decayedCount: one half-life halves, as-of-now counts full") {
    val df = ev(
      (1L, 1L, 1000L, "a"),  // at as-of → weight 1
      (1L, 2L, 0L, "a"),     // one half-life before → weight 1/2
      (1L, 3L, 1000L, "b"))
    val got = Sessions.decayedCount(df, "ts", Seq("event_type"),
        asOfEpoch = 1000L, halfLifeSec = 1000.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(math.abs(got("a")._1 - 1.5) < 1e-12, s"$got")
    assert(got("a")._2 == 2L && got("b")._2 == 1L)
    assert(math.abs(got("b")._1 - 1.0) < 1e-12)
  }

  test("coOccurrenceLift: attracting pair > 1, repelling pair < 1") {
    // 4 users: {a,b}, {a,b}, {a,c}, {c}. P(a)=3/4, P(b)=2/4, P(c)=2/4.
    // lift(a,b) = (2/4)/(3/4 · 2/4) = 4/3; lift(a,c) = (1/4)/(3/8) = 2/3;
    // (b,c) never co-occur → no row (count-based, zero pairs absent)
    val df = ev(
      (1L, 1L, 0L, "a"), (1L, 2L, 1L, "b"), (1L, 3L, 2L, "b"),
      (2L, 4L, 0L, "a"), (2L, 5L, 1L, "b"),
      (3L, 6L, 0L, "a"), (3L, 7L, 1L, "c"),
      (4L, 8L, 0L, "c"))
    val got = Sessions.coOccurrenceLift(df, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> // (ta, tb)
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c")), s"$got")
    assert(got(("a", "b"))._1 == 2L &&
      math.abs(got(("a", "b"))._2 - 4.0 / 3) < 1e-12, s"$got")
    assert(got(("a", "c"))._1 == 1L &&
      math.abs(got(("a", "c"))._2 - 2.0 / 3) < 1e-12, s"$got")
  }

  test("funnelWithin: window bound, chain order, and exact medians") {
    // A converts fully inside the window; B's click lands outside 1000s;
    // C has a pre-view click (doesn't count) and a purchase with NO
    // qualifying click before it (chain broken → stage 3 null); D's
    // purchase precedes its click (order violated → stage 3 null).
    val df = ev(
      (1L, 1L, 0L, "view"), (1L, 2L, 100L, "click"), (1L, 3L, 200L, "purchase"),
      (2L, 4L, 0L, "view"), (2L, 5L, 2000L, "click"),
      (3L, 6L, 0L, "click"), (3L, 7L, 10L, "view"), (3L, 8L, 20L, "purchase"),
      (4L, 9L, 0L, "view"), (4L, 10L, 50L, "purchase"), (4L, 11L, 100L, "click"))
    val got = Sessions.funnelWithin(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), withinSec = 1000L)
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(got(0) == ((1, 4L, None)), got.toString)
    assert(got(1)._2 == 2L, s"A and D click within window: $got")
    assert(got(1)._3.contains(100.0), got.toString)
    assert(got(2)._2 == 1L && got(2)._3.contains(200.0),
      s"only A completes the ordered chain: $got")
  }

  test("topPaths counts depth-3 journeys; short histories contribute nothing") {
    val df = ev(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "c"),
      (1L, 4L, 40L, "b"),
      (2L, 5L, 10L, "a"), (2L, 6L, 20L, "b"))
    val got = Sessions.topPaths(df, "user_id", "ts", "event_id",
        "event_type", k = 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b>c", 1L), ("b>c>b", 1L)), got.toString)
  }

  test("dailyAnomalies z-scores against the trailing window, current day excluded") {
    // type x daily counts: d1=9, d2=11, d3=10, d4=100 (trailing=2).
    // d1/d2: no trailing stddev yet → NULL z, no flag. d3: mu=10,
    // sd=sqrt(2) → z=0. d4: mu=10.5, sd=sqrt(0.5) → z≈126.57 → flagged.
    val day = 86400L
    val rows = (1 to 9).map(i => (1L, i.toLong, day + i, "x")) ++
      (10 to 20).map(i => (1L, i.toLong, 2 * day + i, "x")) ++
      (21 to 30).map(i => (1L, i.toLong, 3 * day + i, "x")) ++
      (31 to 130).map(i => (1L, i.toLong, 4 * day + i, "x"))
    val got = Sessions.dailyAnomalies(ev(rows: _*), "ts", "event_type",
        trailing = 2, zThreshold = 2.0)
      .orderBy("day").collect()
      .map(r => (r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toSeq
    assert(got.map(_._1) == Seq(9L, 11L, 10L, 100L), got.toString)
    assert(got(0)._2.isEmpty && !got(0)._3, "warm-up day must not flag")
    assert(got(1)._2.isEmpty && !got(1)._3,
      "single-row trailing window has no sample stddev")
    assert(got(2)._2.contains(0.0) && !got(2)._3, got.toString)
    val z4 = got(3)._2.get.asInstanceOf[Double]
    assert(math.abs(z4 - 126.5721) < 1e-4 && got(3)._3, got.toString)
  }

  test("dailyAnomalies flags a spike after a perfectly FLAT baseline " +
      "(sd=0 must not mask the bot-arrival case)") {
    // 10 events/day for 3 days, then 100: trailing sd is exactly 0 at
    // every post-warmup day — z has no finite value (NULL), but d4 must
    // still flag; d3 (same constant) must NOT.
    val day = 86400L
    val rows = (for (d <- 1 to 3; i <- 1 to 10)
      yield (1L, (d * 100 + i).toLong, d * day + i, "x")) ++
      (1 to 100).map(i => (1L, (500 + i).toLong, 4 * day + i, "x"))
    val got = Sessions.dailyAnomalies(ev(rows: _*), "ts", "event_type",
        trailing = 2, zThreshold = 2.0)
      .orderBy("day").collect()
      .map(r => (r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toSeq
    assert(got.map(_._1) == Seq(10L, 10L, 10L, 100L), got.toString)
    assert(!got(2)._3 && got(2)._2.isEmpty,
      "constant day on a flat baseline must stay quiet")
    assert(got(3)._3 && got(3)._2.isEmpty,
      s"flat-baseline spike must flag (z stays NULL): $got")
  }

  test("rfmSegments quartiles best-first with id tiebreaks") {
    // 4 users, 2 buckets: user 1 = recent+frequent, user 4 = stale+light.
    // value sums: u1=40, u2=30, u3=20, u4=10 → m buckets (1,1,2,2).
    // recency (asOf 100): u1 last@90 → 10s, u2@80, u3@20, u4@10 →
    // r buckets (1,1,2,2). frequency: u1=3, u2=2, u3=2, u4=1 → desc
    // order u1,u2,u3,u4 (tie u2/u3 by id) → f buckets (1,1,2,2).
    val df = Seq(
      (1L, 1L, 50L, 10.0), (1L, 2L, 70L, 10.0), (1L, 3L, 90L, 20.0),
      (2L, 4L, 60L, 15.0), (2L, 5L, 80L, 15.0),
      (3L, 6L, 10L, 5.0), (3L, 7L, 20L, 15.0),
      (4L, 8L, 10L, 10.0))
      .toDF("user_id", "event_id", "sec", "value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("value"))
    val got = Sessions.rfmSegments(df, "user_id", "ts", "value",
        asOfEpoch = 100L, buckets = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    assert(got == Map((1, 1, 1) -> 2L, (2, 2, 2) -> 2L), s"$got")
  }

  test("transitionDwell: exact hand-checked percentiles; approx mode agrees " +
      "within sketch tolerance and returns the same schema") {
    // u1: view@0 -> click@10 -> view@40 -> click@100 gives view->click
    // gaps {10, 60} and click->view gap {30}; u2 adds view->click {20}
    val df = ev(
      (1L, 1L, 0L, "view"), (1L, 2L, 10L, "click"),
      (1L, 3L, 40L, "view"), (1L, 4L, 100L, "click"),
      (2L, 5L, 0L, "view"), (2L, 6L, 20L, "click"))
    val exact = Sessions.transitionDwell(df, "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // view->click gaps {10,20,60}: median 20, p90 exact interpolation
    // 0.9*(3-1)=1.8 -> 20 + 0.8*(60-20) = 52
    assert(exact(("view", "click")) == ((3L, 20.0, 52.0)), s"$exact")
    assert(exact(("click", "view")) == ((1L, 30.0, 30.0)), s"$exact")
    // the 100 TB path: bounded-sketch percentiles. At this cardinality
    // the sketch is lossless for the median; p90 may sit on either
    // neighboring observation (rank error <= n/accuracy), never outside
    val approx = Sessions.transitionDwell(df, "user_id", "ts", "event_id",
        "event_type", approxAccuracy = Some(10000))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet == exact.keySet)
    val (n, med, p90) = approx(("view", "click"))
    assert(n == 3L && med == 20.0, s"$approx")
    assert(p90 >= 20.0 && p90 <= 60.0, s"p90 outside the gap range: $approx")
  }

  test("attribution: five models, lookback/boundary rules, hand-computed credits") {
    val df = ev(
      // user 1: three touches -> one conversion at t=1000
      //   view@100 (first), click@500 (middle), view@900 (last)
      (1L, 1L, 100L, "view"), (1L, 2L, 500L, "click"), (1L, 3L, 900L, "view"),
      (1L, 4L, 1000L, "purchase"),
      // a second conversion at 2000 with ONE touch after the first conv
      (1L, 5L, 1500L, "click"), (1L, 6L, 2000L, "purchase"),
      // user 2: touch OUTSIDE the lookback -> never credited
      (2L, 7L, 0L, "view"), (2L, 8L, 5000L, "purchase"),
      // user 3: touch in the SAME second as the conversion -> excluded
      (3L, 9L, 700L, "click"), (3L, 10L, 700L, "purchase"))
    val out = Sessions.attribution(df, "user_id", "ts", "event_type",
        Seq("view", "click"), "purchase",
        lookbackSeconds = 1000L, halfLifeSeconds = 400L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // conversion 1 (u1@1000): view@100 first, view@900 last, click middle
    //   first: view 1.0 / last: view 1.0 / linear: view 2/3, click 1/3
    //   position: view 0.4+0.4, click 0.2
    // conversion 2 (u1@2000): single click -> 1.0 everywhere
    val (vn, vf, vl, vlin, vpos) = out("view")
    val (cn, cf, cl, clin, cpos) = out("click")
    assert((vn, cn) == (2L, 2L), s"$out")
    assert(vf == 1.0 && cf == 1.0, s"first: $out")
    assert(vl == 1.0 && cl == 1.0, s"last: $out")
    assert(vlin == 0.6667 && clin == 1.3333, s"linear: $out")
    assert(vpos == 0.8 && cpos == 1.2, s"position: $out")
    // every conversion with touches distributes exactly 1.0 per model
    val decays = Sessions.attribution(df, "user_id", "ts", "event_type",
        Seq("view", "click"), "purchase", 1000L, 400L)
      .agg(sum("time_decay"), sum("linear")).head()
    assert(math.abs(decays.getDouble(0) - 2.0) < 1e-3 &&
      math.abs(decays.getDouble(1) - 2.0) < 1e-3, s"$decays")
  }
}
