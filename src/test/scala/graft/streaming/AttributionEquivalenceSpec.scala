package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import StreamingAttribution.Event

/** Batch ≡ streaming attribution: over random event histories, the
  * per-channel credit totals from [[graft.operators.Sessions.attribution]]
  * (the windowed batch operator) and [[StreamingAttribution]] (the keyed
  * state operator, driven whole-history-in-one-batch so no cross-batch
  * late-touch divergence applies) must agree to rounding on every model.
  * Two independently-written implementations of five models with shared
  * boundary rules — an equivalence property catches a boundary drift in
  * either that a hand-picked fixture would miss.
  *
  * Fixed-seed generators (the PropertySpec discipline).
  */
class AttributionEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0xA77B00L + i)))
    }

  import org.apache.spark.api.java.Optional
  import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

  /** Drive the streaming credit function over an explicit micro-batch
    * sequence, carrying each user's keyed state across batches — the
    * deterministic stand-in for a real multi-batch streaming run, and
    * the only way to EXERCISE the cross-batch late-touch drop.
    */
  private def runMicroBatches(batches: Seq[Seq[Event]],
      touchTypes: Set[String], convType: String, lookback: Long,
      halfLife: Long): Seq[StreamingAttribution.Credit] = {
    val fn = StreamingAttribution.creditGroup(touchTypes, convType,
      lookback, halfLife, maxTouches = 1024) _
    val users = batches.flatten.map(_.user).distinct
    users.flatMap { u =>
      var carried: Option[StreamingAttribution.AttState] = None
      batches.flatMap { b =>
        val es = b.filter(_.user == u)
        if (es.isEmpty) Nil
        else {
          val st = TestGroupState.create[StreamingAttribution.AttState](
            carried.map(Optional.of[StreamingAttribution.AttState])
              .getOrElse(Optional.empty[StreamingAttribution.AttState]),
            GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 0L,
            eventTimeWatermarkMs = Optional.empty[Long], hasTimedOut = false)
          val out = fn(u, es.iterator, st).toSeq
          if (st.exists) carried = Some(st.get)
          out
        }
      }
    }
  }

  private def toCreditsDf(cs: Seq[StreamingAttribution.Credit]) =
    spark.createDataFrame(cs)

  private val genEvents: Gen[List[Event]] = for {
    nUsers <- Gen.chooseNum(1, 5)
    n <- Gen.chooseNum(5, 60)
    evs <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(1, nUsers)
      // coarse timestamps force plenty of exact ties (the boundary cases)
      t <- Gen.chooseNum(0, 40).map(_ * 100L)
      ty <- Gen.frequency(3 -> Gen.const("view"), 3 -> Gen.const("click"),
        2 -> Gen.const("purchase"))
    } yield Event(u.toLong, t, ty))
  } yield evs

  test("batch and streaming attribution agree on every model over random histories") {
    val lookback = 1500L
    val halfLife = 400L
    forAllN(genEvents, n = 25) { evs =>
      val df = evs.toDF("user_id", "sec", "event_type")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
          col("event_type"))
      val batch = graft.operators.Sessions.attribution(df, "user_id", "ts",
          "event_type", Seq("view", "click"), "purchase", lookback, halfLife)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getDouble(6))).toMap

      // whole history in one group invocation = one micro-batch
      import org.apache.spark.api.java.Optional
      import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
      val fn = StreamingAttribution.creditGroup(Set("view", "click"),
        "purchase", lookback, halfLife, maxTouches = 1024) _
      val streaming = evs.groupBy(_.user).toSeq.flatMap { case (u, es) =>
        val st = TestGroupState.create[StreamingAttribution.AttState](
          Optional.empty[StreamingAttribution.AttState],
          GroupStateTimeout.NoTimeout,
          batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.empty[Long],
          hasTimedOut = false)
        fn(u, es.iterator, st).toSeq
      }
      val streamTotals = streaming.groupBy(_.touchType).map { case (ty, cs) =>
        ty -> (cs.map(_.firstTouch).sum, cs.map(_.lastTouch).sum,
          cs.map(_.linear).sum, cs.map(_.positionBased).sum,
          cs.map(_.timeDecay).sum)
      }

      assert(batch.keySet == streamTotals.keySet,
        s"credited channels differ: ${batch.keySet} vs ${streamTotals.keySet}\n$evs")
      batch.foreach { case (ty, (f, l, lin, pos, dec)) =>
        val (sf, sl, slin, spos, sdec) = streamTotals(ty)
        def close(a: Double, b: Double) = math.abs(a - b) < 1e-3
        assert(close(f, sf) && close(l, sl) && close(lin, slin) &&
          close(pos, spos) && close(dec, sdec),
          s"$ty: batch ($f,$l,$lin,$pos,$dec) != streaming " +
            s"($sf,$sl,$slin,$spos,$sdec)\n$evs")
      }
    }
  }

  test("a cross-batch late touch produces exactly the correcting delta") {
    // user 1's click@200 arrives AFTER its purchase@300 was credited (a
    // later micro-batch) — the streaming operator drops it by documented
    // trade; attributionDiff over the closed window must emit exactly
    // the rows that turn the streamed credits into the batch credits.
    val lookback = 1500L
    val halfLife = 400L
    val all = Seq(Event(1, 100, "view"), Event(1, 200, "click"),
      Event(1, 300, "purchase"))
    val streamed = runMicroBatches(
      Seq(Seq(Event(1, 100, "view"), Event(1, 300, "purchase")),
        Seq(Event(1, 200, "click"))),
      Set("view", "click"), "purchase", lookback, halfLife)
    // the stream credited the conversion on the view alone (all five
    // models = 1.0) and dropped the late click
    assert(streamed.map(c => (c.touchType, c.touchTs)) == Seq(("view", 100L)))
    assert(streamed.head.linear == 1.0 && streamed.head.lastTouch == 1.0)

    val eventsDf = all.toDF("user_id", "sec", "event_type")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_type"))
    val diff = graft.operators.Sessions.attributionDiff(
        toCreditsDf(streamed), eventsDf, "user_id", "ts", "event_type",
        Seq("view", "click"), "purchase", lookback, halfLife,
        windowFromSec = 0L, windowToSec = 1000L)
      .collect().map(r => (r.getString(2), r.getLong(3)) ->
        (r.getString(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
          r.getDouble(8), r.getDouble(9))).toMap

    // batch truth: view@100 first-touch, click@200 last-touch; linear and
    // position split 50/50; decay shares from the half-life weights
    val wView = math.pow(0.5, 200.0 / halfLife)
    val wClick = math.pow(0.5, 100.0 / halfLife)
    val decayView = wView / (wView + wClick)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(diff.keySet == Set(("view", 100L), ("click", 200L)),
      s"unexpected correction keys: ${diff.keySet}")
    val (kV, fV, lV, linV, posV, decV) = diff(("view", 100L))
    assert(kV == "adjusted" && close(fV, 0.0) && close(lV, -1.0) &&
      close(linV, -0.5) && close(posV, -0.5) && close(decV, decayView - 1.0),
      s"view delta: $kV $fV $lV $linV $posV $decV")
    val (kC, fC, lC, linC, posC, decC) = diff(("click", 200L))
    assert(kC == "missing" && close(fC, 0.0) && close(lC, 1.0) &&
      close(linC, 0.5) && close(posC, 0.5) && close(decC, 1.0 - decayView),
      s"click delta: $kC $fC $lC $linC $posC $decC")
  }

  test("streamed + corrections == batch over random late-touch histories") {
    // the deployable invariant: whatever a multi-batch split makes the
    // stream drop or misassign (late touches, late conversions, shifted
    // shares), the closed-window diff's deltas restore the batch truth
    val lookback = 1500L
    val halfLife = 400L
    val genSplit: Gen[(List[Event], List[Boolean])] = for {
      evs <- genEvents
      flags <- Gen.listOfN(evs.length, Gen.prob(0.5))
    } yield (evs, flags)
    forAllN(genSplit, n = 20) { case (evs, flags) =>
      val batch1 = evs.zip(flags).collect { case (e, true) => e }
      val batch2 = evs.zip(flags).collect { case (e, false) => e }
      val streamed = runMicroBatches(Seq(batch1, batch2),
        Set("view", "click"), "purchase", lookback, halfLife)

      val eventsDf = evs.toDF("user_id", "sec", "event_type")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
          col("event_type"))
      val batchTotals = graft.operators.Sessions.attributionCredits(eventsDf,
          "user_id", "ts", "event_type", Seq("view", "click"), "purchase",
          lookback, halfLife)
        .groupBy("touch_type")
        .agg(sum("first_touch"), sum("last_touch"), sum("linear"),
          sum("position_based"), sum("time_decay"))
        .collect().map(r => r.getString(0) -> Seq(r.getDouble(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap

      val corrections = graft.operators.Sessions.attributionDiff(
          toCreditsDf(streamed), eventsDf, "user_id", "ts", "event_type",
          Seq("view", "click"), "purchase", lookback, halfLife,
          windowFromSec = 0L, windowToSec = 100000L)
        .collect()
        .groupBy(_.getString(2))
        .map { case (ty, rows) =>
          ty -> (5 to 9).map(i => rows.map(_.getDouble(i)).sum) }
      val streamTotals = streamed.groupBy(_.touchType).map { case (ty, cs) =>
        ty -> Seq(cs.map(_.firstTouch).sum, cs.map(_.lastTouch).sum,
          cs.map(_.linear).sum, cs.map(_.positionBased).sum,
          cs.map(_.timeDecay).sum)
      }

      val types = batchTotals.keySet ++ streamTotals.keySet ++ corrections.keySet
      types.foreach { ty =>
        val b = batchTotals.getOrElse(ty, Seq.fill(5)(0.0))
        val s = streamTotals.getOrElse(ty, Seq.fill(5)(0.0))
        val c = corrections.getOrElse(ty, Seq.fill(5)(0.0))
        b.indices.foreach { i =>
          assert(math.abs(s(i) + c(i) - b(i)) < 1e-3,
            s"$ty model $i: streamed ${s(i)} + corrections ${c(i)} != " +
              s"batch ${b(i)}\nsplit: $batch1 | $batch2")
        }
      }
    }
  }
}
