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
}
