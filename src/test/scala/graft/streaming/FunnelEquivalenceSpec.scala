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

  /** Drive the streaming funnel over explicit micro-batches, carrying
    * each user's keyed state — the only way to EXERCISE the cross-batch
    * late-chaining drop.
    */
  private def runMicroBatches(batches: Seq[Seq[Event]],
      stages: Seq[String]): Seq[StreamingFunnel.Advance] = {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val users = batches.flatten.map(_.user).distinct
    users.flatMap { u =>
      var carried: Option[StreamingFunnel.FunnelState] = None
      batches.flatMap { b =>
        val es = b.filter(_.user == u)
        if (es.isEmpty) Nil
        else {
          val st = TestGroupState.create[StreamingFunnel.FunnelState](
            carried.map(Optional.of[StreamingFunnel.FunnelState])
              .getOrElse(Optional.empty[StreamingFunnel.FunnelState]),
            GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 0L,
            eventTimeWatermarkMs = Optional.empty[Long], hasTimedOut = false)
          val out = StreamingFunnel.advanceGroupForTest(stages.toIndexedSeq)(
            u, es.iterator, st).toSeq
          if (st.exists) carried = Some(st.get)
          out
        }
      }
    }
  }

  private val stages = Seq("view", "click", "purchase")

  private def eventsDf(evs: Seq[Event]) =
    evs.zipWithIndex
      .map { case (e, i) => (e.user, i.toLong, e.ts, e.eventType) }
      .toDF("user_id", "event_id", "sec", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("sec")).as("ts"), col("event_type"))

  test("a cross-batch late stage event produces exactly the correcting diff row") {
    // s1@10 and s3@30 arrive first; the chaining s2@20 arrives LATE in a
    // later micro-batch. The stream advances to stage 2 on the late s2
    // (20 >= 10) but s3 was already consumed at stage 1 and is gone —
    // batch over the full history reaches stage 3. funnelDiff must emit
    // the one correcting row and nothing else.
    val all = Seq(Event(1, 10, "view"), Event(1, 20, "click"),
      Event(1, 30, "purchase"))
    val streamed = runMicroBatches(
      Seq(Seq(Event(1, 10, "view"), Event(1, 30, "purchase")),
        Seq(Event(1, 20, "click"))), stages)
    assert(streamed.map(_.stage).max == 2,
      s"stream should sit at stage 2 after the late click: $streamed")
    val diff = graft.operators.Sessions.funnelDiff(
        spark.createDataFrame(streamed), eventsDf(all),
        "user_id", "ts", "event_id", "event_type", stages)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(diff.toSeq == Seq((1L, 2, 3, "missed")), diff.mkString(","))
  }

  test("streamed + funnelDiff corrections == batch over random late splits") {
    val genSplit: Gen[(List[Event], List[Boolean])] = for {
      evs <- genEvents
      flags <- Gen.listOfN(evs.length, Gen.prob(0.5))
    } yield (evs, flags)
    forAllN(genSplit, n = 25) { case (evs, flags) =>
      val batch1 = evs.zip(flags).collect { case (e, true) => e }
      val batch2 = evs.zip(flags).collect { case (e, false) => e }
      val streamed = runMicroBatches(Seq(batch1, batch2), stages)
      val streamedStage = streamed.groupBy(_.user)
        .map { case (u, as) => u -> as.map(_.stage).max }
      val df = eventsDf(evs)
      val batchStage = graft.operators.Sessions.funnel(df, "user_id", "ts",
          "event_id", "event_type", stages)
        .collect().map(r => r.getLong(0) ->
          ((1 to 3).count(i => r.getBoolean(r.fieldIndex(s"reached_$i")))))
        .toMap
      val streamedDf =
        if (streamed.isEmpty)
          Seq.empty[StreamingFunnel.Advance].toDF("user", "stage", "ts")
        else spark.createDataFrame(streamed)
      val diff = graft.operators.Sessions.funnelDiff(streamedDf, df,
          "user_id", "ts", "event_id", "event_type", stages)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
        .toMap
      // no over-advance is possible without a TTL reset
      diff.values.foreach { case (_, _, kind) =>
        assert(kind == "missed", s"unexpected over-advance: $diff\n$evs") }
      // corrected live view == batch truth for EVERY user
      val allUsers = batchStage.keySet ++ streamedStage.keySet
      allUsers.foreach { u =>
        val s = streamedStage.getOrElse(u, 0)
        val b = batchStage.getOrElse(u, 0)
        diff.get(u) match {
          case Some((ds, db, _)) =>
            assert(ds == s && db == b,
              s"user $u: diff ($ds -> $db) vs streamed $s batch $b\n$evs")
          case None =>
            assert(s == b, s"user $u: streamed $s != batch $b but no diff row\n$evs")
        }
      }
    }
  }
}
