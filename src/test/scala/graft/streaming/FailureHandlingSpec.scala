package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Sink retry with backoff, and redundant-cluster failover where the
  * standby picks up after the active cluster's query dies.
  */
class FailureHandlingSpec extends SparkSpec {
  import spark.implicits._

  test("retryingSave retries transient failures with growing intervals") {
    val attempts = new AtomicInteger(0)
    val t0 = System.nanoTime()
    FailureHandling.retryingSave(
      () => if (attempts.incrementAndGet() < 3) sys.error("transient"),
      initIntervalMs = 20, multiplier = 2.0, maxElapsedMs = 10000)
    val ms = (System.nanoTime() - t0) / 1000000
    assert(attempts.get() == 3)
    assert(ms >= 60, s"expected >= 20 + 40 ms of backoff, got $ms") // 20 + 40
  }

  test("retryingSave rethrows once the elapsed budget is exhausted") {
    val attempts = new AtomicInteger(0)
    val e = intercept[RuntimeException] {
      FailureHandling.retryingSave(
        () => { attempts.incrementAndGet(); sys.error("permanent") },
        initIntervalMs = 10, multiplier = 2.0, maxElapsedMs = 35)
    }
    assert(e.getMessage == "permanent")
    // sleeps 10, 20, then 10+20+40 >= 35 -> rethrow: exactly 3 attempts
    assert(attempts.get() == 3)
  }

  test("a successful cluster short-circuits: later starters never run") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Long]
    src.addData(1L, 2L)
    val secondStarted = new AtomicInteger(0)
    def startOk() = {
      val q = src.toDF().writeStream
        .format("memory").queryName("failover_first_sink").start()
      q.processAllAvailable(); q.stop(); q
    }
    val (idx, _) = FailureHandling.runWithFailover(Seq(
      () => startOk(),
      () => { secondStarted.incrementAndGet(); sys.error("must not run") }))
    assert(idx == 0)
    assert(secondStarted.get() == 0, "standby started despite active success")
  }

  test("failover: the standby cluster's query processes after the active dies") {
    implicit val sqlCtx = spark.sqlContext
    val active = MemoryStream[Long]
    val standby = MemoryStream[Long]
    active.addData(1L, 2L)
    standby.addData(10L, 20L, 30L)
    val dirA = java.nio.file.Files.createTempDirectory("ckpt-active").toString
    val dirB = java.nio.file.Files.createTempDirectory("ckpt-standby").toString

    def startActive() = {
      val q = active.toDF().writeStream
        .option("checkpointLocation", dirA)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          // the active cluster's sink is down; the retry budget exhausts
          FailureHandling.retryingSave(() => sys.error("cluster down"),
            initIntervalMs = 5, multiplier = 2.0, maxElapsedMs = 20)
        }
        .start()
      q.processAllAvailable() // surfaces the failure into awaitTermination
      q
    }
    def startStandby() = {
      val q = standby.toDF().writeStream
        .option("checkpointLocation", dirB)
        .format("memory").queryName("failover_sink")
        .start()
      q.processAllAvailable()
      q.stop() // clean stop = successful termination
      q
    }

    val (idx, _) = FailureHandling.runWithFailover(Seq(
      () => startActive(), () => startStandby()))
    assert(idx == 1, "expected the standby cluster to take over")
    val got = spark.table("failover_sink").as[Long].collect().sorted
    assert(got.sameElements(Array(10L, 20L, 30L)))
  }
}
