package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every gate query at SPARK_GRAFT_SF_DIR and emits
  * ONE compact JSON line — printed as the final stdout line AND written to
  * BENCH.json (path overridable via SPARK_GRAFT_BENCH_OUT) so the driver can
  * read it even when stdout tailing truncates.
  *
  * Each query is materialized with a noop-format write (full column decode +
  * full plan execution — `count()` would let Spark skip decoding projected
  * columns). Per-query failures are recorded in an `errors` map (value -1)
  * instead of being swallowed.
  *
  * Per-query time = min of two back-to-back runs (see BENCH_NOTES.md: the
  * host exhibits roving multi-second hypervisor stalls that land on a
  * different query every run; min-of-2 measures the engine, and the
  * `noisy` field counts queries whose two runs disagreed >2x).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once so file listing / footer reads / first
    // codegen don't land on whichever query happens to run first
    // (alphabetically q_agg_avg was paying ~5s of one-time cost)
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // build the events day-partitioned archive fixture once up front so the
    // one-time write doesn't land on the first archive-backed query
    try Tables.eventsArchived(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // untimed codegen warmup: the alphabetically-first query was absorbing
    // the suite's first whole-stage-codegen compilation (~1s of noise)
    try Tables.lineitem(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("l_quantity") > 0)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // optional name filter (regex, unanchored) for local family-isolation
    // experiments — the driver sets no filter and times the full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var noisy = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
      // operators persist reused intermediates (signatures, LSH buckets);
      // release them between queries so a 94-query session doesn't
      // accumulate cached corpora
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // each query is timed TWICE and the min reported: this host (a
      // microVM on a shared hypervisor) exhibits roving multi-second
      // freezes — a trivial 20-row query was observed at 13.5 s with 64 ms
      // of GC and an otherwise idle guest, and the victim query differs
      // every run. min-of-2 measures the engine, not the hypervisor; the
      // `noisy` count reports how often the two runs disagreed >2x.
      val secs =
        try {
          val a = once()
          val b = once()
          if (math.max(a, b) > 2 * math.min(a, b) && math.max(a, b) > 1.0) noisy += 1
          // stderr progress (stdout must stay machine-parseable): timestamped
          // so per-query stalls can be correlated with -Xlog:gc output
          System.err.println(
            f"[bench ${System.currentTimeMillis}] $name ${math.min(a, b)}%.3f s (runs: $a%.3f, $b%.3f)")
          math.min(a, b)
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
            e.printStackTrace(System.err)
            System.err.println(f"[bench ${System.currentTimeMillis}] $name FAILED")
            -1.0
        }
      name -> secs
    }
    def r3(v: Double): String = "%.3f".format(v)
    val qs = results.map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      s""""$k":"${v.replaceAll("[\"\\\\\\n\\r\\t]", " ")}""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"noisy":$noisy,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
    // last stdout line, after spark shutdown noise
    println(line)
  }
}
