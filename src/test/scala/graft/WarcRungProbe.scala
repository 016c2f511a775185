package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Crawl-source scale probe (diagnostic main, test scope — run with
  * `sbt "Test/runMain graft.WarcRungProbe <dir>"` after generating a
  * multi-file per-record-gzip fixture): times (a) the parse+project
  * pass and (b) the crawl→dedup→quality→count pipeline over it, and
  * prints the scan's task count so the file-= unit-of-parallelism
  * claim is a measured number, not a doc line. Findings recorded in
  * BENCH_NOTES (round-12 crawl rung).
  */
object WarcRungProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/warc_rung")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[warc-rung] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.WarcSource.warcToDocuments(
      graft.sources.WarcSource.readWarc(spark, dir))
    val nPart = docs.rdd.getNumPartitions
    println(s"[warc-rung] scan partitions: $nPart")
    val n = time("parse + project count")(docs.count())
    println(s"[warc-rung] docs: $n")
    val curated = time("dedup + quality floor") {
      val keep = graft.operators.Dedup.exactKeepMin(docs, "text", "url")
        .select("url")
      docs.join(keep, Seq("url"), "left_semi")
        .where(size(graft.operators.TextOps.tokens(lower(col("text")))) >= 20)
        .count()
    }
    println(s"[warc-rung] curated: $curated")
    spark.stop()
  }
}
