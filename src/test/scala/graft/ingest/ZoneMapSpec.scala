package graft.ingest

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Zone-map / min-max skipping (SURVEY §2.1 row 2): the reference skips
  * live batches whose min/max contradict the filter
  * (/root/reference/query/aql_processor.go:1433-1491); the Spark-native
  * equivalent is parquet row-group stats pruning, which only bites when
  * the data is SORTED by the filtered column — exactly what the archiver's
  * sort columns provide (memstore/archiving.go:59-141).
  *
  * The test measures rows materialized at the columnar→row boundary: with
  * row-group/page pruning, a selective range filter over sorted data
  * materializes only the overlapping row groups; over shuffled data every
  * row group's min/max straddles the range and everything is read.
  */
class ZoneMapSpec extends SparkSpec {

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    // AQE hides the executed scan behind a stage boundary; keep it plain
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      df.collect()
      val boundaries = df.queryExecution.executedPlan.collect {
        case c: org.apache.spark.sql.execution.ColumnarToRowExec => c
      }
      boundaries.map(_.metrics("numOutputRows").value).sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sorted row groups + pushed filter skip; shuffled row groups cannot") {
    val dir = Files.createTempDirectory("graft_zonemap").toString
    try {
      val n = 200000L
      val base = spark.range(n).toDF("k")
        .withColumn("payload", md5(col("k").cast("string")))

      // small row groups so one file holds many zone-map units
      base.orderBy("k").coalesce(1).write
        .option("parquet.block.size", 64 * 1024)
        .parquet(s"$dir/sorted")
      base.orderBy(rand(7)).coalesce(1).write
        .option("parquet.block.size", 64 * 1024)
        .parquet(s"$dir/shuffled")

      // ~1% selective range of EXISTING keys
      val predicate = col("k") >= 100000 && col("k") < 102000
      val sortedRead = scanOutputRows(
        spark.read.parquet(s"$dir/sorted").where(predicate))
      val shuffledRead = scanOutputRows(
        spark.read.parquet(s"$dir/shuffled").where(predicate))

      assert(shuffledRead > n / 2,
        s"shuffled scan should materialize most rows, got $shuffledRead of $n")
      assert(sortedRead < n / 10,
        s"sorted scan materialized $sortedRead of $n rows — no row-group skip")
      assert(sortedRead < shuffledRead)
    } finally {
      val walk = Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(Files.delete(_))
      finally walk.close()
    }
  }
}
