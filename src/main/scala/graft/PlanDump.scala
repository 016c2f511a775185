package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for gate queries to files — the
  * optimization-round evidence trail (plans/r15/<query>_<tag>.txt).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <nameRegex>
  *
  * Mirrors Bench's session config (same master/core/shuffle settings) so
  * the captured plans are the ones the bench actually executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val pattern = args(3).r
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the ONE shared builder (BenchSession) — a captured plan is always
    // the plan the bench executes, by construction
    val spark = BenchSession.build(sfDir, cpus)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => pattern.findFirstIn(name).isDefined }
      .foreach { case (name, fn) =>
        try {
          spark.catalog.clearCache()
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
          System.err.println(s"[plandump] wrote $name")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
