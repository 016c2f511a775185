package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local plan/schema inspection; not part of the library. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    println(s"entry rows: ${e.count()}")
    e.show(5, truncate = false)
    spark.stop()
  }
}
