package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-value assertions backing the timezone and numeric-bucket gate
  * queries (q_tz_named, q_bucket_numeric_log).
  */
class TimezoneSpec extends SparkSpec {
  import spark.implicits._

  test("named-timezone conversion is DST-correct (LA: Jan=UTC-8, Jul=UTC-7)") {
    val hours = Seq("2024-01-15 00:30:00", "2024-07-15 00:30:00",
        "2024-03-10 09:30:00", "2024-03-10 10:30:00") // DST switch 10:00 UTC
      .toDF("s")
      .select(hour(from_utc_timestamp(col("s").cast("timestamp"),
        "America/Los_Angeles")).as("h"))
      .collect().map(_.getInt(0)).toSeq
    assert(hours == Seq(16, 17, 1, 3)) // 2am local never happens on switch day
  }

  test("fixed-offset and named tz agree for January-only data (LA is PST all month)") {
    val ev = graft.Tables.events(spark, sfDir)
    val fixed = ev.groupBy(hour(col("ts") - expr("INTERVAL 8 HOURS")).as("h"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val named = ev.groupBy(hour(from_utc_timestamp(col("ts"), "America/Los_Angeles")).as("h"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fixed == named)
  }
}

class BucketSpec extends SparkSpec {
  import spark.implicits._

  test("log2-width bucket: exact powers land in their own bucket") {
    val buckets = Seq(1.0, 2.0, 3.0, 4.0, 7.0, 8.0, 31.0, 32.0, 50.0)
      .toDF("x")
      .select(pow(lit(2.0), floor(log(2.0, col("x")) + 1e-9)).cast("long").as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(buckets == Seq(1L, 2L, 2L, 4L, 4L, 8L, 16L, 32L, 32L))
  }
}
