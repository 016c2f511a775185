package graft.aql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every time bucketizer pinned against hand-computed values for a known
  * instant: 2024-01-30T13:47:21Z = epoch 1706622441 (a Tuesday; day 30 of
  * year; Q1; minute 827 of day).
  */
class BucketizersSpec extends SparkSpec {
  import spark.implicits._

  private val T = 1706622441L

  private def bucket(b: String): Long =
    Seq(T).toDF("e").select(Bucketizers.time(col("e"), b).as("v"))
      .head().getLong(0)

  test("regular bucketizers floor to fixed widths") {
    assert(bucket("minute") == 1706622420L)
    assert(bucket("5 minutes") == 1706622300L)
    assert(bucket("quarter-hour") == 1706622300L) // 13:45
    assert(bucket("hour") == 1706619600L)
    assert(bucket("4 hours") == 1706616000L)
    assert(bucket("day") == 1706572800L)
    assert(bucket("3m") == 1706622300L) // 13:45, 3-min grid
  }

  test("irregular bucketizers are calendar-aware") {
    assert(bucket("week") == 1706486400L) // Monday 2024-01-29
    assert(bucket("month") == 1704067200L) // 2024-01-01
    assert(bucket("quarter") == 1704067200L)
    assert(bucket("year") == 1704067200L)
  }

  test("recurring bucketizers: position within a cycle") {
    assert(bucket("time of day") == 13 * 3600 + 47 * 60 + 21)
    assert(bucket("hour of day") == 13 * 3600)
    assert(bucket("30 minutes of day") == 13 * 3600 + 1800)
    assert(bucket("day of week") == 1) // Tuesday, Monday-based 0..6
    assert(bucket("hour of week") == 86400 + 13 * 3600) // Tue 13:00 into the week
    assert(bucket("day of month") == 30)
    assert(bucket("day of year") == 30)
    assert(bucket("month of year") == 1)
    assert(bucket("quarter of year") == 1)
  }

  test("unknown bucketizer rejected") {
    intercept[ParseException](Bucketizers.time(col("e"), "fortnight"))
  }
}
