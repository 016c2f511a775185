package graft.aql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time and numeric bucketizer expressions over epoch-second columns.
  *
  * Bucketizer taxonomy follows /root/reference/query/time_bucketizer.go
  * and query/common/time_bucketizer.go:
  *  - regular: fixed-width seconds ("3 minutes", "hour", "day",
  *    "quarter-hour") → floor to multiple; value = bucket-start epoch
  *  - irregular: calendar-aware ("week", "month", "quarter", "year") →
  *    calendar truncation; value = bucket-start epoch
  *  - recurring regular: position within a fixed-width cycle ("time of
  *    day", "hour of day", "N minutes of day", "hour of week", "day of
  *    week") — value = seconds-into-cycle floored to the base unit (day of
  *    week = Monday-based day index, time_bucketizer.go:44-65)
  *  - recurring irregular: calendar field ("day of month", "day of year",
  *    "month of year", "quarter of year")
  *
  * All functions take the ALREADY timezone-shifted epoch (the compiler does
  * shift-then-floor, mirroring time_bucketizer.go:72-146) and return LONG
  * values; string formatting of values happens in result shaping
  * (query/common/dimval.go:146-230 semantics).
  */
object Bucketizers {

  private val Day = 86400L
  private val Hour = 3600L
  private val Week = 604800L
  // epoch day 0 is a Thursday; +3d aligns cycles to Monday starts
  private val MondayShift = 3 * Day

  /** Regular bucketizer string → width in seconds; None if irregular or
    * recurring (ref ParseRegularTimeBucketizer common/time_bucketizer.go:76+).
    */
  def regularWidthSeconds(b: String): Option[Long] = {
    val norm = b.trim.toLowerCase
    if (norm == "quarter-hour") return Some(15 * 60L)
    val unitSeconds = Map("m" -> 60L, "h" -> Hour, "d" -> Day,
      "minute" -> 60L, "minutes" -> 60L, "hour" -> Hour, "hours" -> Hour, "day" -> Day)
    val parts = norm.split(" ")
    parts match {
      case Array(unit) if unitSeconds.contains(unit) => Some(unitSeconds(unit))
      case Array(n, unit) if n.forall(_.isDigit) && unitSeconds.contains(unit) =>
        Some(n.toLong * unitSeconds(unit))
      case Array(single) if single.length > 1 && single.dropRight(1).forall(_.isDigit)
          && unitSeconds.contains(single.takeRight(1)) =>
        Some(single.dropRight(1).toLong * unitSeconds(single.takeRight(1)))
      case _ => None
    }
  }

  private val irregular = Map(
    "week" -> "week", "month" -> "month", "quarter" -> "quarter", "year" -> "year")

  /** Compile a time bucketizer over a (timezone-shifted) epoch column. */
  def time(e: Column, bucketizer: String): Column = {
    val b = bucketizer.trim.toLowerCase
    val minutesOfDay = """(\d+) minutes of day""".r
    b match {
      case "" => e
      case _ if irregular.contains(b) => ExprCompiler.truncEpoch(e, irregular(b))
      case "time of day" => pmod(e, lit(Day))
      case "hour of day" => pmod(e, lit(Day)) - pmod(e, lit(Hour))
      case minutesOfDay(n) =>
        val w = n.toLong * 60
        pmod(e, lit(Day)) - pmod(e, lit(w))
      case "hour of week" =>
        val w = pmod(e + MondayShift, lit(Week))
        w - pmod(w, lit(Hour))
      case "day of week" => // Monday-based day index 0..6
        pmod(((e - pmod(e, lit(Day))) / Day).cast("long") + 3, lit(7L))
      case "day of month" => dayofmonth(timestamp_seconds(e)).cast("long")
      case "day of year" => dayofyear(timestamp_seconds(e)).cast("long")
      case "month of year" => month(timestamp_seconds(e)).cast("long")
      case "quarter of year" => quarter(timestamp_seconds(e)).cast("long")
      case other =>
        regularWidthSeconds(other) match {
          case Some(w) => e - pmod(e, lit(w))
          case None => throw ParseException(s"unknown time bucketizer: $bucketizer", 0)
        }
    }
  }

  /** Numeric bucketizer (ref query/common/aql.go:27-46); label = lower
    * bound of the containing bucket. Declared but unimplemented in the
    * reference (TODO at aql_compiler.go:1271) — implemented here for
    * surface completeness.
    */
  def numeric(e: Column, nb: AqlNumericBucketizer): Column =
    (nb.bucketWidth, nb.logBase, nb.manualPartitions) match {
      case (Some(w), None, None) =>
        e - pmod(e, lit(w))
      case (None, Some(b), None) =>
        // bucket lower bound pow(b, floor(log_b x)); epsilon guards
        // last-ulp drift at exact powers (see BucketSpec)
        pow(lit(b), floor(log(b, e) + 1e-9))
      case (None, None, Some(parts)) =>
        val first: Column = lit(Double.NegativeInfinity)
        parts.foldLeft(first) { (acc, p) => when(e >= p, lit(p)).otherwise(acc) }
      case _ =>
        throw ParseException("numericBucketizer needs exactly one of bucketWidth/logBase/manualPartitions", 0)
    }
}
