package graft.aql

import java.time.{DayOfWeek, Instant, LocalDate, LocalDateTime, ZoneId, ZoneOffset, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** Natural-language time expression parsing for AQL time filters.
  *
  * Semantics follow /root/reference/query/common/time_filter.go:241-397:
  *   - "now"
  *   - "today" / "yesterday" (sugar for "this day" / "last day")
  *   - "this <unit>" / "last <unit>" (unit ∈ year, quarter, month, week,
  *     day, hour, quarter-hour, minute, second)
  *   - "<N> <unit>s ago"
  *   - "{±N}{y|q|M|w|d|h|m|s}" single-token offsets, e.g. "-2d"
  *   - absolute: "2018", "2018-Q1", "2018-03", "2018-03-05",
  *     "2018-03-05 13", "2018-03-05 13:45"
  *   - raw epoch seconds (> 9999999) or milliseconds (> 99999999999)
  *
  * Every expression resolves to the [start, end) of a calendar unit; a
  * filter's `from` takes the start, `to` takes the end (GTE/LT,
  * time_filter.go:370-397). Weeks are Monday-based. DST gap times resolve
  * forward (java.time's ZonedDateTime gap rule), which reproduces the
  * reference's adjustMidnight behavior for the documented Sao Paulo /
  * Beirut anomalies (time_filter.go:44-67).
  */
object TimeExpr {

  /** A calendar-aligned instant: the bucket [start, end) and its unit. */
  final case class Aligned(start: ZonedDateTime, end: ZonedDateTime, unit: String) {
    def startEpoch: Long = start.toEpochSecond
    def endEpoch: Long = end.toEpochSecond
  }

  private val unitMap = Map(
    "year" -> "y", "quarter" -> "q", "month" -> "M", "week" -> "w",
    "day" -> "d", "hour" -> "h", "quarter-hour" -> "15m",
    "minute" -> "m", "second" -> "s")

  /** Parse a fixed timezone: "-8:00", "GMT", "America/Los_Angeles"
    * (ref ParseTimezone time_filter.go:69-86).
    */
  def parseTimezone(tz: String): ZoneId = {
    val segments = tz.split(":")
    segments(0).toIntOption match {
      case Some(hours) =>
        val minutes = if (segments.length > 1) segments(1).toInt else 0
        val signedMin = if (hours < 0) -minutes else minutes
        ZoneOffset.ofTotalSeconds(hours * 3600 + signedMin * 60)
      case None => ZoneId.of(tz)
    }
  }

  private def startOfDay(base: ZonedDateTime): ZonedDateTime =
    base.toLocalDate.atStartOfDay(base.getZone)

  /** [start, end) of the unit `amount` units away from base. */
  def applyOffset(base: ZonedDateTime, amount: Int, unit: String): Aligned = {
    val zone = base.getZone
    def atDate(d: LocalDate): ZonedDateTime = d.atStartOfDay(zone)
    unit match {
      case "y" =>
        val s = atDate(LocalDate.of(base.getYear + amount, 1, 1))
        Aligned(s, atDate(LocalDate.of(base.getYear + amount + 1, 1, 1)), unit)
      case "q" =>
        val monthStart = LocalDate.of(base.getYear, base.getMonthValue, 1)
        val qStart = monthStart.plusMonths(-((base.getMonthValue - 1) % 3) + 3L * amount)
        Aligned(atDate(qStart), atDate(qStart.plusMonths(3)), unit)
      case "M" =>
        val s = LocalDate.of(base.getYear, base.getMonthValue, 1).plusMonths(amount)
        Aligned(atDate(s), atDate(s.plusMonths(1)), unit)
      case "w" => // Monday-based
        val back = (base.getDayOfWeek.getValue - DayOfWeek.MONDAY.getValue).toLong
        val s = base.toLocalDate.minusDays(back).plusDays(7L * amount)
        Aligned(atDate(s), atDate(s.plusDays(7)), unit)
      case "d" =>
        val s = base.toLocalDate.plusDays(amount)
        Aligned(atDate(s), atDate(s.plusDays(1)), unit)
      case "h" =>
        val s = base.truncatedTo(ChronoUnit.HOURS).plusHours(amount)
        Aligned(s, s.plusHours(1), unit)
      case "15m" =>
        val t = base.truncatedTo(ChronoUnit.MINUTES)
        val s = t.minusMinutes(t.getMinute % 15).plusMinutes(15L * amount)
        Aligned(s, s.plusMinutes(15), unit)
      case "m" =>
        val s = base.truncatedTo(ChronoUnit.MINUTES).plusMinutes(amount)
        Aligned(s, s.plusMinutes(1), unit)
      case "s" =>
        val s = base.truncatedTo(ChronoUnit.SECONDS).plusSeconds(amount)
        Aligned(s, s.plusSeconds(1), unit)
      case _ => throw ParseException(s"Unknown time filter unit: $unit", 0)
    }
  }

  /** Absolute forms (ref parseAbsoluteTime time_filter.go:148-238). */
  private def parseAbsolute(dateExpr: String, timeExpr: String, zone: ZoneId): Aligned = {
    val seg = dateExpr.split("-")
    if (seg.length > 3) throw ParseException(s"Unknown time expression: $dateExpr $timeExpr", 0)
    val year = seg(0).toIntOption.getOrElse(
      throw ParseException(s"failed to parse ${seg(0)} as year", 0))
    var month = 1
    var day = 1
    var unit = "y"
    if (seg.length >= 2) {
      if (seg(1).nonEmpty && seg(1).charAt(0) == 'Q') {
        val quarter = seg(1).drop(1).toIntOption.getOrElse(
          throw ParseException(s"failed to parse ${seg(1)} as quarter", 0))
        if (seg.length == 3) throw ParseException(s"Unknown time expression: $dateExpr", 0)
        month = 1 + (quarter - 1) * 3
        unit = "q"
      } else {
        month = seg(1).toIntOption.getOrElse(
          throw ParseException(s"failed to parse ${seg(1)} as month", 0))
        unit = "M"
      }
    }
    if (seg.length == 3) {
      day = seg(2).toIntOption.getOrElse(
        throw ParseException(s"failed to parse ${seg(2)} as day", 0))
      unit = "d"
    } else if (timeExpr.nonEmpty) {
      throw ParseException(s"Unknown time expression: $dateExpr $timeExpr", 0)
    }
    var hour = 0
    var minute = 0
    if (timeExpr.nonEmpty) {
      val ts = timeExpr.split(":")
      if (ts.length > 2) throw ParseException(s"Unknown time expression: $timeExpr", 0)
      hour = ts(0).toIntOption.getOrElse(
        throw ParseException(s"failed to parse ${ts(0)} as hour", 0))
      unit = "h"
      if (ts.length == 2) {
        minute = ts(1).toIntOption.getOrElse(
          throw ParseException(s"failed to parse ${ts(1)} as minute", 0))
        unit = if (minute % 15 == 0) "15m" else "m"
      }
    }
    // gap-times resolve forward per java.time; see scaladoc
    val base = ZonedDateTime.of(LocalDateTime.of(year, month, day, hour, minute, 0), zone)
    applyOffset(base, 0, unit)
  }

  /** Parse one time filter expression against `now`
    * (ref parseTimeFilterExpression time_filter.go:241-366).
    */
  def parseExpression(expression0: String, now: ZonedDateTime): Aligned = {
    val expression = expression0 match {
      case "today" => "this day"
      case "yesterday" => "last day"
      case e => e
    }
    if (expression == "now")
      return Aligned(now, now, "s")

    val segments = expression.split(" ")
    segments(0) match {
      case "this" =>
        if (segments.length != 2)
          throw ParseException(s"Unknown time filter expression: $expression", 0)
        val unit = unitMap.getOrElse(segments(1),
          throw ParseException(s"Unknown time filter unit: ${segments(1)}", 0))
        return applyOffset(now, 0, unit)
      case "last" =>
        if (segments.length != 2)
          throw ParseException(s"Unknown time filter expression: $expression", 0)
        val unit = unitMap.getOrElse(segments(1),
          throw ParseException(s"Unknown time filter unit: ${segments(1)}", 0))
        return applyOffset(now, -1, unit)
      case _ =>
    }
    if (segments.last == "ago") {
      if (segments.length != 3)
        throw ParseException(s"Unknown time filter expression: $expression", 0)
      val amount = segments(0).toIntOption.getOrElse(
        throw ParseException(s"failed to parse ${segments(0)} as a number", 0))
      val unitWord = segments(1).dropRight(1) // strip plural 's'
      val unit = unitMap.getOrElse(unitWord,
        throw ParseException(s"Unknown time filter unit: ${segments(1)}", 0))
      return applyOffset(now, -amount, unit)
    }
    if (segments.length == 1) {
      // "{±N}{unit}" single-token offset, e.g. "-2d", "0h"
      val body = expression.dropRight(1)
      val unitCh = expression.takeRight(1)
      (body.toIntOption, unitCh) match {
        case (Some(amount), u) if Set("y", "q", "M", "w", "d", "h", "m", "s").contains(u) =>
          return applyOffset(now, amount, u)
        case _ =>
      }
      // raw epoch seconds / milliseconds
      expression.toLongOption match {
        case Some(raw0) if raw0 > 9999999L =>
          val secs = if (raw0 > 99999999999L) raw0 / 1000 else raw0
          val t = Instant.ofEpochSecond(secs).atZone(now.getZone)
          // minute-aligned epochs report unit "m", others "s" (ref :334-346)
          val unit = if (secs % 60 == 0) "m" else "s"
          return Aligned(t, t, unit)
        case _ =>
      }
    }
    val timeExpr = if (segments.length == 2) segments(1)
      else if (segments.length > 2)
        throw ParseException(s"Unknown time filter expression: $expression", 0)
      else ""
    parseAbsolute(segments(0), timeExpr, now.getZone)
  }

  /** Parsed [from, to) epoch-second bounds for a time filter
    * (ref ParseTimeFilter time_filter.go:344-397): `from` uses the
    * expression's aligned start, `to` uses its aligned end; absent `to`
    * defaults to now; filter applies as `ts >= from AND ts < to`.
    */
  final case class Bounds(from: Option[Aligned], to: Option[Aligned]) {
    def fromEpoch: Option[Long] = from.map(_.startEpoch)
    def toEpoch: Option[Long] = to.map(_.endEpoch)
  }

  def parseFilter(from: String, to: String, zone: ZoneId, nowEpoch: Long): Bounds = {
    val now = Instant.ofEpochSecond(nowEpoch).atZone(zone)
    val f = if (from.nonEmpty) Some(parseExpression(from, now)) else None
    val t =
      if (to.nonEmpty) {
        val a = parseExpression(to, now)
        // `to` keeps the END of its unit; "now"/raw-epoch keep the instant
        Some(Aligned(a.end, a.end, a.unit))
      } else if (f.isDefined) Some(Aligned(now, now, "s"))
      else None
    Bounds(f, t)
  }
}
