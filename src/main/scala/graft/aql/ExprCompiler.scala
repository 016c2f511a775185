package graft.aql

import java.time.{Instant, ZoneId}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{Geo, Hll}

/** Translates a parsed AQL expression AST into a Catalyst `Column`.
  *
  * The mapping follows the reference's type-resolution/rewrite pass
  * (/root/reference/query/context/query_context_helper.go:132-742) at the
  * SEMANTIC level — each rewrite the reference performs on its AST before
  * GPU codegen is expressed here directly as the equivalent Catalyst
  * expression, so Catalyst's own constant folding / codegen replace the
  * reference's hand-rolled functor dispatch:
  *
  *   - `/` always promotes to float (helper.go:257-261)
  *   - `floor(x, n)` is unsigned floor-to-multiple (token.go FLOOR)
  *   - `convert_tz(ts, from, to)` folds to `ts + offsetDelta` at compile
  *     time (helper.go:348-387)
  *   - `dayofweek`/`hour` lower to integer arithmetic on epoch seconds
  *     (helper.go:390-483): `(ts/86400+4)%7+1`, `(ts%86400)/3600`
  *   - `IN (…)` expands to equality membership (helper.go:93-129)
  *   - `IS TRUE` is identity, `IS FALSE` is NOT (helper.go:189-198)
  *   - array `element_at` is 0-based with negative-from-end and
  *     null-on-out-of-range (functor.hpp:519-573) — compiled to Spark's
  *     null-safe 0-based `get` / `try_element_at`
  *   - enum equality against an unknown case matches nothing, never errors
  *     (helper.go:301-310) — free with string equality semantics
  */
object ExprCompiler {

  /** Compilation context.
    *
    * @param resolve   column resolution for VarRefs; receives possibly
    *                  qualified names (`alias.column`)
    * @param zone      query timezone (calendar functors, convert_tz fold)
    * @param nowEpoch  reference instant for compile-time timezone folds
    * @param colType   declared AQL storage type of a (possibly qualified)
    *                  column name, when the catalog knows it — drives
    *                  GeoPoint/UUID literal coercion and the strictCompat
    *                  width checks
    * @param strictCompat reject expressions the reference rejects
    *                  (numeric ops on >4-byte columns, Int64 binary
    *                  transformations, query_context_helper.go:72-91)
    */
  final case class Ctx(
      resolve: String => Column,
      zone: ZoneId = ZoneId.of("UTC"),
      nowEpoch: Long = 0L,
      colType: String => Option[String] = _ => None,
      strictCompat: Boolean = false)

  /** AQL storage width in bytes (ref memstore/common/data_type.go
    * DataTypeBytes) for the strictCompat >4-byte numeric-op rejection.
    */
  private def typeBytes(t: String): Int = t match {
    case "Bool" | "Int8" | "Uint8" => 1
    case "Int16" | "Uint16" => 2
    case "Int32" | "Uint32" | "Float32" | "SmallEnum" | "BigEnum" => 4
    case "Int64" | "GeoPoint" => 8
    case "UUID" => 16
    case _ => 4
  }

  /** Parse the reference's WKT-ish point form 'Point(lng,lat)'
    * (memstore/common/data_type.go GeoPointFromString: case-insensitive,
    * the characters p/o/i/n/t/parens/commas are separators) into
    * (lat, lng) — the reference's internal storage order.
    */
  def parseGeoPoint(s: String): (Double, Double) = {
    val parts = s.toLowerCase(java.util.Locale.ROOT)
      .map(ch => if ("point(),".indexOf(ch) >= 0) ' ' else ch)
      .split("\\s+").filter(_.nonEmpty)
    if (parts.length != 2)
      throw ParseException(s"invalid point, requires format: Point(lng,lat), got $s", 0)
    val (lng, lat) =
      try (parts(0).toDouble, parts(1).toDouble)
      catch { case _: NumberFormatException =>
        throw ParseException(s"invalid point, requires format: Point(lng,lat), got $s", 0)
      }
    if (lng < -180 || lng > 180)
      throw ParseException(s"invalid point, longitude should be in [-180, 180], got ${parts(0)}", 0)
    if (lat < -90 || lat > 90)
      throw ParseException(s"invalid point, latitude should be in [-90, 90], got ${parts(1)}", 0)
    (lat, lng)
  }

  /** Normalize a UUID literal to its 32 lowercase hex digits — the
    * reference parses UUID strings into raw bytes so equality ignores
    * case and dashes (data_type.go UUIDFromString); malformed UUIDs error.
    */
  def normalizeUuid(s: String): String = {
    val hex = s.toLowerCase(java.util.Locale.ROOT).replace("-", "")
      .stripPrefix("urn:uuid:").stripPrefix("{").stripSuffix("}")
    if (hex.length != 32 || !hex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
      throw ParseException(s"invalid UUID literal: $s", 0)
    hex
  }

  private val SecondsPerDay = 86400L
  private val SecondsPerHour = 3600L

  def compile(e: Expr, ctx: Ctx): Column = e match {
    case Expr.Num(v, text, isInt) => if (isInt) lit(text.toLong) else lit(v)
    case Expr.Str(s) => lit(s)
    case Expr.Bool(b) => lit(b)
    case Expr.Null => lit(null)
    case Expr.Wildcard =>
      throw ParseException("wildcard is only valid as a whole dimension", 0)
    case Expr.VarRef(name) => ctx.resolve(name)
    case Expr.Paren(inner) => compile(inner, ctx)

    case Expr.Unary(op, inner) =>
      if (op == UnaryOp.Neg || op == UnaryOp.BitwiseNot) strictBlock(ctx, inner)
      val c = compile(inner, ctx)
      op match {
        case UnaryOp.Neg => negate(c)
        case UnaryOp.Not | UnaryOp.Exclamation => !c
        case UnaryOp.BitwiseNot => bitwise_not(c)
        case UnaryOp.IsNull => c.isNull
        case UnaryOp.IsNotNull => c.isNotNull
        case UnaryOp.IsTrue => c // NOT NOT x (helper.go:189-198)
        case UnaryOp.IsFalse => !c
      }

    // GeoPoint/UUID literal coercion (query_context_helper.go:317-334):
    // `geo_col = 'Point(lng,lat)'` compares against a parsed point value,
    // `uuid_col = '...'` compares bytes (case/dash insensitive)
    case Expr.Binary(op @ (BinOp.Eq | BinOp.Neq), Expr.VarRef(name), Expr.Str(s))
        if ctx.colType(name).exists(t => t == "GeoPoint" || t == "UUID") =>
      val eq = typedEquality(name, s, ctx)
      if (op == BinOp.Eq) eq else !eq

    case Expr.Binary(op, l, r) =>
      if (NumericOps.contains(op)) strictBlock(ctx, l, r)
      val lc = compile(l, ctx)
      val rc = compile(r, ctx)
      op match {
        case BinOp.Or => lc || rc
        case BinOp.And => lc && rc
        case BinOp.Eq => lc === rc
        case BinOp.Neq => lc =!= rc
        case BinOp.Lt => lc < rc
        case BinOp.Lte => lc <= rc
        case BinOp.Gt => lc > rc
        case BinOp.Gte => lc >= rc
        case BinOp.BitOr => lc.bitwiseOR(rc)
        case BinOp.BitAnd => lc.bitwiseAND(rc)
        case BinOp.BitXor => lc.bitwiseXOR(rc)
        case BinOp.Shl => shiftleft(lc, intLiteral(r, "<<"))
        case BinOp.Shr => shiftright(lc, intLiteral(r, ">>"))
        case BinOp.Add => lc + rc
        case BinOp.Sub => lc - rc
        case BinOp.Mul => lc * rc
        // `/` always promotes to float (helper.go:257-261)
        case BinOp.Div => lc.cast("double") / rc.cast("double")
        case BinOp.Mod => pmod(lc, rc)
      }

    case Expr.In(Expr.VarRef(name), list, negated)
        if ctx.colType(name).exists(t => t == "GeoPoint" || t == "UUID") =>
      val eqs = list.map {
        case Expr.Str(s) => typedEquality(name, s, ctx)
        case _ => throw ParseException(
          s"IN on a ${ctx.colType(name).get} column requires string literals", 0)
      }
      val in = eqs.reduceOption(_ || _).getOrElse(lit(false))
      if (negated) !in else in

    case Expr.In(inner, list, negated) =>
      val c = compile(inner, ctx)
      val vals = list.map(compile(_, ctx))
      val in = c.isin(vals: _*)
      if (negated) !in else in

    case Expr.Case(whens, otherwise) =>
      val first = when(compile(whens.head._1, ctx), compile(whens.head._2, ctx))
      val chained = whens.tail.foldLeft(first) { case (acc, (cond, value)) =>
        acc.when(compile(cond, ctx), compile(value, ctx))
      }
      otherwise.fold(chained)(o => chained.otherwise(compile(o, ctx)))

    case Expr.Call(name, args) => compileCall(name, args, ctx)
  }

  private def negate(c: Column): Column = lit(0) - c

  private val NumericOps: Set[BinOp] = Set(
    BinOp.Add, BinOp.Sub, BinOp.Mul, BinOp.Div, BinOp.Mod,
    BinOp.BitOr, BinOp.BitAnd, BinOp.BitXor, BinOp.Shl, BinOp.Shr)

  /** strictCompat operand rejection (query_context_helper.go:72-91): the
    * reference cannot run numeric transformations on >4-byte columns
    * (Int64/UUID/GeoPoint). Off by default — the engine is a deliberate
    * superset — but a compat deployment can reject what the reference
    * rejects.
    */
  private def strictBlock(ctx: Ctx, es: Expr*): Unit = if (ctx.strictCompat) {
    es.foreach {
      case Expr.VarRef(n) => ctx.colType(n).foreach { t =>
        if (typeBytes(t) > 4)
          throw ParseException(
            s"numeric operations not supported for column over 4 bytes length, got $n", 0)
      }
      case _ =>
    }
  }

  /** Type-coerced equality for GeoPoint/UUID columns vs a string literal. */
  private def typedEquality(name: String, s: String, ctx: Ctx): Column =
    ctx.colType(name).get match {
      case "GeoPoint" =>
        // equality lives in FLOAT space on both sides: the reference
        // parses and stores points as [2]float32, and a double-typed
        // storage column compared against a float literal would promote
        // the literal back to a non-matching double
        val (lat, lng) = parseGeoPoint(s)
        val c = ctx.resolve(name)
        (c.getField("lat").cast("float") === lit(lat.toFloat)) &&
          (c.getField("lng").cast("float") === lit(lng.toFloat))
      case _ =>
        // translate (not regexp_replace): character removal needs no regex
        // engine in the per-row hot path
        lower(translate(ctx.resolve(name), "-", "")) === lit(normalizeUuid(s))
    }

  private def intLiteral(e: Expr, op: String): Int = e match {
    case Expr.Num(v, _, true) => v.toInt
    case _ => throw ParseException(s"'$op' requires an integer literal shift amount", 0)
  }

  private def epochTs(e: Column): Column = timestamp_seconds(e)

  private def compileCall(name: String, args: Seq[Expr], ctx: Ctx): Column = {
    def arg(i: Int): Column = compile(args(i), ctx)
    def requireArgs(n: Int): Unit =
      if (args.length != n)
        throw ParseException(s"$name expects $n argument(s), got ${args.length}", 0)

    name match {
      // floor(x, n): floor to multiple of n; pmod keeps floor semantics for
      // negative x (reference operands are unsigned, so this is a superset)
      case "floor" =>
        requireArgs(2)
        arg(0) - pmod(arg(0), arg(1))

      // convert_tz(ts, fromTz, toTz) -> ts + offsetDelta, folded at compile
      // time against `now` (helper.go:348-387)
      case "convert_tz" =>
        requireArgs(3)
        val fromZone = TimeExpr.parseTimezone(strLiteral(args(1), name))
        val toZone = TimeExpr.parseTimezone(strLiteral(args(2), name))
        val at = Instant.ofEpochSecond(ctx.nowEpoch)
        val delta = toZone.getRules.getOffset(at).getTotalSeconds -
          fromZone.getRules.getOffset(at).getTotalSeconds
        arg(0) + lit(delta.toLong)

      // epoch-second integer arithmetic rewrites (helper.go:390-483)
      case "dayofweek" =>
        requireArgs(1)
        val a = arg(0)
        pmod(((a - pmod(a, lit(SecondsPerDay))) / SecondsPerDay).cast("long") + 4, lit(7L)) + 1
      case "hour" =>
        requireArgs(1)
        val d = pmod(arg(0), lit(SecondsPerDay))
        ((d - pmod(d, lit(SecondsPerHour))) / SecondsPerHour).cast("long")

      // from_unixtime(col/1000) passes through to the column in seconds
      // (helper.go:203-210)
      case "from_unixtime" =>
        requireArgs(1)
        args.head match {
          case Expr.Binary(BinOp.Div, c, Expr.Num(1000.0, _, true)) =>
            (compile(c, ctx).cast("long") / 1000L).cast("long")
          case other => compile(other, ctx).cast("long")
        }

      // calendar bucket starts, computed on epoch seconds (functor.hpp:383-431)
      case "get_week_start" => requireArgs(1); truncEpoch(arg(0), "week")
      case "get_month_start" => requireArgs(1); truncEpoch(arg(0), "month")
      case "get_quarter_start" => requireArgs(1); truncEpoch(arg(0), "quarter")
      case "get_year_start" => requireArgs(1); truncEpoch(arg(0), "year")
      case "get_day_of_month" => requireArgs(1); dayofmonth(epochTs(arg(0))).cast("long")
      case "get_day_of_year" => requireArgs(1); dayofyear(epochTs(arg(0))).cast("long")
      case "get_month_of_year" => requireArgs(1); month(epochTs(arg(0))).cast("long")
      case "get_quarter_of_year" => requireArgs(1); quarter(epochTs(arg(0))).cast("long")

      // geo: geography_intersects(shape, point) (helper.go:486-525).
      // The point argument is a struct(lat, lng) column; the shape argument
      // is an array-of-rings column from a joined geo dimension table.
      case "geography_intersects" =>
        requireArgs(2)
        val shape = arg(0)
        val point = arg(1)
        Geo.geographyIntersects(point.getField("lat"), point.getField("lng"), shape)

      // hex(uuid): UUID rendered as its plain hex string — lowercase, no
      // dashes, Go hex.EncodeToString semantics (helper.go:526-539;
      // memstore/common/data_value.go:284-286)
      case "hex" =>
        requireArgs(1)
        // translate (not regexp_replace): character removal needs no regex
        // engine in the per-row hot path — same choice as UUID equality
        lower(translate(arg(0).cast("string"), "-", ""))

      case "get_hll_value" =>
        requireArgs(1)
        Hll.getHllValue(arg(0))

      // array functions (helper.go:589-721; functor.hpp:470-661)
      case "length" =>
        requireArgs(1)
        size(arg(0))
      case "contains" =>
        requireArgs(2)
        array_contains(arg(0), arg(1))
      // element_at: reference is 0-based; negative counts from the end;
      // out-of-range or null item -> null (functor.hpp:519-573). Spark's
      // `get` is 0-based and null-safe, covering both directions.
      case "element_at" =>
        requireArgs(2)
        val a = arg(0)
        val i = arg(1)
        when(i >= 0, get(a, i)).otherwise(get(a, size(a) + i))

      case "countdistincthll" | "hll" | "count" | "countdistinct" | "sum" | "avg" | "min" | "max" =>
        throw ParseException(s"aggregate function $name is only valid as a measure", 0)

      case other =>
        throw ParseException(s"unknown function: $other", 0)
    }
  }

  private def strLiteral(e: Expr, fn: String): String = e match {
    case Expr.Str(s) => s
    case _ => throw ParseException(s"$fn expects a string literal argument", 0)
  }

  /** Epoch seconds of the calendar-unit start containing the given epoch.
    * Requires session timezone UTC (every graft entry point pins it): the
    * input epoch is already timezone-shifted by the compiler when a query
    * timezone applies, mirroring the reference's shift-then-floor
    * (time_bucketizer.go:72-146), so the calendar math itself runs on UTC
    * wall time. Spark's date_trunc('week') is Monday-based, matching
    * GET_WEEK_START.
    */
  private[aql] def truncEpoch(e: Column, unit: String): Column =
    unix_timestamp(date_trunc(unit, epochTs(e)))
}
