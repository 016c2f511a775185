package graft.aql

import java.time.ZoneId

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.functions.Hll

/** Compiles an [[AqlQuery]] into a Spark `DataFrame`.
  *
  * Pipeline shape follows the reference compiler
  * (/root/reference/query/aql_compiler.go:43-102): timezone processing →
  * expression parsing (with row-filter→time-filter promotion, :104-166) →
  * join building (:168-197) → filter classification (:797-892) → measure
  * (:1139-1333) → dimensions (:1267-1333). Everything the reference
  * hand-schedules after that (batch scans, kernel fusion, partial
  * aggregation, broker merges) is delegated to Catalyst: the compiler's
  * only job is to emit the right declarative plan —
  * `fact.where(time && filters).join(broadcast(dim)…).groupBy(dims)
  * .agg(measure)` — and let predicate pushdown, column pruning and
  * partial/final aggregation do the physical work.
  *
  * Semantics preserved from the reference:
  *  - a query has exactly one measure (aql_compiler.go:800-805)
  *  - non-aggregate queries are measure `1` with a row limit, default 1000
  *    (:38, 1147-1154)
  *  - joins are LEFT OUTER many-to-one lookups against dimension tables
  *    with a single-column PK, at most 8 (:168-197, 268-342)
  *  - time filters parse the natural-language time expressions and apply
  *    as `ts >= from AND ts < to` (time_filter.go:241-397)
  *  - fact-table queries require a time filter `from`; when the timeFilter
  *    block is absent, leading `time >=` / `time <` row filters are
  *    promoted (aql_compiler.go:104-166, 987-1065)
  *  - the wildcard dimension expands to all main-table columns minus
  *    array/struct-typed ones (:1252-1265, 412-413)
  */
/** @param strictCompat opt-in reference-exact compatibility mode (SURVEY
  *   §7.4.3): time bucketizers use the reference's piecewise query-window
  *   timezone offset (time_bucketizer.go:93-146) instead of Spark's
  *   per-row DST-correct offsets, and expressions the reference rejects
  *   (numeric ops on >4-byte columns, query_context_helper.go:72-91) are
  *   rejected. Off by default — the engine's defaults are the *correct*
  *   semantics; strictCompat reproduces the reference's results
  *   bit-for-bit for deployments that diff against it.
  */
final class AqlCompiler(catalog: Catalog, spark: SparkSession,
    strictCompat: Boolean = false) {

  import AqlCompiler._

  def compile(q: AqlQuery): Compiled = {
    val main = catalog(q.table)
    if (q.measures.length != 1)
      throw ParseException(s"exactly one measure required, got ${q.measures.length}", 0)
    if (q.joinList.length > MaxForeignTables)
      throw ParseException(s"at most $MaxForeignTables joins supported", 0)

    val nowEpoch = q.now.getOrElse(System.currentTimeMillis() / 1000)

    // -- timezone processing (aql_compiler.go:439-465) ----------------------
    val tzSpec = q.timezone.getOrElse("")
    val TimezoneJoinPattern = """^[a-z_]*timezone\((.+)\)$""".r
    val (fixedZone, tzJoinKey): (ZoneId, Option[String]) = tzSpec match {
      case "" => (ZoneId.of("UTC"), None)
      case TimezoneJoinPattern(key) => (ZoneId.of("UTC"), Some(key))
      case fixed => (TimeExpr.parseTimezone(fixed), None)
    }

    // -- join building ------------------------------------------------------
    var df = main.load(spark).as(q.table)
    // captured BEFORE joins: the wildcard dimension expands main-table
    // columns only (ref aql_compiler.go:1252-1265), never joined dims, and
    // never the synthetic archive partition day column
    val mainSchema = df.schema
    val joined = q.joinList.map { j =>
      val dimDef = catalog(j.table)
      if (dimDef.isFact)
        throw ParseException(s"join table ${j.table} must be a dimension table", 0)
      j
    }
    val tsCols = collectTimestampColumns(q, main)
    // declared AQL types by plain and qualified name (main + joined dims),
    // for GeoPoint/UUID literal coercion and strictCompat restrictions
    val colTypes: Map[String, String] = {
      val perTable = (main +: q.joinList.map(j => catalog(j.table))).flatMap { td =>
        td.columnTypes.flatMap { case (c, t) =>
          Seq(c -> t, s"${td.name}.$c" -> t)
        }
      }
      val aliased = q.joinList.flatMap { j =>
        catalog(j.table).columnTypes.map { case (c, t) => s"${j.aliasOrTable}.$c" -> t }
      }
      (perTable ++ aliased).toMap
    }
    val resolveCtx = ExprCompiler.Ctx(resolveWith(tsCols), fixedZone, nowEpoch,
      colType = colTypes.get, strictCompat = strictCompat)

    // supporting dimensions/measures: referenced by alias from other
    // expressions, never grouped/reported themselves (ref aql.go:120-126)
    val supporting: Map[String, Expr] =
      q.supportingDefs.map { case (alias, text) => alias -> ExprParser.parse(text) }.toMap
    def parseE(text: String): Expr =
      AqlCompiler.substitute(ExprParser.parse(text), supporting)

    // geo joins are detected by their geography_intersects condition and
    // handled after filter parsing (they consume the geo filter)
    def isGeoJoin(j: AqlJoin): Boolean =
      j.conditions.headOption.exists { c =>
        ExprParser.parse(c) match {
          case Expr.Call("geography_intersects", _) => true
          case _ => false
        }
      }
    val (geoJoins, plainJoins) = joined.partition(isGeoJoin)
    if (geoJoins.length > 1)
      throw ParseException("at most one geo join condition allowed", 0)

    plainJoins.foreach { j =>
      val dimDef = catalog(j.table)
      val dimDf = dimDef.load(spark).as(j.aliasOrTable)
      val cond = j.conditions.map(c => ExprCompiler.compile(ExprParser.parse(c), resolveCtx))
        .reduceOption(_ && _)
        .getOrElse(throw ParseException(s"join to ${j.table} needs conditions", 0))
      df = df.join(broadcast(dimDf), cond, "left_outer")
    }

    // timezone-table auto-join (per-row timezone strings)
    val perRowTz: Option[Column] = tzJoinKey.map { key =>
      val tzDef = catalog.timezoneTable.getOrElse(
        throw ParseException("query uses timezone(column) but no timezone table is configured", 0))
      val tzTable = catalog(tzDef.table)
      val pk = tzTable.primaryKey.headOption.getOrElse(
        throw ParseException(s"timezone table ${tzDef.table} needs a primary key", 0))
      val alias = "__tz"
      val dimDf = tzTable.load(spark).as(alias)
      // qualify unqualified names against the main table: the timezone
      // table may share the key column's name (e.g. city_id)
      val qualified = resolveCtx.copy(resolve = name =>
        resolveWith(tsCols)(if (name.contains(".")) name else s"${q.table}.$name"))
      val keyCol = ExprCompiler.compile(ExprParser.parse(key), qualified)
      df = df.join(broadcast(dimDf), keyCol === col(s"$alias.$pk"), "left_outer")
      col(s"$alias.${tzDef.tzColumn}")
    }

    // -- filters + time filter (classification & promotion) -----------------
    var rowFilterExprs = q.filters.map(parseE) ++
      q.measures.head.filters.map(parseE)

    // -- geo join: join→filter conversion (aql_compiler.go:199-266) ---------
    // The geo filter (EQ/IN on the shape table's PK, string UUIDs, at most
    // GeoShapeLimit shapes) selects the broadcast shape set; the join
    // becomes an inner point-in-polygon filter and the shape PK remains
    // available as a dimension (optionally hex(uuid)).
    geoJoins.foreach { j =>
      val dimDef = catalog(j.table)
      if (dimDef.primaryKey.length != 1)
        throw ParseException("composite primary key for geo table is not allowed", 0)
      if (j.conditions.length != 1)
        throw ParseException("at most one join condition allowed per geo join", 0)
      val pk = dimDef.primaryKey.head
      val alias = j.aliasOrTable
      val pkNames = Set(pk, s"$alias.$pk")

      def strLits(es: Seq[Expr]): Seq[String] = es.map {
        case Expr.Str(s) => s
        case _ => throw ParseException("geo UUIDs must be strings in query", 0)
      }
      // exactly one geo filter: EQ or IN on the shape PK
      val (geoFilters, rest) = rowFilterExprs.partition {
        case Expr.Binary(BinOp.Eq, Expr.VarRef(c), _) => pkNames.contains(c)
        case Expr.In(Expr.VarRef(c), _, false) => pkNames.contains(c)
        case _ => false
      }
      if (geoFilters.length != 1)
        throw ParseException("exactly one geo filter required (EQ or IN on the shape table primary key)", 0)
      val shapeIds = geoFilters.head match {
        case Expr.Binary(BinOp.Eq, _, v) => strLits(Seq(v))
        case Expr.In(_, vs, _) => strLits(vs)
        case _ => Nil
      }
      if (shapeIds.length > GeoShapeLimit)
        throw ParseException(s"geo filter supports at most $GeoShapeLimit shapes", 0)
      if (q.measures.head.sqlExpression.contains(s"$alias."))
        throw ParseException("geo table fields are not allowed in measures", 0)
      rowFilterExprs = rest

      val shapes = dimDef.load(spark).where(col(pk).isin(shapeIds: _*)).as(alias)
      val cond = ExprCompiler.compile(ExprParser.parse(j.conditions.head), resolveCtx)
      df = df.join(broadcast(shapes), cond, "inner")
    }

    val timeColName = q.timeFilter.flatMap(_.column).filter(_.nonEmpty)
      .orElse(main.timeColumn)
    var fromStr = q.timeFilter.flatMap(_.from).getOrElse("")
    var toStr = q.timeFilter.flatMap(_.to).getOrElse("")

    // row-filter → time-filter promotion (aql_compiler.go:104-166): with no
    // explicit timeFilter on a fact table, leading epoch comparisons against
    // the designated time column become the time filter (driving partition
    // pruning in a day-partitioned layout).
    var promoted: List[Expr] = Nil
    if (fromStr.isEmpty && toStr.isEmpty && main.isFact && timeColName.isDefined) {
      val tc = timeColName.get
      rowFilterExprs = rowFilterExprs.filter {
        case e @ Expr.Binary(BinOp.Gte, Expr.VarRef(c), Expr.Num(v, _, true))
            if c == tc || c == s"${q.table}.$tc" =>
          if (fromStr.isEmpty) { fromStr = v.toLong.toString; promoted ::= e; false } else true
        case e @ Expr.Binary(BinOp.Lt, Expr.VarRef(c), Expr.Num(v, _, true))
            if c == tc || c == s"${q.table}.$tc" =>
          if (toStr.isEmpty) { toStr = v.toLong.toString; promoted ::= e; false } else true
        case _ => true
      }
    }

    val bounds: Option[TimeExpr.Bounds] =
      if (fromStr.nonEmpty || toStr.nonEmpty) {
        if (fromStr.isEmpty)
          throw ParseException("time filter requires `from`", 0)
        Some(TimeExpr.parseFilter(fromStr, toStr, fixedZone, nowEpoch))
      } else if (main.isFact && main.timeColumn.isDefined) {
        throw ParseException(s"query on fact table ${q.table} requires a time filter", 0)
      } else None

    bounds.foreach { b =>
      val tc = timeColName.getOrElse(
        throw ParseException("time filter needs a column (no designated time column)", 0))
      // apply on the RAW column so the comparison pushes down to the scan
      val raw = col(if (tc.contains(".")) tc else s"${q.table}.$tc")
      val isTs = tsCols.contains(stripQualifier(tc))
      b.fromEpoch.foreach { f =>
        df = df.where(if (isTs) raw >= timestamp_seconds(lit(f)) else raw >= lit(f))
      }
      b.toEpoch.foreach { t =>
        df = df.where(if (isTs) raw < timestamp_seconds(lit(t)) else raw < lit(t))
      }
      // day-partitioned archive: widen the time filter with day-range
      // predicates on the partition column for static partition pruning —
      // the archive day-range scan (aql_compiler.go:1047-1056)
      if (main.dayPartitioned) {
        val dayOf = (e: Long) => date_format(timestamp_seconds(lit(e)), "yyyy-MM-dd")
        b.fromEpoch.foreach(f => df = df.where(col(graft.ingest.Archiver.DayCol) >= dayOf(f)))
        b.toEpoch.foreach(t => df = df.where(col(graft.ingest.Archiver.DayCol) <= dayOf(t - 1)))
      }
    }

    rowFilterExprs.foreach { e =>
      df = df.where(ExprCompiler.compile(e, resolveCtx))
    }

    // -- dimensions ---------------------------------------------------------
    val measureExpr = parseE(q.measures.head.sqlExpression)
    val isNonAgg = measureExpr match {
      case Expr.Num(1.0, _, true) => true
      case _ => false
    }

    val dimCols: Seq[(String, Column)] = q.dimensionList.zipWithIndex.flatMap {
      case (d, i) if d.expr == "*" =>
        mainSchema.fields.toSeq.collect {
          case f if !f.dataType.isInstanceOf[ArrayType] &&
              !f.dataType.isInstanceOf[StructType] &&
              !(main.dayPartitioned && f.name == graft.ingest.Archiver.DayCol) =>
            // qualified: a joined dim sharing the column name must not make
            // the wildcard ambiguous
            f.name -> col(s"${q.table}.${f.name}")
        }
      case (d, i) =>
        val name = d.alias.filter(_.nonEmpty).getOrElse(if (d.expr.nonEmpty) d.expr else s"d$i")
        Seq(name -> dimensionColumn(d, q, main, parseE, resolveCtx, perRowTz, fixedZone,
          bounds, nowEpoch))
    }

    // -- measure ------------------------------------------------------------
    val measureName = q.measures.head.alias.filter(_.nonEmpty).getOrElse("value")

    val out: DataFrame =
      if (isNonAgg) {
        val limit = q.limit.getOrElse(NonAggregationQueryLimit)
        val selected = df.select(dimCols.map { case (n, c) => c.as(n) }: _*)
        // BEHAVIOR DIFFERENCE, deliberate: the reference parses `sorts` but
        // never executes them (no consumer of AQLQuery.Sorts in query/*.go);
        // honoring them turns ORDER BY + LIMIT into proper top-k via
        // Spark's TakeOrderedAndProject
        val sorted = q.sorts.filter(_.nonEmpty) match {
          case Some(fields) =>
            selected.orderBy(fields.map { f =>
              val c = col(f.name)
              if (f.order.exists(_.equalsIgnoreCase("desc"))) c.desc else c.asc
            }: _*)
          case None => selected
        }
        if (limit >= 0) sorted.limit(limit) else sorted
      } else {
        val agg = measureColumn(measureExpr, resolveCtx).as(measureName)
        if (dimCols.isEmpty) df.agg(agg)
        else df.groupBy(dimCols.map { case (n, c) => c.as(n) }: _*).agg(agg)
      }

    Compiled(out, dimCols.map(_._1), measureName, isNonAgg, q, fixedZone, bounds)
  }

  /** All TimestampType column names reachable by this query (main table +
    * joined dims), unqualified.
    */
  private def collectTimestampColumns(q: AqlQuery, main: TableDef): Set[String] =
    q.joinList.foldLeft(main.timestampColumns) { (acc, j) =>
      acc ++ catalog(j.table).timestampColumns
    }

  /** VarRef resolution: timestamp-typed columns surface as epoch seconds in
    * the expression language (AQL time columns are Uint32 epoch seconds).
    */
  private def resolveWith(tsCols: Set[String])(name: String): Column = {
    val c = col(name)
    if (tsCols.contains(stripQualifier(name))) unix_timestamp(c) else c
  }

  private def stripQualifier(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i >= 0) name.substring(i + 1) else name
  }

  private def dimensionColumn(d: AqlDimension, q: AqlQuery, main: TableDef,
      parseE: String => Expr, ctx: ExprCompiler.Ctx, perRowTz: Option[Column],
      zone: ZoneId, bounds: Option[TimeExpr.Bounds], nowEpoch: Long): Column = {
    val baseExprStr =
      if (d.expr.nonEmpty) d.expr
      else if (d.isTimeDimension)
        main.timeColumn.getOrElse(
          throw ParseException("time dimension needs a time column", 0))
      else throw ParseException("dimension needs sqlExpression", 0)
    val base = ExprCompiler.compile(parseE(baseExprStr), ctx)

    d.numericBucketizer match {
      case Some(nb) => return Bucketizers.numeric(base, nb)
      case None =>
    }

    if (!d.isTimeDimension) return base

    // timezone shift-then-floor (ref query/time_bucketizer.go:72-146):
    // per-row tz from the timezone join, else the query's fixed timezone.
    // DEFAULT: Spark's from_utc_timestamp is DST-correct per row.
    // strictCompat: the reference's piecewise query-window offset
    // (time_bucketizer.go:93-146) — the offset at the window start, plus a
    // single offsetDiff step term when the window crosses a DST switch —
    // reproduced bit-for-bit, including its post-switch offset arithmetic,
    // for result parity with reference deployments.
    val shifted = perRowTz match {
      case Some(tzCol) => unix_timestamp(from_utc_timestamp(timestamp_seconds(base), tzCol))
      case None =>
        if (zone.getId == "UTC" || zone.getId == "Z") base
        else if (strictCompat) strictShift(base, zone, bounds, nowEpoch)
        else unix_timestamp(from_utc_timestamp(timestamp_seconds(base), zone.getId))
    }
    Bucketizers.time(shifted, d.timeBucketizer.getOrElse(""))
  }

  /** The reference's fixed-timezone shift (time_bucketizer.go:93-146):
    * `ts + fromOffset + offsetDiff * (ts >= switchTs)` where fromOffset is
    * the zone offset at the window start, offsetDiff = fromOffset -
    * toOffset, and switchTs is the single DST switch inside the window
    * (utils.CalculateDSTSwitchTs binary search, hour-aligned). This is
    * knowingly NOT per-row correct after the switch — it replicates the
    * reference exactly, which is the entire point of strictCompat.
    */
  private def strictShift(base: Column, zone: ZoneId,
      bounds: Option[TimeExpr.Bounds], nowEpoch: Long): Column = {
    val rules = zone.getRules
    def offAt(e: Long): Int =
      rules.getOffset(java.time.Instant.ofEpochSecond(e)).getTotalSeconds
    val fromE = bounds.flatMap(_.fromEpoch).getOrElse(nowEpoch)
    val toE = bounds.flatMap(_.toEpoch).getOrElse(nowEpoch)
    val fromOffset = offAt(fromE)
    val toOffset = offAt(toE)
    if (fromOffset == toOffset) base + lit(fromOffset.toLong)
    else {
      // CalculateDSTSwitchTs (ref utils/time.go:93-107): bisect to the
      // switch hour
      var lo = fromE
      var hi = toE
      while (hi - lo > 3600) {
        val mid = lo + (hi - lo) / 2
        if (offAt(lo) != offAt(mid)) hi = mid else lo = mid
      }
      val switchTs = hi - hi % 3600
      val offsetDiff = (fromOffset - toOffset).toLong
      base + lit(fromOffset.toLong) +
        lit(offsetDiff) * (base >= lit(switchTs)).cast("long")
    }
  }

  private def measureColumn(e: Expr, ctx: ExprCompiler.Ctx): Column = e match {
    // count(*) → sum(1) unsigned (aql_compiler.go:1191-1197)
    case Expr.Call("count", args) if args.isEmpty || args == Seq(Expr.Wildcard) =>
      count(lit(1))
    case Expr.Call("count", Seq(a)) => count(ExprCompiler.compile(a, ctx))
    // exact distinct count — single-instance only; the broker rejects it
    // (per-slice distinct counts double-count cross-slice values) and
    // points users at countdistincthll
    case Expr.Call("countdistinct", Seq(a)) =>
      count_distinct(ExprCompiler.compile(a, ctx))
    case Expr.Call("sum", Seq(a)) => sum(ExprCompiler.compile(a, ctx))
    case Expr.Call("avg", Seq(a)) => avg(ExprCompiler.compile(a, ctx))
    case Expr.Call("min", Seq(a)) => min(ExprCompiler.compile(a, ctx))
    case Expr.Call("max", Seq(a)) => max(ExprCompiler.compile(a, ctx))
    // countDistinctHLL computes registers on the fly (helper.go:540-577)
    case Expr.Call("countdistincthll", Seq(a)) =>
      Hll.hllEstimate(ExprCompiler.compile(a, ctx))
    // hll(col) consumes a precomputed register-value column (isHLLColumn)
    case Expr.Call("hll", Seq(a)) =>
      Hll.hllFromRegisters(ExprCompiler.compile(a, ctx))
    // derived measures: arithmetic over aggregates (the algebra the
    // reference broker performs post-merge, e.g. avg = sum / count,
    // broker/query_plan_agg.go:438-470, available here inline)
    case Expr.Binary(op, l, r) =>
      val lc = measureOperand(l, ctx)
      val rc = measureOperand(r, ctx)
      op match {
        case BinOp.Add => lc + rc
        case BinOp.Sub => lc - rc
        case BinOp.Mul => lc * rc
        case BinOp.Div => lc.cast("double") / rc.cast("double")
        case BinOp.Mod => pmod(lc, rc)
        case other => throw ParseException(s"unsupported measure operator ${other.sym}", 0)
      }
    case Expr.Paren(inner) => measureColumn(inner, ctx)
    case other =>
      throw ParseException(s"unsupported measure expression", 0)
  }

  /** An operand of a derived measure: an aggregate subtree or a literal. */
  private def measureOperand(e: Expr, ctx: ExprCompiler.Ctx): Column = e match {
    case n @ Expr.Num(_, _, _) => ExprCompiler.compile(n, ctx)
    case other => measureColumn(other, ctx)
  }
}

object AqlCompiler {
  /** Inline supporting-alias references: VarRefs matching a supporting
    * dimension/measure alias expand to that item's (substituted) expression;
    * the `seen` set rejects definition cycles.
    */
  def substitute(e: Expr, defs: Map[String, Expr], seen: Set[String] = Set.empty): Expr = {
    def go(x: Expr): Expr = x match {
      case Expr.VarRef(name) if defs.contains(name) =>
        if (seen.contains(name))
          throw ParseException(s"cyclic supporting definition: $name", 0)
        substitute(defs(name), defs, seen + name)
      case Expr.Binary(op, l, r) => Expr.Binary(op, go(l), go(r))
      case Expr.Unary(op, inner) => Expr.Unary(op, go(inner))
      case Expr.Paren(inner) => Expr.Paren(go(inner))
      case Expr.Call(n, args) => Expr.Call(n, args.map(go))
      case Expr.In(inner, list, neg) => Expr.In(go(inner), list.map(go), neg)
      case Expr.Case(whens, otherwise) =>
        Expr.Case(whens.map { case (c, v) => (go(c), go(v)) }, otherwise.map(go))
      case leaf => leaf
    }
    go(e)
  }

  /** ref query/aql_compiler.go:38 */
  val NonAggregationQueryLimit = 1000
  /** ref query/aql_compiler.go:169-171 */
  val MaxForeignTables = 8
  /** ref query/aql_compiler.go:37 (enforced at :927-929) */
  val GeoShapeLimit = 100

  final case class Compiled(
      df: DataFrame,
      dimNames: Seq[String],
      measureName: String,
      isNonAgg: Boolean,
      query: AqlQuery,
      zone: ZoneId,
      bounds: Option[TimeExpr.Bounds])
}
