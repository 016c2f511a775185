package graft.aql

import scala.collection.mutable.ArrayBuffer

/** SQL front end: translates the reference's SQL subset into an
  * [[AqlQuery]] (NOT a general query plan), mirroring
  * /root/reference/query/sql/sql_parser.go:108-121, 210+:
  *
  *   - SELECT list → measures (items containing an aggregate call) and
  *     dimensions (everything else); `count(*) AS value` keeps its alias
  *   - FROM t / JOIN dim ON conds → main table + AQL joins
  *   - WHERE → rowFilters, except the pseudo-functions
  *     `aql_time_filter(col, "from", "to", timezone)` → TimeFilter +
  *     query timezone and `aql_now(col, epoch)` → Now override
  *     (udf table: query/sql/util/udfRegister.go:50-85)
  *   - GROUP BY → dimensions; `aql_time_bucket_<name>(col, "unit", tz)`
  *     → time-bucketizer dimension (bucketizer = <name> with underscores
  *     as spaces); `aql_numeric_bucket_*` → numeric bucketizer
  *   - ORDER BY / LIMIT → Sorts / Limit
  *
  * Timezones appear as bare identifier paths (`America/New_York`) per the
  * reference grammar, recovered via [[Render.timezone]].
  */
object SqlFront {

  private val AggregateFunctions =
    Set("count", "countdistinct", "sum", "avg", "min", "max", "countdistincthll", "hll")

  private val TimeBucketPrefix = "aql_time_bucket_"
  private val NumericBucketPrefix = "aql_numeric_bucket_"

  def translate(sql: String): AqlQuery = new SqlParser(sql).parse()

  /** Translate and compile in one step. */
  def compile(sql: String, catalog: Catalog, spark: org.apache.spark.sql.SparkSession,
      now: Option[Long] = None): AqlCompiler.Compiled = {
    val q0 = translate(sql)
    val q = now.fold(q0)(n => q0.copy(now = Some(n)))
    new AqlCompiler(catalog, spark).compile(q)
  }

  private final class SqlParser(input: String) {
    import ExprParser._

    private val p = new P(ExprParser.lex(input))

    private def isOp(s: String): Boolean = p.cur match {
      case TOp(o, _) => o == s
      case _ => false
    }

    private def ident(): String = p.advance() match {
      case TIdent(s, _) => s
      case t => throw ParseException("expected identifier", t.pos)
    }

    /** Entry: optional 1-level WITH prefix (ref sql_parser.go:37-39,
      * maxlevelWith = 1), then the statement. A WITH subquery exists only
      * to assemble the single AQL query: its table/joins/filters/time
      * filter merge into the outer statement, and its aliased select items
      * become supporting dimensions the compiler inlines by alias.
      */
    def parse(): AqlQuery = {
      val ctes = scala.collection.mutable.Map.empty[String, AqlQuery]
      if (p.isKw(p.cur, "with")) {
        p.advance()
        var more = true
        while (more) {
          val name = ident()
          p.expectKw("as")
          p.expectOp("(")
          if (p.isKw(p.cur, "with"))
            throw ParseException("at most one WITH level supported", 0)
          // a CTE body is already the second query level (sql_parser.go:34-47)
          ctes(name) = parseStatement(allowSubquery = false)
          p.expectOp(")")
          if (isOp(",")) p.advance() else more = false
        }
      }
      // with a CTE present, a FROM subselect would be a third level
      val outer = parseStatement(allowSubquery = ctes.isEmpty)
      p.expectEof()
      ctes.get(outer.table) match {
        case None => outer
        case Some(inner) => mergeWith(outer, inner)
      }
    }

    private def mergeWith(outer: AqlQuery, inner: AqlQuery): AqlQuery = {
      if (inner.measures != Seq(AqlMeasure(None, "1")))
        throw ParseException("aggregates inside a subquery are not supported", 0)
      if (outer.timeFilter.nonEmpty && inner.timeFilter.nonEmpty &&
          outer.timeFilter != inner.timeFilter)
        throw ParseException("conflicting time filters between WITH and outer query", 0)
      val supporting = inner.dimensionList.filter(d =>
        d.alias.exists(_.nonEmpty) && d.expr.nonEmpty && d.expr != "*")
      outer.copy(
        table = inner.table,
        joins = Some(inner.joinList ++ outer.joinList).filter(_.nonEmpty),
        rowFilters = Some(inner.filters ++ outer.filters).filter(_.nonEmpty),
        timeFilter = outer.timeFilter.orElse(inner.timeFilter),
        supportingDimensions = Some(supporting).filter(_.nonEmpty),
        timezone = outer.timezone.orElse(inner.timezone),
        now = outer.now.orElse(inner.now))
    }

    /** @param allowSubquery a parenthesized subselect may appear in FROM —
      *   the second of the reference's two query levels
      *   (sql_parser.go:34-47, maxLevelQuery = 2); deeper nesting rejects
      */
    private def parseStatement(allowSubquery: Boolean = false): AqlQuery = {
      p.expectKw("select")
      val items = ArrayBuffer.empty[(Expr, Option[String])]
      items += selectItem()
      while (isOp(",")) { p.advance(); items += selectItem() }

      p.expectKw("from")
      var fromSub: Option[AqlQuery] = None
      val table =
        if (isOp("(")) {
          if (!allowSubquery)
            throw ParseException("at most 2 query levels supported", 0)
          p.advance()
          if (p.isKw(p.cur, "with"))
            throw ParseException("at most one WITH level supported", 0)
          fromSub = Some(parseStatement(allowSubquery = false))
          p.expectOp(")")
          // optional derived-table alias
          if (p.isKw(p.cur, "as")) { p.advance(); ident() }
          else p.cur match {
            case TIdent(s, _) if !reservedAfterRelation(s) => p.advance()
            case _ =>
          }
          fromSub.get.table
        } else ident()
      // optional main-table alias
      if (p.isKw(p.cur, "as")) { p.advance(); ident() }

      val joins = ArrayBuffer.empty[AqlJoin]
      while (p.isKw(p.cur, "join") || p.isKw(p.cur, "inner") ||
          p.isKw(p.cur, "left")) {
        if (p.isKw(p.cur, "inner")) p.advance()
        else if (p.isKw(p.cur, "left")) {
          p.advance(); if (p.isKw(p.cur, "outer")) p.advance()
        }
        p.expectKw("join")
        val jt = ident()
        val alias =
          if (p.isKw(p.cur, "as")) { p.advance(); Some(ident()) }
          else p.cur match {
            case TIdent(s, _) if !reservedAfterRelation(s) => p.advance(); Some(s)
            case _ => None
          }
        p.expectKw("on")
        val conds = flattenAnd(p.parseExpr(0))
        joins += AqlJoin(jt, alias, conds.map(Render(_)))
      }

      var timeFilter: Option[AqlTimeFilter] = None
      var timezone: Option[String] = None
      var nowOverride: Option[Long] = None
      val rowFilters = ArrayBuffer.empty[String]
      if (p.isKw(p.cur, "where")) {
        p.advance()
        // top-level AND conjuncts; the pseudo-functions must not sit under
        // OR (ref sql_parser.go hasORInPath check)
        val conjuncts = flattenAnd(p.parseExpr(0))
        conjuncts.foreach {
          case Expr.Call("aql_time_filter", Seq(c, f, t, tz)) =>
            if (timeFilter.nonEmpty)
              throw ParseException("duplicate aql_time_filter", 0)
            timeFilter = Some(AqlTimeFilter(
              Some(Render(c)), Some(str(f, "from")), Some(str(t, "to"))))
            timezone = Some(Render.timezone(tz)).filter(_.nonEmpty)
          case Expr.Call("aql_now", Seq(_, n)) =>
            nowOverride = Some(num(n, "aql_now"))
          case other => rowFilters += Render(other)
        }
      }

      val groupDims = ArrayBuffer.empty[AqlDimension]
      // ONE conflict-checking sink for every group item: a mismatched
      // timezone on ANY time bucket (not just the first) is an error
      val tzSink: String => Unit = tz => if (tz.nonEmpty) {
        timezone match {
          case Some(existing) if existing != tz =>
            throw ParseException(s"different timebucket timezone $tz", 0)
          case _ => timezone = Some(tz)
        }
      }
      if (p.isKw(p.cur, "group")) {
        p.advance(); p.expectKw("by")
        groupDims += groupItem(tzSink)
        while (isOp(",")) {
          p.advance()
          groupDims += groupItem(tzSink)
        }
      }
      // the reference rejects HAVING explicitly (sql_parser.go:493-496)
      if (p.isKw(p.cur, "having"))
        throw ParseException("having not yet supported", 0)

      val sorts = ArrayBuffer.empty[AqlSortField]
      if (p.isKw(p.cur, "order")) {
        p.advance(); p.expectKw("by")
        var done = false
        while (!done) {
          val name = Render(p.parseExpr(0))
          val dir =
            if (p.isKw(p.cur, "asc")) { p.advance(); Some("asc") }
            else if (p.isKw(p.cur, "desc")) { p.advance(); Some("desc") }
            else None
          sorts += AqlSortField(name, dir)
          if (isOp(",")) p.advance() else done = true
        }
      }

      var limit: Option[Int] = None
      if (p.isKw(p.cur, "limit")) {
        p.advance()
        limit = Some(num(p.parseExpr(0), "limit").toInt)
      }
      // caller checks EOF (a CTE body ends at its closing paren instead)

      // classify select items (ref aggFuncExists): aggregate → measure
      val measures = ArrayBuffer.empty[AqlMeasure]
      val selectDims = ArrayBuffer.empty[AqlDimension]
      items.foreach { case (e, alias) =>
        if (containsAggregate(e))
          measures += AqlMeasure(alias, Render(e))
        else if (e == Expr.Wildcard)
          selectDims += AqlDimension(alias, Some("*"))
        else
          selectDims += AqlDimension(alias, Some(Render(e)))
      }
      // non-aggregate query: measure literal 1, select items are the dims
      if (measures.isEmpty) measures += AqlMeasure(None, "1")

      // merge: group-by dims take aliases from matching select items
      val dims: Seq[AqlDimension] =
        if (groupDims.isEmpty) selectDims.toSeq
        else groupDims.map { gd =>
          selectDims.find(_.sqlExpression == gd.sqlExpression) match {
            case Some(sd) => gd.copy(alias = sd.alias.orElse(gd.alias))
            case None => gd
          }
        }.toSeq

      val q = AqlQuery(
        table = table,
        joins = Some(joins.toSeq).filter(_.nonEmpty),
        dimensions = Some(dims).filter(_.nonEmpty),
        measures = measures.toSeq,
        rowFilters = Some(rowFilters.toSeq).filter(_.nonEmpty),
        timeFilter = timeFilter,
        timezone = timezone,
        now = nowOverride,
        limit = limit,
        sorts = Some(sorts.toSeq).filter(_.nonEmpty))
      // a FROM subselect merges into the single AQL exactly like a CTE
      fromSub.fold(q)(inner => mergeWith(q, inner))
    }

    private def selectItem(): (Expr, Option[String]) = {
      val e = p.parseExpr(0)
      val alias =
        if (p.isKw(p.cur, "as")) { p.advance(); Some(ident()) }
        else None
      (e, alias)
    }

    private def reservedAfterRelation(s: String): Boolean =
      Set("join", "inner", "left", "on", "where", "group", "order", "limit")
        .contains(s.toLowerCase)

    private def groupItem(timezoneSink: String => Unit): AqlDimension =
      p.parseExpr(0) match {
        case Expr.Call(name, args) if name.startsWith(TimeBucketPrefix) =>
          if (args.length != 3)
            throw ParseException(s"$name should have 3 parameters", 0)
          val bucketizer = name.stripPrefix(TimeBucketPrefix).replace('_', ' ')
          timezoneSink(Render.timezone(args(2)))
          val unit = str(args(1), "timeunit")
          AqlDimension(None, Some(Render(args(0))),
            timeBucketizer = Some(bucketizer),
            timeUnit = Some(unit).filter(_.nonEmpty))
        case Expr.Call(name, args) if name.startsWith(NumericBucketPrefix) =>
          if (args.length != 2)
            throw ParseException(s"$name should have 2 parameters", 0)
          val nb = name.stripPrefix(NumericBucketPrefix) match {
            case "bucket_width" => AqlNumericBucketizer(bucketWidth = Some(numD(args(1))))
            case "logbase" => AqlNumericBucketizer(logBase = Some(numD(args(1))))
            // comma-separated bounds in a quoted string, e.g. "0,50,100"
            // (ref sql_parser.go:1521-1534; the reference's spelling is
            // "mannual", accepted alongside the corrected form)
            case "mannual_partitions" | "manual_partitions" =>
              val bounds = str(args(1), "partitions").split(",").toSeq.map { s =>
                s.trim.toDoubleOption.getOrElse(
                  throw ParseException(s"bad partition bound '$s'", 0))
              }
              AqlNumericBucketizer(manualPartitions = Some(bounds))
            case other => throw ParseException(s"unknown numeric bucketizer $other", 0)
          }
          AqlDimension(None, Some(Render(args(0))), numericBucketizer = Some(nb))
        case other => AqlDimension(None, Some(Render(other)))
      }

    private def flattenAnd(e: Expr): Seq[Expr] = e match {
      case Expr.Binary(BinOp.And, l, r) => flattenAnd(l) ++ flattenAnd(r)
      case other => Seq(other)
    }

    private def containsAggregate(e: Expr): Boolean = e match {
      case Expr.Call(name, args) =>
        AggregateFunctions.contains(name) || args.exists(containsAggregate)
      case Expr.Binary(_, l, r) => containsAggregate(l) || containsAggregate(r)
      case Expr.Unary(_, inner) => containsAggregate(inner)
      case Expr.Paren(inner) => containsAggregate(inner)
      case Expr.In(inner, list, _) => containsAggregate(inner) || list.exists(containsAggregate)
      case Expr.Case(whens, otherwise) =>
        whens.exists { case (c, v) => containsAggregate(c) || containsAggregate(v) } ||
          otherwise.exists(containsAggregate)
      case _ => false
    }

    private def str(e: Expr, what: String): String = e match {
      case Expr.Str(s) => s
      case other => throw ParseException(s"expected string for $what", 0)
    }

    private def num(e: Expr, what: String): Long = e match {
      case Expr.Num(v, _, true) => v.toLong
      case other => throw ParseException(s"expected integer for $what", 0)
    }

    private def numD(e: Expr): Double = e match {
      case Expr.Num(v, _, _) => v
      case other => throw ParseException("expected number", 0)
    }
  }
}
