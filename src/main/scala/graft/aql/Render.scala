package graft.aql

/** Renders an expression AST back to AQL expression text.
  *
  * Used by the SQL front end, which (like the reference's ASTBuilder,
  * /root/reference/query/sql/sql_parser.go:108-121) assembles an AQLQuery
  * whose fields are expression STRINGS, and by the broker, which re-renders
  * measure SUBTREES as scattered subqueries.
  *
  * Round-trip contract (pinned by RenderPropertySpec): for ANY tree —
  * parser-shaped or synthesized by a rewrite — `parse(render(t))` equals
  * `t` up to [[Expr.Paren]] nodes. Parser-shaped trees carry explicit
  * parentheses as Paren nodes and never contain a bare
  * lower-precedence child, so they need no derived parentheses; a
  * SYNTHESIZED tree (`Binary(Mul, Binary(Add, a, b), c)`) would flatten to
  * `a + b * c` and silently reparse with different semantics. Rendering
  * therefore re-derives parentheses from [[BinOp.precedence]] wherever a
  * child would otherwise bind differently than the tree says.
  */
object Render {

  def apply(e: Expr): String = e match {
    case Expr.VarRef(n) => n
    case Expr.Num(_, text, _) => text
    case Expr.Str(s) => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case Expr.Bool(b) => if (b) "true" else "false"
    case Expr.Null => "NULL"
    case Expr.Wildcard => "*"
    case Expr.Paren(inner) => "(" + apply(inner) + ")"
    // countdistinct is the parser's internal name for count(distinct x) —
    // render back to the surface syntax so render→parse round-trips
    case Expr.Call("countdistinct", args) =>
      "count(distinct " + args.map(apply).mkString(", ") + ")"
    case Expr.Call(name, args) => name + "(" + args.map(apply).mkString(", ") + ")"
    case Expr.In(inner, list, negated) =>
      // the IN postfix applies at comparison tightness: a bare AND/OR
      // subject would leave the IN bound to its right arm only —
      // parenthesize those (comparisons and tighter work bare: the parser
      // accumulates them into the subject before IN applies)
      subject(inner) + (if (negated) " not in (" else " in (") +
        list.map(apply).mkString(", ") + ")"
    case Expr.Case(whens, otherwise) =>
      "case " +
        whens.map { case (c, v) => s"when ${apply(c)} then ${apply(v)}" }.mkString(" ") +
        otherwise.fold("")(o => s" else ${apply(o)}") + " end"
    case Expr.Unary(op, inner) =>
      op match {
        case UnaryOp.Neg => "-" + prefixOperand(inner)
        case UnaryOp.Not => "not " + prefixOperand(inner)
        case UnaryOp.Exclamation => "!" + prefixOperand(inner)
        case UnaryOp.BitwiseNot => "~" + prefixOperand(inner)
        // postfix forms apply at comparison tightness, like IN
        case UnaryOp.IsNull => subject(inner) + " is null"
        case UnaryOp.IsNotNull => subject(inner) + " is not null"
        case UnaryOp.IsTrue => subject(inner) + " is true"
        case UnaryOp.IsFalse => subject(inner) + " is false"
      }
    case Expr.Binary(op, l, r) =>
      s"${binOperand(l, op, right = false)} ${op.sym} ${binOperand(r, op, right = true)}"
  }

  /** A binary node's operand, parenthesized when it would re-bind: a
    * lower-precedence child anywhere, or an equal-precedence child on the
    * RIGHT (the parser associates left, so `Sub(a, Sub(b, c))` must render
    * `a - (b - c)`). A RIGHT operand of a comparison-or-tighter parent
    * also wraps when its text exposes an IN / postfix-IS token anywhere
    * outside parentheses: the right side parses ABOVE comparison
    * tightness, so such a token cannot bind inside the operand — it
    * escapes and rebinds the parent's whole accumulated left context
    * (`a = b in (1)` would reparse as `(a = b) in (1)`). On the LEFT (or
    * under AND/OR) postfix forms complete in place and need nothing;
    * CASE is fully `case…end`-delimited and never does.
    */
  private def binOperand(e: Expr, parent: BinOp, right: Boolean): String = e match {
    case Expr.Binary(c, _, _)
        if c.precedence < parent.precedence ||
          (right && c.precedence == parent.precedence) =>
      "(" + apply(e) + ")"
    case other
        if right && parent.precedence >= BinOp.Eq.precedence &&
          exposesPostfix(other) =>
      "(" + apply(other) + ")"
    case other => apply(other)
  }

  private val PostfixUnary: Set[UnaryOp] = Set(
    UnaryOp.IsNull, UnaryOp.IsNotNull, UnaryOp.IsTrue, UnaryOp.IsFalse)

  /** Whether `apply(e)`'s text carries an IN / IS token outside any
    * parentheses. Paren, Call, Case, and IN-lists shield their contents
    * (their delimiters reset the parse to precedence 0); prefix unary
    * shields because [[prefixOperand]] parenthesizes every non-primary
    * inner.
    */
  private def exposesPostfix(e: Expr): Boolean = e match {
    case _: Expr.In => true
    case Expr.Unary(op, _) if PostfixUnary(op) => true
    case Expr.Binary(_, l, r) => exposesPostfix(l) || exposesPostfix(r)
    case _ => false
  }

  /** A prefix operator's operand: anything that isn't self-delimiting
    * (literal, reference, call, explicit paren, nested prefix) gets
    * parentheses — `Not(And(a, b))` must render `not (a AND b)`, never
    * `not a AND b`.
    */
  private def prefixOperand(e: Expr): String = e match {
    case _: Expr.VarRef | _: Expr.Num | _: Expr.Str | _: Expr.Bool |
        Expr.Null | _: Expr.Call | _: Expr.Paren => apply(e)
    case Expr.Unary(UnaryOp.Neg | UnaryOp.Not | UnaryOp.Exclamation |
        UnaryOp.BitwiseNot, _) => apply(e)
    case other => "(" + apply(other) + ")"
  }

  /** The subject of a postfix form (IN / IS …): a bare AND/OR would keep
    * the postfix on its right arm only; everything at comparison tightness
    * and above accumulates into the subject before the postfix applies.
    */
  private def subject(e: Expr): String = e match {
    case Expr.Binary(op, _, _) if op.precedence < BinOp.Eq.precedence =>
      "(" + apply(e) + ")"
    case other => apply(other)
  }

  /** Timezone argument text: the SQL form writes timezones as bare
    * identifier paths (`America/New_York`), which the expression parser
    * reads as a division chain — flatten it back to the path.
    */
  def timezone(e: Expr): String = e match {
    case Expr.VarRef(n) => n
    case Expr.Str(s) => s
    case Expr.Binary(BinOp.Div, l, r) => timezone(l) + "/" + timezone(r)
    case Expr.Paren(inner) => timezone(inner)
    case other => throw ParseException(s"bad timezone expression", 0)
  }

  /** Render a whole [[AqlQuery]] back to the reference SQL dialect
    * [[SqlFront]] accepts — the inverse of `SqlFront.translate` for the
    * single-level query surface (`SqlRoundTripSpec` fuzzes
    * `translate(sql(q)) == q` over the gate vocabulary). Used for
    * debugging (show a JSON AQL document as SQL) and as the broker/test
    * canonical text form.
    *
    * Not SQL-expressible (throws): supporting dimensions/measures (the
    * JSON surface's alias-inlining has no SQL spelling here — the WITH
    * form SqlFront PARSES into them is not re-derivable one-to-one) and
    * per-measure rowFilters.
    */
  def sql(q: AqlQuery): String = {
    require(q.supportingDimensions.forall(_.isEmpty) &&
      q.supportingMeasures.forall(_.isEmpty),
      "supporting definitions have no direct SQL form")
    require(q.measures.forall(_.filters.isEmpty),
      "per-measure rowFilters have no SQL form")
    val tz = q.timezone.getOrElse("")
    val tzArg = if (tz.isEmpty) "\"\"" else tz // bare identifier path
    def num(v: Double): String =
      if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    def dimSql(d: AqlDimension): String =
      if (d.timeBucketizer.nonEmpty)
        s"aql_time_bucket_${d.timeBucketizer.get.replace(' ', '_')}" +
          s"""(${d.expr}, "${d.timeUnit.getOrElse("")}", $tzArg)"""
      else d.numericBucketizer match {
        case Some(AqlNumericBucketizer(Some(w), _, _)) =>
          s"aql_numeric_bucket_bucket_width(${d.expr}, ${num(w)})"
        case Some(AqlNumericBucketizer(_, Some(b), _)) =>
          s"aql_numeric_bucket_logbase(${d.expr}, ${num(b)})"
        case Some(AqlNumericBucketizer(_, _, Some(bounds))) =>
          s"""aql_numeric_bucket_manual_partitions(${d.expr}, "${bounds.map(num).mkString(",")}")"""
        case _ => d.expr
      }
    def aliased(text: String, alias: Option[String]): String =
      alias.filter(_.nonEmpty).fold(text)(a => s"$text AS $a")
    val nonAgg = q.measures == Seq(AqlMeasure(None, "1"))
    def isBucket(d: AqlDimension): Boolean =
      d.timeBucketizer.nonEmpty || d.numericBucketizer.nonEmpty
    // the SQL grammar cannot alias a BUCKET dim: SqlFront matches group
    // items to select items by full rendered text, and a bucket group
    // item's text is just its inner column — so bucket dims ride in GROUP
    // BY only, alias-less (the flagship gate shape), and a bucketed
    // non-agg query has no SQL spelling at all
    require(q.dimensionList.forall(d => !isBucket(d) || d.alias.forall(_.isEmpty)),
      "bucket dimensions cannot carry an alias in the SQL form")
    require(!nonAgg || q.dimensionList.forall(!isBucket(_)),
      "bucketed non-aggregate queries have no SQL form")
    val selectItems =
      if (nonAgg) q.dimensionList.map(d => aliased(dimSql(d), d.alias))
      else q.dimensionList.filterNot(isBucket)
        .map(d => aliased(dimSql(d), d.alias)) ++
        q.measures.map(m => aliased(m.sqlExpression, m.alias))
    require(selectItems.nonEmpty, "a query needs at least one select item")
    val joins = q.joinList.map { j =>
      s" JOIN ${j.table}${j.alias.filter(_.nonEmpty).fold("")(" " + _)} ON " +
        j.conditions.mkString(" AND ")
    }.mkString
    val where = {
      val conj = q.filters ++
        q.timeFilter.toSeq.map { tf =>
          s"""aql_time_filter(${tf.column.getOrElse("")}, "${tf.from.getOrElse("")}", "${tf.to.getOrElse("")}", $tzArg)"""
        } ++
        q.now.toSeq.map(n => s"aql_now(1, $n)")
      if (conj.isEmpty) "" else conj.mkString(" WHERE ", " AND ", "")
    }
    val groupBy =
      if (nonAgg || q.dimensionList.isEmpty) ""
      else q.dimensionList.map(dimSql).mkString(" GROUP BY ", ", ", "")
    val orderBy = q.sorts.filter(_.nonEmpty).fold("")(_.map(s =>
      s.name + s.order.filter(_.nonEmpty).fold("")(" " + _))
      .mkString(" ORDER BY ", ", ", ""))
    val limit = q.limit.fold("")(l => s" LIMIT $l")
    s"SELECT ${selectItems.mkString(", ")} FROM ${q.table}" +
      joins + where + groupBy + orderBy + limit
  }
}
