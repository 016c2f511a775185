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
}
