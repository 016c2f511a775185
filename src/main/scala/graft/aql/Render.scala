package graft.aql

/** Renders an expression AST back to AQL expression text.
  *
  * Used by the SQL front end, which (like the reference's ASTBuilder,
  * /root/reference/query/sql/sql_parser.go:108-121) assembles an AQLQuery
  * whose fields are expression STRINGS. Round-trip safety: every AST here
  * comes from [[ExprParser]], which materializes explicit parentheses as
  * [[Expr.Paren]] nodes — so rendering without re-deriving precedence
  * parentheses reparses to the identical AST.
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
    case Expr.Call(name, args) => name + "(" + args.map(apply).mkString(", ") + ")"
    case Expr.In(inner, list, negated) =>
      apply(inner) + (if (negated) " not in (" else " in (") +
        list.map(apply).mkString(", ") + ")"
    case Expr.Case(whens, otherwise) =>
      "case " +
        whens.map { case (c, v) => s"when ${apply(c)} then ${apply(v)}" }.mkString(" ") +
        otherwise.fold("")(o => s" else ${apply(o)}") + " end"
    case Expr.Unary(op, inner) =>
      op match {
        case UnaryOp.Neg => "-" + apply(inner)
        case UnaryOp.Not => "not " + apply(inner)
        case UnaryOp.Exclamation => "!" + apply(inner)
        case UnaryOp.BitwiseNot => "~" + apply(inner)
        case UnaryOp.IsNull => apply(inner) + " is null"
        case UnaryOp.IsNotNull => apply(inner) + " is not null"
        case UnaryOp.IsTrue => apply(inner) + " is true"
        case UnaryOp.IsFalse => apply(inner) + " is false"
      }
    case Expr.Binary(op, l, r) => s"${apply(l)} ${op.sym} ${apply(r)}"
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
