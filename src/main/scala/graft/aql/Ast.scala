package graft.aql

/** Expression AST for the AQL expression language.
  *
  * The surface mirrors the reference's InfluxQL-derived expression language
  * (/root/reference/query/expr/ast.go:96-500): variable references, int /
  * float / string / bool / null literals, unary and binary operators,
  * function calls, CASE WHEN, and the wildcard. The node set is re-designed
  * for Scala pattern matching rather than translated: IN / NOT IN get a
  * dedicated node (the reference parses them as a BinaryExpr over a call
  * node and later expands to an OR-chain — our compiler consumes the
  * dedicated node directly).
  */
sealed trait Expr

object Expr {
  /** Column reference, possibly qualified (`table.column`). */
  final case class VarRef(name: String) extends Expr

  /** Numeric literal. `isInt` drives type-promotion rules (§2.7): integer
    * literals participate in unsigned/signed arithmetic, float literals
    * promote the expression to float.
    */
  final case class Num(value: Double, text: String, isInt: Boolean) extends Expr

  final case class Str(value: String) extends Expr
  final case class Bool(value: Boolean) extends Expr
  case object Null extends Expr
  case object Wildcard extends Expr

  /** Function call; `name` is lower-cased at parse time. */
  final case class Call(name: String, args: Seq[Expr]) extends Expr

  final case class Unary(op: UnaryOp, e: Expr) extends Expr
  final case class Binary(op: BinOp, l: Expr, r: Expr) extends Expr

  /** `x IN (a, b, c)` / `x NOT IN (a, b, c)` — compile-time expansion to an
    * OR/AND chain of equalities happens in the compiler
    * (ref query/context/query_context_helper.go:93-129).
    */
  final case class In(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr

  /** `CASE WHEN c THEN v ... [ELSE e] END` (searched form only — the
    * reference grammar has no simple-case operand form, ast.go:251-280).
    */
  final case class Case(whens: Seq[(Expr, Expr)], otherwise: Option[Expr]) extends Expr

  final case class Paren(e: Expr) extends Expr
}

sealed abstract class UnaryOp(val sym: String)
object UnaryOp {
  case object Neg extends UnaryOp("-")
  case object Not extends UnaryOp("NOT")
  case object Exclamation extends UnaryOp("!")
  case object BitwiseNot extends UnaryOp("~")
  case object IsNull extends UnaryOp("IS NULL")
  case object IsNotNull extends UnaryOp("IS NOT NULL")
  case object IsTrue extends UnaryOp("IS TRUE")
  case object IsFalse extends UnaryOp("IS FALSE")
}

sealed abstract class BinOp(val sym: String, val precedence: Int)
object BinOp {
  // precedence mirrors ref query/expr/token.go:302-331
  case object Or extends BinOp("OR", 1)
  case object And extends BinOp("AND", 2)
  case object Eq extends BinOp("=", 4)
  case object Neq extends BinOp("!=", 4)
  case object Lt extends BinOp("<", 4)
  case object Lte extends BinOp("<=", 4)
  case object Gt extends BinOp(">", 4)
  case object Gte extends BinOp(">=", 4)
  case object BitOr extends BinOp("|", 5)
  case object BitAnd extends BinOp("&", 6)
  case object Shl extends BinOp("<<", 7)
  case object Shr extends BinOp(">>", 7)
  case object Add extends BinOp("+", 8)
  case object Sub extends BinOp("-", 8)
  case object Mul extends BinOp("*", 9)
  case object Div extends BinOp("/", 9)
  case object Mod extends BinOp("%", 9)
  case object BitXor extends BinOp("^", 10)

  val all: Seq[BinOp] = Seq(Or, And, Eq, Neq, Lt, Lte, Gt, Gte, BitOr,
    BitAnd, Shl, Shr, Add, Sub, Mul, Div, Mod, BitXor)
}

/** Parse failure with position info. */
final case class ParseException(msg: String, pos: Int)
  extends RuntimeException(s"$msg (at offset $pos)")
