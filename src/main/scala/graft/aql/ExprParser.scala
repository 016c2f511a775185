package graft.aql

import scala.collection.mutable.ArrayBuffer

/** Lexer + precedence-climbing parser for AQL expressions.
  *
  * Token surface and operator precedence follow the reference's scanner and
  * token tables (/root/reference/query/expr/token.go:31-160, 302-331;
  * scanner.go): single-quoted strings, dotted identifiers, `!=`, `<<`/`>>`,
  * keywords AND/OR/NOT/IS/IN/CASE/WHEN/THEN/ELSE/END/NULL/TRUE/FALSE.
  * The implementation is an ordinary hand-written Scala scanner + Pratt
  * parser — no code derived from the reference.
  */
object ExprParser {

  // ---- tokens ------------------------------------------------------------

  sealed trait Tok { def pos: Int }
  private[aql] case class TIdent(s: String, pos: Int) extends Tok
  private[aql] case class TNum(text: String, pos: Int) extends Tok
  private[aql] case class TStr(s: String, pos: Int) extends Tok
  private[aql] case class TOp(s: String, pos: Int) extends Tok // punctuation ops
  private[aql] case class TEof(pos: Int) extends Tok

  // reserved words: rejected as bare identifiers. Includes the SQL
  // statement keywords so the SQL front end's sub-expressions terminate at
  // clause boundaries (ref query/sql/SqlBase.g4 reserved set).
  private val keywords = Set("and", "or", "not", "is", "in", "case", "when",
    "then", "else", "end", "null", "true", "false", "unknown", "distinct", "as",
    "select", "from", "where", "group", "by", "order", "limit", "join",
    "inner", "left", "outer", "full", "cross", "on", "with", "having",
    "asc", "desc")

  def lex(input: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = input.length
    def peek(k: Int): Char = if (i + k < n) input.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        while (i < n && (input.charAt(i).isDigit || input.charAt(i) == '.')) i += 1
        // exponent form
        if (i < n && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
          i += 1
          if (i < n && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
          while (i < n && input.charAt(i).isDigit) i += 1
        }
        out += TNum(input.substring(start, i), start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '_'
          || input.charAt(i) == '.')) i += 1
        out += TIdent(input.substring(start, i), start)
      } else if (c == '\'' || c == '"') {
        val quote = c
        val start = i
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val ch = input.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb += input.charAt(i + 1); i += 2 }
          else if (ch == quote) { closed = true; i += 1 }
          else { sb += ch; i += 1 }
        }
        if (!closed) throw ParseException("unterminated string", start)
        out += TStr(sb.toString, start)
      } else {
        val start = i
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        two match {
          case "!=" | "<>" | "<=" | ">=" | "<<" | ">>" =>
            out += TOp(if (two == "<>") "!=" else two, start); i += 2
          case _ =>
            c match {
              case '+' | '-' | '*' | '/' | '%' | '&' | '|' | '^' | '~' | '!' |
                   '=' | '<' | '>' | '(' | ')' | ',' =>
                out += TOp(c.toString, start); i += 1
              case _ => throw ParseException(s"unexpected character '$c'", start)
            }
        }
      }
    }
    out += TEof(n)
    out.toVector
  }

  // ---- parser ------------------------------------------------------------

  def parse(input: String): Expr = {
    val p = new P(lex(input))
    val e = p.parseExpr(0)
    p.expectEof()
    e
  }

  private val binOps: Map[String, BinOp] = Map(
    "or" -> BinOp.Or, "and" -> BinOp.And,
    "=" -> BinOp.Eq, "!=" -> BinOp.Neq,
    "<" -> BinOp.Lt, "<=" -> BinOp.Lte, ">" -> BinOp.Gt, ">=" -> BinOp.Gte,
    "|" -> BinOp.BitOr, "&" -> BinOp.BitAnd,
    "<<" -> BinOp.Shl, ">>" -> BinOp.Shr,
    "+" -> BinOp.Add, "-" -> BinOp.Sub,
    "*" -> BinOp.Mul, "/" -> BinOp.Div, "%" -> BinOp.Mod,
    "^" -> BinOp.BitXor)

  // IS / IN sit at comparison precedence (token.go:312)
  private val CmpPrec = 4

  private[aql] final class P(toks: Vector[Tok]) {
    private var i = 0
    private[aql] def cur: Tok = toks(i)
    private[aql] def advance(): Tok = { val t = cur; i += 1; t }

    private[aql] def isKw(t: Tok, kw: String): Boolean = t match {
      case TIdent(s, _) => s.equalsIgnoreCase(kw)
      case _ => false
    }

    def expectEof(): Unit = cur match {
      case TEof(_) => ()
      case t => throw ParseException(s"unexpected trailing token", t.pos)
    }

    private[aql] def expectOp(s: String): Unit = cur match {
      case TOp(o, _) if o == s => i += 1
      case t => throw ParseException(s"expected '$s'", t.pos)
    }

    private[aql] def expectKw(kw: String): Unit =
      if (isKw(cur, kw)) i += 1
      else throw ParseException(s"expected $kw", cur.pos)

    def parseExpr(minPrec: Int): Expr = {
      var lhs = parseUnary()
      var done = false
      while (!done) {
        cur match {
          case TOp(op, _) if binOps.contains(op) && binOps(op).precedence >= minPrec =>
            val b = binOps(op); advance()
            lhs = Expr.Binary(b, lhs, parseExpr(b.precedence + 1))
          case t @ TIdent(s, _) if binOps.contains(s.toLowerCase)
              && binOps(s.toLowerCase).precedence >= minPrec =>
            val b = binOps(s.toLowerCase); advance()
            lhs = Expr.Binary(b, lhs, parseExpr(b.precedence + 1))
          case t if isKw(t, "is") && CmpPrec >= minPrec =>
            advance()
            lhs =
              if (isKw(cur, "not")) { advance(); expectKw("null"); Expr.Unary(UnaryOp.IsNotNull, lhs) }
              else if (isKw(cur, "null")) { advance(); Expr.Unary(UnaryOp.IsNull, lhs) }
              else if (isKw(cur, "true")) { advance(); Expr.Unary(UnaryOp.IsTrue, lhs) }
              else if (isKw(cur, "false")) { advance(); Expr.Unary(UnaryOp.IsFalse, lhs) }
              else throw ParseException("expected NULL/NOT NULL/TRUE/FALSE after IS", cur.pos)
          case t if isKw(t, "in") && CmpPrec >= minPrec =>
            advance(); lhs = Expr.In(lhs, parseParenList(), negated = false)
          case t if isKw(t, "not") && CmpPrec >= minPrec && isKw(toks(i + 1), "in") =>
            advance(); advance(); lhs = Expr.In(lhs, parseParenList(), negated = true)
          case _ => done = true
        }
      }
      lhs
    }

    private def parseParenList(): Seq[Expr] = {
      expectOp("(")
      val args = ArrayBuffer.empty[Expr]
      cur match {
        case TOp(")", _) => ()
        case _ =>
          args += parseExpr(0)
          while (cur match { case TOp(",", _) => true; case _ => false }) {
            advance(); args += parseExpr(0)
          }
      }
      expectOp(")")
      args.toSeq
    }

    private def parseUnary(): Expr = cur match {
      case TOp("-", _) => advance(); Expr.Unary(UnaryOp.Neg, parseUnary())
      case TOp("~", _) => advance(); Expr.Unary(UnaryOp.BitwiseNot, parseUnary())
      case TOp("!", _) => advance(); Expr.Unary(UnaryOp.Exclamation, parseUnary())
      case t if isKw(t, "not") => advance(); Expr.Unary(UnaryOp.Not, parseUnary())
      case _ => parsePrimary()
    }

    private def parsePrimary(): Expr = cur match {
      case TNum(text, pos) =>
        advance()
        val isInt = !text.exists(ch => ch == '.' || ch == 'e' || ch == 'E')
        try Expr.Num(text.toDouble, text, isInt)
        catch { case _: NumberFormatException => throw ParseException(s"bad number '$text'", pos) }
      case TStr(s, _) => advance(); Expr.Str(s)
      case TOp("(", _) =>
        advance()
        val e = parseExpr(0)
        expectOp(")")
        Expr.Paren(e)
      case TOp("*", _) => advance(); Expr.Wildcard
      case t if isKw(t, "null") => advance(); Expr.Null
      case t if isKw(t, "unknown") => advance(); Expr.Null
      case t if isKw(t, "true") => advance(); Expr.Bool(true)
      case t if isKw(t, "false") => advance(); Expr.Bool(false)
      case t if isKw(t, "case") => advance(); parseCase()
      case TIdent(name, pos) =>
        advance()
        cur match {
          case TOp("(", _) if !keywords.contains(name.toLowerCase) =>
            val (isDistinct, args) = parseCallArgs()
            val fname = name.toLowerCase
            if (isDistinct) {
              // DISTINCT must survive into the AST: dropping it here would
              // silently compile count(distinct x) as count(x) — and the
              // broker's per-slice merge cannot distribute an exact
              // distinct count at all (values spanning slices double-count)
              if (fname != "count")
                throw ParseException(
                  s"DISTINCT is only supported in count(distinct x), not $fname", pos)
              Expr.Call("countdistinct", args)
            } else Expr.Call(fname, args)
          case _ =>
            if (keywords.contains(name.toLowerCase))
              throw ParseException(s"unexpected keyword '$name'", pos)
            Expr.VarRef(name)
        }
      case t => throw ParseException("unexpected token", t.pos)
    }

    /** Call args; supports `count(*)` and `count(distinct x)` shapes.
      * Returns (sawDistinct, args) — the caller decides whether the
      * function admits DISTINCT (only `count` does).
      */
    private def parseCallArgs(): (Boolean, Seq[Expr]) = {
      expectOp("(")
      val args = ArrayBuffer.empty[Expr]
      var distinct = false
      cur match {
        case TOp(")", _) => ()
        case t if isKw(t, "distinct") =>
          advance(); distinct = true; args += parseExpr(0)
        case _ =>
          args += parseExpr(0)
          while (cur match { case TOp(",", _) => true; case _ => false }) {
            advance(); args += parseExpr(0)
          }
      }
      expectOp(")")
      (distinct, args.toSeq)
    }

    private def parseCase(): Expr = {
      val whens = ArrayBuffer.empty[(Expr, Expr)]
      while (isKw(cur, "when")) {
        advance()
        val cond = parseExpr(0)
        expectKw("then")
        val value = parseExpr(0)
        whens += ((cond, value))
      }
      if (whens.isEmpty) throw ParseException("CASE requires at least one WHEN", cur.pos)
      val otherwise =
        if (isKw(cur, "else")) { advance(); Some(parseExpr(0)) } else None
      expectKw("end")
      Expr.Case(whens.toSeq, otherwise)
    }
  }
}
