package graft.aql

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Render ↔ parse round-trip over ARBITRARY expression trees.
  *
  * The SQL front end and the broker both re-render AST subtrees to
  * expression strings that get REPARSED downstream (SqlFront → AqlQuery
  * fields → AqlCompiler; Broker's derived-measure split → scattered
  * subqueries). Parser-produced trees round-trip by construction (explicit
  * parens survive as Paren nodes), but a tree SYNTHESIZED by a rewrite has
  * no such guarantee — `Binary(Mul, Binary(Add, a, b), c)` rendered
  * without derived parentheses would reparse as `a + (b * c)`: a silent
  * wrong answer, not an error. This spec pins Render's precedence
  * re-derivation with generated trees: for any tree, parse(render(t))
  * must equal t up to Paren nodes.
  */
class RenderPropertySpec extends AnyFunSuite {

  /** Deterministic fixed-seed drive (the WirePropertySpec discipline —
    * no scalatestplus bridge in the dependency set).
    */
  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0xAE5DB00L + i)))
    }

  // ---- generator: arbitrary (parser-shaped OR synthesized) trees ---------

  private val genName: Gen[String] = for {
    head <- Gen.oneOf("col", "x", "fare", "t.city_id", "a_b")
    n <- Gen.choose(0, 99)
  } yield s"$head$n"

  private val genLeaf: Gen[Expr] = Gen.oneOf(
    genName.map(Expr.VarRef(_)),
    Gen.choose(0L, 1000000L).map(v => Expr.Num(v.toDouble, v.toString, isInt = true)),
    Gen.choose(0.001, 1.0e12).map(v => Expr.Num(v, v.toString, isInt = false)),
    // strings exercise the escaping rules: quotes, backslashes, spaces,
    // operator characters
    Gen.oneOf("", "plain", "it's", "back\\slash", "a + b * c", "not in",
      "quote'\\mix''", "trailing\\").map(Expr.Str(_)),
    Gen.oneOf(Expr.Bool(true), Expr.Bool(false), Expr.Null))

  private val prefixOps =
    Seq(UnaryOp.Neg, UnaryOp.Not, UnaryOp.Exclamation, UnaryOp.BitwiseNot)
  private val postfixOps =
    Seq(UnaryOp.IsNull, UnaryOp.IsNotNull, UnaryOp.IsTrue, UnaryOp.IsFalse)

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> (for {
        name <- Gen.oneOf("floor", "fn", "hex", "length")
        n <- Gen.choose(0, 3)
        args <- Gen.listOfN(n, genExpr(depth - 1))
      } yield Expr.Call(name, args)),
      1 -> (for {
        op <- Gen.oneOf(prefixOps)
        inner <- genExpr(depth - 1)
      } yield Expr.Unary(op, inner)),
      1 -> (for {
        op <- Gen.oneOf(postfixOps)
        inner <- genExpr(depth - 1)
      } yield Expr.Unary(op, inner)),
      4 -> (for {
        op <- Gen.oneOf(BinOp.all)
        l <- genExpr(depth - 1)
        r <- genExpr(depth - 1)
      } yield Expr.Binary(op, l, r)),
      1 -> (for {
        inner <- genExpr(depth - 1)
        n <- Gen.choose(1, 3)
        list <- Gen.listOfN(n, genLeaf)
        neg <- Gen.oneOf(true, false)
      } yield Expr.In(inner, list, neg)),
      1 -> (for {
        n <- Gen.choose(1, 2)
        whens <- Gen.listOfN(n, Gen.zip(genExpr(depth - 1), genExpr(depth - 1)))
        otherwise <- Gen.option(genExpr(depth - 1))
      } yield Expr.Case(whens, otherwise)),
      1 -> genExpr(depth - 1).map(Expr.Paren(_)))

  /** Paren nodes carry no semantics — strip before comparing. */
  private def stripParen(e: Expr): Expr = e match {
    case Expr.Paren(inner) => stripParen(inner)
    case Expr.Binary(op, l, r) => Expr.Binary(op, stripParen(l), stripParen(r))
    case Expr.Unary(op, inner) => Expr.Unary(op, stripParen(inner))
    case Expr.Call(n, args) => Expr.Call(n, args.map(stripParen))
    case Expr.In(inner, list, neg) =>
      Expr.In(stripParen(inner), list.map(stripParen), neg)
    case Expr.Case(whens, otherwise) =>
      Expr.Case(whens.map { case (c, v) => (stripParen(c), stripParen(v)) },
        otherwise.map(stripParen))
    case leaf => leaf
  }

  test("parse(render(t)) == t up to parens, for arbitrary trees") {
    forAllN(genExpr(5), n = 2000) { t =>
      val rendered = Render(t)
      val reparsed =
        try ExprParser.parse(rendered)
        catch {
          case e: ParseException =>
            fail(s"render produced unparseable text '$rendered' for $t: $e")
        }
      assert(stripParen(reparsed) == stripParen(t),
        s"round-trip diverged:\n  tree:     $t\n  rendered: $rendered\n  reparsed: $reparsed")
    }
  }

  test("synthesized precedence traps render with derived parentheses") {
    val a = Expr.VarRef("a"); val b = Expr.VarRef("b"); val c = Expr.VarRef("c")
    // (a + b) * c synthesized without a Paren node
    val mulOverAdd = Expr.Binary(BinOp.Mul, Expr.Binary(BinOp.Add, a, b), c)
    assert(Render(mulOverAdd) == "(a + b) * c")
    // a - (b - c): equal precedence, right-nested
    val subRight = Expr.Binary(BinOp.Sub, a, Expr.Binary(BinOp.Sub, b, c))
    assert(Render(subRight) == "a - (b - c)")
    // not (a and b) vs (not a) and b
    val notOverAnd = Expr.Unary(UnaryOp.Not, Expr.Binary(BinOp.And, a, b))
    assert(Render(notOverAnd) == "not (a AND b)")
    // x + (a in (1)): a bare right-side IN would swallow the addition
    val inRight = Expr.Binary(BinOp.Add, a,
      Expr.In(b, Seq(Expr.Num(1, "1", isInt = true)), negated = false))
    assert(stripParen(ExprParser.parse(Render(inRight))) == stripParen(inRight))
    // left-associative chains stay unparenthesized (no formatting churn)
    val chain = Expr.Binary(BinOp.Sub,
      Expr.Binary(BinOp.Sub, a, b), c)
    assert(Render(chain) == "a - b - c")
  }

  test("parser-shaped trees keep exact (not just modulo-paren) round-trip") {
    // the SqlFront contract: a tree that CAME FROM the parser renders to
    // text that reparses to the IDENTICAL tree, Paren nodes included
    val exprs = Seq(
      "a + b * (c - 1) >= 10",
      "-(a + b) * c",
      "case when x > 0 then 'p' else 'n' end + 1",
      "status in ('a', 'b') and x is not null",
      "a = b = c",
      "x << 2 | y & 3 ^ z",
      "not x and !y or ~z > 0")
    exprs.foreach { s =>
      val once = ExprParser.parse(s)
      assert(ExprParser.parse(Render(once)) == once, s"$s -> ${Render(once)}")
    }
  }
}
