package graft.aql

import java.time.ZoneId

import org.scalatest.funsuite.AnyFunSuite

/** Time-expression semantics pinned against the reference's own test matrix
  * (/root/reference/query/common/time_filter_test.go:28-110): now =
  * 2016-03-16T00:24:26 America/New_York, epoch 1458102266. Expected epochs
  * computed independently (python zoneinfo), not with java.time.
  */
class TimeExprSpec extends AnyFunSuite {
  private val zone = ZoneId.of("America/New_York")
  private val nowEpoch = 1458102266L

  private def bounds(from: String, to: String = ""): (Option[Long], Option[Long]) = {
    val b = TimeExpr.parseFilter(from, to, zone, nowEpoch)
    (b.fromEpoch, b.toEpoch)
  }

  test("now") {
    assert(bounds("now") == (Some(nowEpoch), Some(nowEpoch)))
  }

  test("this year / 0y") {
    for (e <- Seq("this year", "0y"))
      assert(bounds(e, e) == (Some(1451624400L), Some(1483246800L)), e)
  }

  test("this quarter-hour") {
    assert(bounds("this quarter-hour", "this quarter-hour") ==
      (Some(1458101700L), Some(1458102600L)))
  }

  test("70 hours ago crosses the spring DST gap (hour is instant-based)") {
    for (e <- Seq("70 hours ago", "-70h")) {
      val (f, t) = bounds(e, e)
      assert(f.contains(1457848800L), e) // 2016-03-13T01:00-05
      assert(t.contains(1457848800L + 3600), e) // 03:00-04, one instant-hour later
    }
  }

  test("last week spans DST begin (calendar day arithmetic)") {
    for (e <- Seq("last week", "-1w"))
      assert(bounds(e, e) == (Some(1457326800L), Some(1457928000L)), e)
  }

  test("yesterday / today sugar") {
    assert(bounds("yesterday", "yesterday") == (Some(1458014400L), Some(1458100800L)))
  }

  test("N units ago") {
    assert(bounds("4 months ago", "4 months ago") ==
      (Some(1446350400L), Some(1448946000L)))
  }

  test("absolute year / quarter / date / minute forms") {
    assert(bounds("2014-Q2", "2014-Q2") == (Some(1396324800L), Some(1404187200L)))
    assert(bounds("2016-03-13", "2016-03-13") == (Some(1457845200L), Some(1457928000L)))
    assert(bounds("2016-03-13 01:31", "2016-03-13 01:31") ==
      (Some(1457850660L), Some(1457850720L)))
  }

  test("raw epoch seconds and milliseconds") {
    assert(bounds("1464832801", "1464832801") == (Some(1464832801L), Some(1464832801L)))
    assert(bounds("1464832801000", "1464832801000") ==
      (Some(1464832801L), Some(1464832801L)))
  }

  test("to defaults to now when only from is given") {
    assert(bounds("-1d") == (Some(1458014400L), Some(nowEpoch)))
  }

  test("unknown unit rejected") {
    intercept[ParseException](bounds("this fortnight"))
  }
}

class ExprParserSpec extends AnyFunSuite {
  import Expr._

  test("precedence: arithmetic over comparison over AND over OR") {
    val e = ExprParser.parse("a + b * 2 >= 10 and c = 'x' or d is null")
    assert(e == Binary(BinOp.Or,
      Binary(BinOp.And,
        Binary(BinOp.Gte,
          Binary(BinOp.Add, VarRef("a"), Binary(BinOp.Mul, VarRef("b"), Num(2, "2", true))),
          Num(10, "10", true)),
        Binary(BinOp.Eq, VarRef("c"), Str("x"))),
      Unary(UnaryOp.IsNull, VarRef("d"))))
  }

  test("bitwise precedence mirrors the reference (| < & < shifts < +)") {
    val e = ExprParser.parse("a | b & c << 1 + 2")
    assert(e == Binary(BinOp.BitOr, VarRef("a"),
      Binary(BinOp.BitAnd, VarRef("b"),
        Binary(BinOp.Shl, VarRef("c"),
          Binary(BinOp.Add, Num(1, "1", true), Num(2, "2", true))))))
  }

  test("IN / NOT IN lists") {
    assert(ExprParser.parse("status in ('a', 'b')") ==
      In(VarRef("status"), Seq(Str("a"), Str("b")), negated = false))
    assert(ExprParser.parse("status not in (1, 2)") ==
      In(VarRef("status"), Seq(Num(1, "1", true), Num(2, "2", true)), negated = true))
  }

  test("CASE WHEN chains") {
    val e = ExprParser.parse("case when x > 0 then 'pos' when x < 0 then 'neg' else 'zero' end")
    e match {
      case Case(whens, Some(Str("zero"))) => assert(whens.length == 2)
      case other => fail(s"unexpected: $other")
    }
  }

  test("qualified identifiers and calls") {
    assert(ExprParser.parse("trips.city_id") == VarRef("trips.city_id"))
    assert(ExprParser.parse("count(*)") == Call("count", Seq(Wildcard)))
    assert(ExprParser.parse("sum(fare)") == Call("sum", Seq(VarRef("fare"))))
    assert(ExprParser.parse("floor(request_at, 3600)") ==
      Call("floor", Seq(VarRef("request_at"), Num(3600, "3600", true))))
  }

  test("unary and IS forms") {
    assert(ExprParser.parse("-x") == Unary(UnaryOp.Neg, VarRef("x")))
    assert(ExprParser.parse("not x") == Unary(UnaryOp.Not, VarRef("x")))
    assert(ExprParser.parse("x is not null") == Unary(UnaryOp.IsNotNull, VarRef("x")))
    assert(ExprParser.parse("x is true") == Unary(UnaryOp.IsTrue, VarRef("x")))
  }

  test("string quoting styles") {
    assert(ExprParser.parse("s = 'completed'") ==
      Binary(BinOp.Eq, VarRef("s"), Str("completed")))
    assert(ExprParser.parse("s != \"b\"") == Binary(BinOp.Neq, VarRef("s"), Str("b")))
  }

  test("trailing garbage rejected") {
    intercept[ParseException](ExprParser.parse("a + b )"))
    intercept[ParseException](ExprParser.parse("a b"))
  }
}
