package graft.exec

import org.json4s._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the broker's partial-result fold.
  *
  * [[Broker.merged]] reduces per-slice result trees with
  * `.reduce(mergeTrees(op))`; `Seq.reduce` folds left in arrival order, so
  * for the merged answer to be independent of HOW the data is sliced and
  * WHICH order the gathers land, the fold must be associative and
  * commutative — including the edges the two-slice integration tests
  * rarely hit: a group key missing from one slice but not another, null
  * leaves (all-null groups), and deep dimension nesting. Leaves are
  * integer-valued doubles so floating-point non-associativity can't mask a
  * structural bug (the wire itself is float64; ulp-level sum reordering is
  * the documented and accepted behavior for fractional measures).
  */
class BrokerMergeAlgebraSpec extends AnyFunSuite {

  // never contacted: mergeTrees is pure
  private val broker = new Broker(Seq("http://localhost:9"))

  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0x5EED00L + i)))
    }

  private val keys = Seq("a", "b", "c", "NULL")

  /** A partial-result tree of the given depth: at depth 0 a leaf (an
    * integer-valued measure, an explicit null, or ABSENT — the key simply
    * not reported by that slice); above, an object over a random subset of
    * the key pool. JNothing marks absence and is filtered out of JObjects
    * (json4s renders it as a dropped field, which is exactly how a missing
    * group looks on the wire).
    */
  private def genTree(depth: Int): Gen[JValue] =
    if (depth <= 0)
      Gen.frequency(
        6 -> Gen.choose(-1000L, 1000L).map(v => JDouble(v.toDouble)),
        1 -> Gen.const(JNull))
    else
      Gen.sequence[List[(String, Option[JValue])], (String, Option[JValue])](
        keys.map(k => Gen.zip(
          Gen.const(k),
          Gen.frequency(
            3 -> genTree(depth - 1).map(Some(_)),
            1 -> Gen.const(Option.empty[JValue])))))
        .map(fields => JObject(fields.collect { case (k, Some(v)) => k -> v }: _*))

  /** Key-order-insensitive comparison form. */
  private def normalize(v: JValue): Any = v match {
    case JObject(fields) => fields.map { case (k, c) => k -> normalize(c) }.sortBy(_._1)
    case JDouble(d) => d
    case other => other
  }

  private val FoldOps = Seq("sum", "count", "min", "max")

  test("merge is commutative (slice gather order cannot change the answer)") {
    val gen = Gen.zip(genTree(2), genTree(2), Gen.oneOf(FoldOps))
    forAllN(gen, n = 400) { case (x, y, op) =>
      val m = broker.mergeTrees(op) _
      assert(normalize(m(x, y)) == normalize(m(y, x)),
        s"$op not commutative for\n  $x\n  $y")
    }
  }

  test("merge is associative (slice count and reduce shape cannot change the answer)") {
    val gen = Gen.zip(genTree(2), genTree(2), genTree(2), Gen.oneOf(FoldOps))
    forAllN(gen, n = 400) { case (x, y, z, op) =>
      val m = broker.mergeTrees(op) _
      assert(normalize(m(m(x, y), z)) == normalize(m(x, m(y, z))),
        s"$op not associative for\n  $x\n  $y\n  $z")
    }
  }

  test("missing keys and null leaves are identities, never zeros") {
    val m = broker.mergeTrees("sum") _
    // a group absent on one slice keeps the other slice's value
    val only = JObject("a" -> JDouble(7))
    assert(normalize(m(only, JObject())) == normalize(only))
    assert(normalize(m(JObject(), only)) == normalize(only))
    // an all-null group (key present, null leaf) is the fold identity,
    // not 0 — summing it as 0 would be right for sum but WRONG for min
    val withNull = JObject("a" -> JNull)
    val mMin = broker.mergeTrees("min") _
    assert(normalize(mMin(withNull, only)) == normalize(only))
    assert(normalize(mMin(only, withNull)) == normalize(only))
    // both sides null stays null (the group existed, its measure is null)
    assert(mMin(withNull, JObject("a" -> JNull)) == JObject("a" -> JNull))
  }

  test("avg pairs a sum branch with a count branch and errors on a lone one") {
    val mAvg = broker.mergeTrees("avg") _
    val sums = JObject("a" -> JDouble(10), "b" -> JDouble(3))
    val counts = JObject("a" -> JDouble(4), "b" -> JDouble(0))
    // division per leaf; count 0 folds to null, not Infinity
    assert(normalize(mAvg(sums, counts)) ==
      normalize(JObject("a" -> JDouble(2.5), "b" -> JNull)))
    val e = intercept[IllegalStateException] {
      mAvg(JObject("a" -> JDouble(1)), JObject())
    }
    assert(e.getMessage.contains("only a sum branch"), e.getMessage)
  }
}
