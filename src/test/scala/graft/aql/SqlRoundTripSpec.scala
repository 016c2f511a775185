package graft.aql

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Whole-QUERY SQL round-trip fuzz: generate random AqlQuery documents
  * from the gate vocabulary (dims, measures, filters, time/numeric
  * buckets, joins, sorts, limits), render to the reference SQL dialect
  * via [[Render.sql]], parse back through [[SqlFront.translate]], and
  * assert the round-tripped AST is EQUAL — which makes the compiled plans
  * agree by construction (the compiler is deterministic over the AST); a
  * compiled sample asserts that explicitly and proves the rendered SQL is
  * executable, not just parseable. Extends the r14 expression-level
  * render/parse fuzz (RenderPropertySpec) to full queries.
  */
class SqlRoundTripSpec extends SparkSpec {

  /** Deterministic fixed-seed drive (the WirePropertySpec discipline). */
  private def forAllN[A](gen: Gen[A], n: Int)(f: (A, Int) => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(0x51f00d5L + i)), i)
    }

  /** Canonical text form: one render→parse→render round makes the text a
    * fixpoint of SqlFront's own re-rendering (parser-shaped trees keep
    * exact round-trip, RenderPropertySpec).
    */
  private def canon(text: String): String = Render(ExprParser.parse(text))

  // ---- vocabulary (all valid over the events fixture) ----------------------

  private val genMeasureText: Gen[String] = Gen.oneOf(
    "count(*)", "sum(value)", "avg(value)", "min(value)", "max(value)",
    "countdistincthll(user_id)", "count(distinct user_id)",
    "sum(value) / count(*)", "max(value) - min(value)",
    "sum(case when value > 50 then 1 else 0 end)")

  private val genPlainDimText: Gen[String] = Gen.oneOf(
    "event_type", "user_id % 10", "user_id & 7",
    "case when value > 50 then 'hi' else 'lo' end",
    "floor(value, 25)") // reference floor(x, y): x - x % y

  private val genFilterText: Gen[String] = Gen.oneOf(
    "event_type = 'click'", "value > 10.5", "user_id in (1, 2, 3)",
    "props is not null", "event_type != 'view'",
    // no top-level AND inside one filter: SqlFront flattens WHERE
    // conjuncts, so `a and b` would round-trip as TWO rowFilters
    "value >= 1", "not (event_type = 'purchase')")

  private val genTimeBucket: Gen[AqlDimension] = for {
    b <- Gen.oneOf("hour", "day", "week", "month", "quarter", "year",
      "day of week", "hour of day", "month of year")
  } yield AqlDimension(None, Some("ts"), timeBucketizer = Some(b))

  private val genNumericBucket: Gen[AqlDimension] = for {
    nb <- Gen.oneOf(
      AqlNumericBucketizer(bucketWidth = Some(10.0)),
      AqlNumericBucketizer(logBase = Some(2.0)),
      AqlNumericBucketizer(manualPartitions = Some(Seq(0.0, 50.0, 100.0))))
  } yield AqlDimension(None, Some("value"), numericBucketizer = Some(nb))

  private val genTz: Gen[Option[String]] =
    Gen.oneOf(None, Some("UTC"), Some("America/New_York"), Some("Asia/Tokyo"))

  private val genJoin: Gen[AqlJoin] = Gen.oneOf(
    AqlJoin("customer", Some("c"), Seq(canon("user_id = c.c_custkey"))),
    AqlJoin("nation", None, Seq(canon("user_id % 25 = nation.n_nationkey"))))

  private val genQuery: Gen[AqlQuery] = for {
    agg <- Gen.frequency(4 -> true, 1 -> false)
    measures <-
      if (!agg) Gen.const(Seq(AqlMeasure(None, "1")))
      else for {
        n <- Gen.choose(1, 2)
        ms <- Gen.listOfN(n, genMeasureText)
        aliased <- Gen.listOfN(n, Gen.oneOf(true, false))
      } yield ms.distinct.zip(aliased).zipWithIndex.map { case ((m, a), i) =>
        AqlMeasure(if (a) Some(s"m$i") else None, canon(m))
      }
    nPlain <- Gen.choose(if (agg) 0 else 1, 2)
    plainTexts <- Gen.listOfN(nPlain, genPlainDimText)
    plainAliased <- Gen.listOfN(nPlain, Gen.oneOf(true, false))
    plainDims = plainTexts.distinct.zip(plainAliased).zipWithIndex.map {
      case ((t, a), i) =>
        AqlDimension(if (a) Some(s"d$i") else None, Some(canon(t)))
    }
    buckets <-
      if (!agg) Gen.const(Seq.empty[AqlDimension])
      else Gen.oneOf(
        Gen.const(Seq.empty[AqlDimension]),
        genTimeBucket.map(Seq(_)),
        genNumericBucket.map(Seq(_)),
        for { t <- genTimeBucket; nb <- genNumericBucket } yield Seq(t, nb))
    dims = plainDims ++ buckets
    nf <- Gen.choose(0, 2)
    filters <- Gen.listOfN(nf, genFilterText).map(_.distinct.map(canon))
    tz <- genTz
    withTf <- Gen.frequency(3 -> true, 1 -> false)
    // a timezone needs a carrier (the time filter's 4th arg or a time
    // bucket's 3rd) — only generate one when a carrier exists
    tzEff = if (withTf || buckets.exists(_.timeBucketizer.nonEmpty)) tz else None
    timeFilter =
      if (withTf) Some(AqlTimeFilter(Some("ts"),
        Some("1704067200"), Some("1706659200")))
      else None
    now <- Gen.oneOf(None, Some(1706659200L))
    joins <- Gen.frequency(3 -> Gen.const(Nil), 1 -> genJoin.map(Seq(_)))
    sorts <-
      if (dims.exists(_.alias.nonEmpty))
        Gen.oneOf(
          Gen.const(Option.empty[Seq[AqlSortField]]),
          Gen.oneOf(Seq("asc"), Seq("desc"), Seq.empty[String]).map { o =>
            Some(Seq(AqlSortField(dims.flatMap(_.alias).head,
              o.headOption)))
          })
      else Gen.const(Option.empty[Seq[AqlSortField]])
    limit <- Gen.oneOf(None, Some(10), Some(100))
  } yield AqlQuery(
    table = "events",
    joins = Some(joins).filter(_.nonEmpty),
    dimensions = Some(dims).filter(_.nonEmpty),
    measures = measures,
    rowFilters = Some(filters).filter(_.nonEmpty),
    timeFilter = timeFilter,
    timezone = tzEff,
    now = now,
    limit = limit,
    sorts = sorts)

  test("translate(sql(q)) == q over 2000 generated queries") {
    var checked = 0
    forAllN(genQuery, 2000) { (q, i) =>
      // queries with no select item have no SQL form (dimensionless
      // non-agg) — the generator can't produce them, but guard anyway
      val sql = Render.sql(q)
      val back =
        try SqlFront.translate(sql)
        catch {
          case e: Throwable =>
            fail(s"[case $i] translate failed for\n  $sql\n  (${e.getMessage})")
        }
      assert(back == q,
        s"[case $i] round-trip diverged:\n  sql:  $sql\n  back: $back\n  want: $q")
      checked += 1
    }
    assert(checked == 2000)
  }

  test("compiled plans agree on a sampled subset (and the SQL executes)") {
    val catalog = Catalog.testdata(sfDir)
    val compiler = new AqlCompiler(catalog, spark)
    var compiled = 0
    forAllN(genQuery, 400) { (q0, i) =>
      if (i % 16 == 0) {
        // pin `now` so natural-language time resolution can't differ
        // between the two compiles; keep the sample join-free (join
        // validity is the compiler's own spec surface) and single-measure
        // (the compiler enforces the reference's one-measure rule —
        // multi-measure documents round-trip at the AST level only)
        val q = q0.copy(now = Some(1706659200L), joins = None,
          measures = Seq(q0.measures.head),
          // fact tables require a time filter to COMPILE; optionality is
          // an AST-level concern the first property already covers
          timeFilter = q0.timeFilter.orElse(Some(AqlTimeFilter(
            Some("ts"), Some("1704067200"), Some("1706659200")))))
        val direct = compiler.compile(q)
        val viaSql = compiler.compile(SqlFront.translate(Render.sql(q)))
        assert(direct.df.queryExecution.optimizedPlan.canonicalized ==
          viaSql.df.queryExecution.optimizedPlan.canonicalized,
          s"[case $i] plans diverged for ${Render.sql(q)}")
        // and the plan is executable, not just analyzable
        viaSql.df.limit(1).collect()
        compiled += 1
      }
    }
    assert(compiled == 25)
  }
}
