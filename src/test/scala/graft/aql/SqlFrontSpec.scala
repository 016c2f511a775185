package graft.aql

import org.scalatest.funsuite.AnyFunSuite

/** SQL → AQL translation unit tests, mirroring the shapes in
  * /root/reference/query/sql/sql_parser_test.go.
  */
class SqlFrontSpec extends AnyFunSuite {

  test("flagship shape: aggregate + filters + time pseudo-functions") {
    val q = SqlFront.translate(
      """SELECT count(*) AS value FROM trips
        | WHERE status='completed' AND aql_time_filter(request_at, "24 hours ago", "this quarter-hour", America/New_York)
        | GROUP BY aql_time_bucket_hour(request_at, "", America/New_York)""".stripMargin)
    assert(q.table == "trips")
    assert(q.measures == Seq(AqlMeasure(Some("value"), "count(*)")))
    assert(q.filters == Seq("status = 'completed'"))
    assert(q.timeFilter.contains(AqlTimeFilter(
      Some("request_at"), Some("24 hours ago"), Some("this quarter-hour"))))
    assert(q.timezone.contains("America/New_York"))
    val d = q.dimensionList.head
    assert(d.expr == "request_at" && d.timeBucketizer.contains("hour") && d.timeUnit.isEmpty)
  }

  test("mismatched timezone on ANY time bucket raises, not only the first") {
    val e = intercept[ParseException] {
      SqlFront.translate(
        """SELECT count(*) AS value FROM trips
          | WHERE aql_time_filter(request_at, "-1d", "now", America/New_York)
          | GROUP BY status, aql_time_bucket_hour(request_at, "", Asia/Tokyo)""".stripMargin)
    }
    assert(e.getMessage.contains("different timebucket timezone"))
  }

  test("joins with ON conditions and aliases") {
    val q = SqlFront.translate(
      """SELECT c.name, sum(fare) FROM trips
        | JOIN cities c ON trips.city_id = c.id
        | WHERE aql_time_filter(request_at, "-1d", "now", UTC)
        | GROUP BY c.name""".stripMargin)
    assert(q.joinList == Seq(AqlJoin("cities", Some("c"), Seq("trips.city_id = c.id"))))
    assert(q.measures.head.sqlExpression == "sum(fare)")
    assert(q.dimensionList == Seq(AqlDimension(None, Some("c.name"))))
  }

  test("multi-word bucketizer names map underscores to spaces") {
    val q = SqlFront.translate(
      """SELECT count(*) FROM t
        | WHERE aql_time_filter(ts, "-7d", "now", UTC)
        | GROUP BY aql_time_bucket_day_of_week(ts, "", UTC)""".stripMargin)
    assert(q.dimensionList.head.timeBucketizer.contains("day of week"))
  }

  test("numeric bucketizers: width, logbase, manual partitions") {
    val q = SqlFront.translate(
      """SELECT count(*) FROM t GROUP BY
        | aql_numeric_bucket_bucket_width(x, 10),
        | aql_numeric_bucket_logbase(y, 2),
        | aql_numeric_bucket_mannual_partitions(z, "0,50,100")""".stripMargin)
    val nbs = q.dimensionList.flatMap(_.numericBucketizer)
    assert(nbs == Seq(
      AqlNumericBucketizer(bucketWidth = Some(10.0)),
      AqlNumericBucketizer(logBase = Some(2.0)),
      AqlNumericBucketizer(manualPartitions = Some(Seq(0.0, 50.0, 100.0)))))
  }

  test("non-aggregate query: measure 1, select items become dimensions, limit") {
    val q = SqlFront.translate(
      "SELECT event_id, user_id FROM events WHERE value > 10 LIMIT 50")
    assert(q.measures == Seq(AqlMeasure(None, "1")))
    assert(q.dimensionList.map(_.expr) == Seq("event_id", "user_id"))
    assert(q.limit.contains(50))
    assert(q.filters == Seq("value > 10"))
  }

  test("aql_now override and ORDER BY") {
    val q = SqlFront.translate(
      """SELECT max(value) AS m FROM events
        | WHERE aql_time_filter(ts, "-1d", "now", UTC) AND aql_now(ts, 1706659200)
        | GROUP BY event_type ORDER BY m DESC""".stripMargin)
    assert(q.now.contains(1706659200L))
    assert(q.sorts.exists(_ == Seq(AqlSortField("m", Some("desc")))))
  }

  test("OR filters stay intact as one row filter") {
    val q = SqlFront.translate(
      "SELECT event_id FROM events WHERE event_type = 'a' OR event_type = 'b'")
    assert(q.filters == Seq("event_type = 'a' OR event_type = 'b'"))
  }

  test("one WITH level merges into the single AQL query") {
    val q = SqlFront.translate(
      """WITH t AS (SELECT city_id AS c, fare FROM trips WHERE fare > 10)
        | SELECT sum(fare) AS total FROM t
        | WHERE aql_time_filter(request_at, "-1d", "now", UTC)
        | GROUP BY c""".stripMargin)
    assert(q.table == "trips")
    assert(q.filters == Seq("fare > 10"))
    assert(q.timeFilter.nonEmpty)
    assert(q.dimensionList == Seq(AqlDimension(None, Some("c"))))
    // the CTE's aliased select item becomes a supporting definition the
    // compiler inlines: c -> city_id
    assert(q.supportingDimensions.exists(_.contains(
      AqlDimension(Some("c"), Some("city_id")))))
    assert(q.measures.head.sqlExpression == "sum(fare)")
  }

  test("subselect in FROM merges into the single AQL (two query levels)") {
    val q = SqlFront.translate(
      """SELECT count(*) AS value
        | FROM (SELECT status AS st, fare FROM trips WHERE fare > 5) hot
        | WHERE aql_time_filter(request_at, "-1d", "now", UTC)
        | GROUP BY st""".stripMargin)
    assert(q.table == "trips")
    assert(q.filters == Seq("fare > 5"))
    assert(q.timeFilter.nonEmpty)
    assert(q.supportingDimensions.exists(_.exists(d =>
      d.alias.contains("st") && d.expr == "status")))
    assert(q.dimensionList.map(_.expr) == Seq("st"))
  }

  test("three query levels rejected (subselect inside subselect / WITH + subselect)") {
    assert(intercept[ParseException] {
      SqlFront.translate(
        "SELECT count(*) AS value FROM (SELECT a FROM (SELECT a FROM t))")
    }.getMessage.contains("2 query levels"))
    assert(intercept[ParseException] {
      SqlFront.translate(
        """WITH x AS (SELECT a FROM t)
          | SELECT count(*) AS value FROM (SELECT a FROM x)""".stripMargin)
    }.getMessage.contains("2 query levels"))
  }

  test("HAVING rejected with the reference's error") {
    val e = intercept[ParseException] {
      SqlFront.translate(
        "SELECT count(*) AS value FROM trips GROUP BY status HAVING count(*) > 5")
    }
    assert(e.getMessage.contains("having not yet supported"))
  }

  test("nested WITH rejected (one level max)") {
    intercept[ParseException] {
      SqlFront.translate(
        "WITH a AS (WITH b AS (SELECT x FROM t) SELECT x FROM b) SELECT count(*) FROM a")
    }
  }

  test("rendered expressions round-trip through the expression parser") {
    val exprs = Seq(
      "a + b * (c - 1) >= 10",
      "case when x > 0 then 'p' else 'n' end",
      "status in ('a', 'b')",
      "x is not null and not y",
      "floor(request_at, 3600)")
    exprs.foreach { s =>
      val once = ExprParser.parse(s)
      assert(ExprParser.parse(Render(once)) == once, s)
    }
  }
}
