package graft.aql

import org.json4s._
import org.json4s.jackson.JsonMethods

/** AQL query JSON model, mirroring the reference's wire format
  * (/root/reference/query/common/aql.go:95-158) field for field so that any
  * AQL document accepted by the reference parses here unchanged.
  */
final case class AqlDimension(
    alias: Option[String] = None,
    sqlExpression: Option[String] = None,
    timeBucketizer: Option[String] = None,
    timeUnit: Option[String] = None,
    numericBucketizer: Option[AqlNumericBucketizer] = None) {
  def isTimeDimension: Boolean = timeBucketizer.nonEmpty || timeUnit.nonEmpty
  def expr: String = sqlExpression.getOrElse("")
}

/** Numeric bucketizer (ref aql.go:27-46): exactly one of bucketWidth
  * (equal-width), logBase (exponential), manualPartitions (explicit bounds).
  */
final case class AqlNumericBucketizer(
    bucketWidth: Option[Double] = None,
    logBase: Option[Double] = None,
    manualPartitions: Option[Seq[Double]] = None)

final case class AqlMeasure(
    alias: Option[String] = None,
    sqlExpression: String,
    rowFilters: Option[Seq[String]] = None) {
  def filters: Seq[String] = rowFilters.getOrElse(Nil)
}

final case class AqlJoin(
    table: String,
    alias: Option[String] = None,
    conditions: Seq[String] = Nil) {
  def aliasOrTable: String = alias.filter(_.nonEmpty).getOrElse(table)
}

final case class AqlTimeFilter(
    column: Option[String] = None,
    from: Option[String] = None,
    to: Option[String] = None)

final case class AqlSortField(name: String, order: Option[String] = None)

final case class AqlQuery(
    table: String,
    joins: Option[Seq[AqlJoin]] = None,
    dimensions: Option[Seq[AqlDimension]] = None,
    measures: Seq[AqlMeasure] = Nil,
    rowFilters: Option[Seq[String]] = None,
    timeFilter: Option[AqlTimeFilter] = None,
    supportingDimensions: Option[Seq[AqlDimension]] = None,
    supportingMeasures: Option[Seq[AqlMeasure]] = None,
    timezone: Option[String] = None,
    now: Option[Long] = None,
    limit: Option[Int] = None,
    sorts: Option[Seq[AqlSortField]] = None,
    sql: Option[String] = None) {
  def joinList: Seq[AqlJoin] = joins.getOrElse(Nil)
  def dimensionList: Seq[AqlDimension] = dimensions.getOrElse(Nil)
  def filters: Seq[String] = rowFilters.getOrElse(Nil)
  /** Supporting dims/measures are not grouped/reported themselves but may
    * be referenced by alias from other expressions (ref aql.go:120-126).
    */
  def supportingDefs: Seq[(String, String)] =
    supportingDimensions.getOrElse(Nil).flatMap(d => d.alias.map(_ -> d.expr)) ++
      supportingMeasures.getOrElse(Nil).flatMap(m => m.alias.map(_ -> m.sqlExpression))
}

final case class AqlRequest(queries: Seq[AqlQuery])

object AqlJson {
  private implicit val formats: Formats = DefaultFormats

  def parseRequest(json: String): AqlRequest =
    JsonMethods.parse(json).extract[AqlRequest]

  def parseQuery(json: String): AqlQuery =
    JsonMethods.parse(json).extract[AqlQuery]
}
