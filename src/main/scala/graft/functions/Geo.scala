package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Geo intersection (point-in-polygon), the reference's
  * `geography_intersects(shape, point)` executed as a filter
  * (/root/reference/query/geo_intersects.cu:34-340): even-odd ray casting
  * over a multi-ring shape — inner rings (holes) flip containment.
  *
  * Shapes are `Seq[Seq[(lat, lng)]]` rings; points on an edge may resolve
  * either way (same as the reference), so test fixtures avoid exact-edge
  * points.
  */
object Geo {

  def pointInRing(lat: Double, lng: Double, ring: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var i = 0
    val n = ring.length
    var j = n - 1
    while (i < n) {
      val (yi, xi) = ring(i)
      val (yj, xj) = ring(j)
      if (((yi > lat) != (yj > lat)) &&
          (lng < (xj - xi) * (lat - yi) / (yj - yi) + xi)) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  def pointInShape(lat: Double, lng: Double, shape: Seq[Seq[(Double, Double)]]): Boolean =
    shape.foldLeft(false)((acc, ring) => acc ^ pointInRing(lat, lng, ring))

  /** UDF over (lat, lng, flattened shape as Seq[Seq[Seq[Double]]]) where each
    * point is Seq(lat, lng) — a Spark-SQL-friendly shape literal encoding.
    */
  val pointInPolygon = udf { (lat: Double, lng: Double, shape: Seq[Seq[Seq[Double]]]) =>
    pointInShape(lat, lng, shape.map(_.map(p => (p(0), p(1)))))
  }

  def geographyIntersects(lat: Column, lng: Column, shape: Column): Column =
    pointInPolygon(lat, lng, shape)

  /** All shape ids containing the point, with the (≤ geoShapeLimit) shape
    * set baked into the UDF closure: one evaluation per POINT instead of
    * one per (point × shape) pair, and no per-row shape deserialization —
    * the Spark shape of the reference's shapes-in-device-memory scan
    * (geo_intersects.cu:34-340). Join semantics preserved: a point in k
    * overlapping shapes yields k ids.
    */
  def matchingShapes(shapes: Seq[(String, Seq[Seq[(Double, Double)]])]): (Column, Column) => Column = {
    val baked = shapes.toArray
    val u = udf { (lat: Double, lng: Double) =>
      baked.collect { case (id, shape) if pointInShape(lat, lng, shape) => id }.toSeq
    }
    (lat: Column, lng: Column) => u(lat, lng)
  }
}
