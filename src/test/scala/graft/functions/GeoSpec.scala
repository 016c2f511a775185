package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {
  // (lat, lng) rings
  private val square = Seq(Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)))
  private val squareWithHole = square :+
    Seq((4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0), (4.0, 4.0))
  private val triangle = Seq(Seq((0.0, 0.0), (0.0, 10.0), (10.0, 5.0), (0.0, 0.0)))

  test("point in square") {
    assert(Geo.pointInShape(5.0, 5.0, square))
    assert(!Geo.pointInShape(15.0, 5.0, square))
    assert(!Geo.pointInShape(-1.0, 5.0, square))
    assert(Geo.pointInShape(9.9, 9.9, square))
  }

  test("hole flips containment") {
    assert(Geo.pointInShape(2.0, 2.0, squareWithHole))
    assert(!Geo.pointInShape(5.0, 5.0, squareWithHole)) // inside the hole
    assert(Geo.pointInShape(3.9, 5.0, squareWithHole))
  }

  test("triangle") {
    assert(Geo.pointInShape(5.0, 4.0, triangle))
    assert(!Geo.pointInShape(9.0, 9.0, triangle))
    assert(!Geo.pointInShape(5.0, 10.1, triangle))
  }

  test("polygon crossing the antimeridian is treated planar (as reference)") {
    // reference does planar ray casting on raw lng values; so do we
    val wide = Seq(Seq((-10.0, 170.0), (-10.0, 190.0), (10.0, 190.0), (10.0, 170.0), (-10.0, 170.0)))
    assert(Geo.pointInShape(0.0, 175.0, wide))
    assert(!Geo.pointInShape(0.0, -175.0, wide)) // -175 != 185 in planar terms
  }
}
