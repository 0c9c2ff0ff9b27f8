package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Collations, GeoFunctions => G}

/** Unit coverage for the pure-Scala geometry kernel (reference `pkg/geo/`
  * semantics) and the collation sort keys — edge cases the synthesized
  * conformance queries (geo1/geo2, fn9) can't hit.
  */
class GeoSpec extends AnyFunSuite {

  private def geom(w: String): G.Geom = G.parseWkt(w).get

  test("wkt parse/serialize round-trips and rejects junk") {
    for (w <- Seq("POINT(1.5 -2)", "LINESTRING(0 0,1 1,2 0)",
        "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))"))
      assert(G.toWkt(geom(w)) == w)
    assert(G.parseWkt("point ( 3  4 )").map(G.toWkt).contains("POINT(3 4)"))
    for (bad <- Seq(null, "", "POINT(1)", "POINT(a b)", "POLYGON((0 0,1 1))",
        "POLYGON((0 0,1 0,1 1,0 5))", "CIRCLE(1 2 3)"))
      assert(G.parseWkt(bad).isEmpty, s"parsed: $bad")
  }

  test("polygon with hole: area, centroid symmetry, containment") {
    val donut = geom("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,3 1,3 3,1 3,1 1))")
    assert(G.area(donut).contains(16.0 - 4.0))
    val c = G.centroid(donut).asInstanceOf[G.GPoint]
    assert(math.abs(c.x - 2.0) < 1e-12 && math.abs(c.y - 2.0) < 1e-12)
    // point inside the hole is NOT contained; point in the solid part is
    assert(G.contains(donut, geom("POINT(2 2)")).contains(false))
    assert(G.contains(donut, geom("POINT(0.5 2)")).contains(true))
    // boundary point: strict-interior contains says false
    assert(G.contains(donut, geom("POINT(0 2)")).contains(false))
  }

  test("distance: point-segment projection, polygon intersection = 0") {
    assert(math.abs(G.distance(geom("POINT(2 2)"), geom("LINESTRING(0 0,4 0)")) - 2.0) < 1e-12)
    assert(math.abs(G.distance(geom("POINT(-3 -4)"), geom("LINESTRING(0 0,4 0)")) - 5.0) < 1e-12)
    assert(G.distance(geom("POLYGON((0 0,2 0,2 2,0 2,0 0))"),
      geom("POLYGON((1 1,3 1,3 3,1 3,1 1))")) == 0.0)
    assert(math.abs(G.distance(geom("LINESTRING(0 0,0 4)"), geom("LINESTRING(3 0,3 4)")) - 3.0) < 1e-12)
  }

  test("intersects/contains across type combinations") {
    val tri = geom("POLYGON((0 0,10 0,0 10,0 0))")
    assert(G.intersects(tri, geom("LINESTRING(-5 5,15 5)")))          // crosses
    assert(G.intersects(tri, geom("POINT(0 0)")))                      // vertex touch
    assert(!G.intersects(tri, geom("POINT(20 20)")))
    assert(G.contains(tri, geom("LINESTRING(1 1,2 2)")).contains(true))
    // chord with endpoints on boundary but body inside: contained
    assert(G.contains(tri, geom("LINESTRING(5 0,0 5)")).contains(true))
    // line lying entirely in the boundary has no interior point: false
    assert(G.contains(tri, geom("LINESTRING(10 0,0 10)")).contains(false))
    // edge escaping outside between two boundary touches: false
    assert(G.contains(tri, geom("LINESTRING(10 0,12 5,0 10)")).contains(false))
    assert(G.contains(tri, geom("POLYGON((1 1,3 1,1 3,1 1))")).contains(true))
    assert(G.contains(tri, geom("POLYGON((8 8,9 8,8 9,8 8))")).contains(false))
    assert(G.within(geom("POINT(1 1)"), tri).contains(true))
  }

  test("sphere distance matches a surveyed city pair within 0.5%") {
    // Paris (2.3522, 48.8566) to NYC (-74.0060, 40.7128): ~5837 km
    val d = G.distanceSphere(G.GPoint(2.3522, 48.8566), G.GPoint(-74.0060, 40.7128)).get
    assert(math.abs(d - 5.837e6) < 0.005 * 5.837e6, s"got $d")
    // out-of-range latitude rejected
    assert(G.distanceSphere(G.GPoint(0, 95), G.GPoint(0, 0)).isEmpty)
    // non-point operands rejected
    assert(G.distanceSphere(geom("LINESTRING(0 0,1 1)"), G.GPoint(0, 0)).isEmpty)
  }

  test("geohash encode/decode: known cell + inverse within cell size") {
    // canonical example: (-5.6, 42.6) -> ezs42 at precision 5
    assert(G.geohashEncode(-5.6, 42.6, 5).contains("ezs42"))
    val p = G.geohashDecode("ezs42").get
    assert(math.abs(p.x - -5.6) < 0.05 && math.abs(p.y - 42.6) < 0.05)
    assert(G.geohashEncode(200, 0, 5).isEmpty)
    assert(G.geohashDecode("not a hash!").isEmpty)
  }

  test("envelope and linestring centroid") {
    assert(G.toWkt(G.envelope(geom("LINESTRING(1 2,5 8,3 4)"))) ==
      "POLYGON((1 2,5 2,5 8,1 8,1 2))")
    assert(G.toWkt(G.envelope(geom("POINT(3 4)"))) == "POINT(3 4)")
    val c = G.centroid(geom("LINESTRING(0 0,4 0)")).asInstanceOf[G.GPoint]
    assert(c.x == 2.0 && c.y == 0.0)
  }

  test("full geo accessor/predicate family is reachable from SQL") {
    val spark = SparkTestSession.spark
    val r = spark.sql(
      """select st_geometrytype('LINESTRING(0 0,1 1,2 2)') gt,
        |       st_srid('POINT(1 2)') srid,
        |       st_isempty('POINT(1 2)') ie,
        |       st_dimension('POLYGON((0 0,1 0,1 1,0 0))') dim,
        |       st_numpoints('LINESTRING(0 0,1 1,2 2)') np,
        |       st_startpoint('LINESTRING(0 0,1 1)') sp,
        |       st_endpoint('LINESTRING(0 0,1 1)') ep,
        |       st_pointn('LINESTRING(0 0,1 1,2 2)', 2) pn,
        |       st_isclosed('LINESTRING(0 0,1 1,0 0)') ic,
        |       st_disjoint('POINT(9 9)', 'POLYGON((0 0,1 0,1 1,0 1,0 0))') dj
        |""".stripMargin).head
    assert(r.getString(0) == "LINESTRING" && r.getInt(1) == 0 && !r.getBoolean(2))
    assert(r.getInt(3) == 2 && r.getInt(4) == 3)
    assert(r.getString(5) == "POINT(0 0)" && r.getString(6) == "POINT(1 1)")
    assert(r.getString(7) == "POINT(1 1)" && r.getBoolean(8) && r.getBoolean(9))
  }

  test("mbr predicates: box algebra over envelopes") {
    val big = geom("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    val small = geom("POLYGON((2 2,4 2,4 4,2 4,2 2))")
    val shifted = geom("POLYGON((5 5,15 5,15 15,5 15,5 5))")
    val adjacent = geom("POLYGON((10 0,20 0,20 10,10 10,10 0))")
    val far = geom("POINT(100 100)")
    assert(G.mbrRelate("contains", big, small))
    assert(!G.mbrRelate("contains", small, big))
    assert(G.mbrRelate("covers", big, small))
    assert(G.mbrRelate("within", small, big))
    assert(G.mbrRelate("coveredby", small, big))
    assert(G.mbrRelate("equals", big, big) && !G.mbrRelate("equals", big, small))
    assert(G.mbrRelate("intersects", big, shifted))
    assert(G.mbrRelate("disjoint", big, far) && !G.mbrRelate("disjoint", big, shifted))
    assert(G.mbrRelate("overlaps", big, shifted))
    assert(!G.mbrRelate("overlaps", big, small))     // containment, not overlap
    assert(G.mbrRelate("touches", big, adjacent))    // shared edge only
    assert(!G.mbrRelate("touches", big, shifted))    // interiors overlap
    // SQL names registered
    val r = SparkTestSession.spark.sql(
      """SELECT mbrcontains('POLYGON((0 0,10 0,10 10,0 10,0 0))', 'POINT(5 5)') c,
        |  mbrdisjoint('POINT(0 0)', 'POINT(9 9)') d""".stripMargin).head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("collation keys: ci equality/order, cs distinction, bin bytes") {
    assert(Collations.strcmp("HELLO", "hello", "utf8mb4_general_ci").contains(0))
    assert(Collations.strcmp("HELLO", "hello", "utf8mb4_0900_as_cs").exists(_ != 0))
    assert(Collations.strcmp("apple", "BANANA", "utf8mb4_general_ci").contains(-1))
    val kA = Collations.keyBytes("Apple", "utf8mb4_general_ci")
    val ka = Collations.keyBytes("aPPLE", "utf8mb4_general_ci")
    assert(java.util.Arrays.equals(kA, ka))
    assert(!java.util.Arrays.equals(
      Collations.keyBytes("a", "utf8mb4_bin"), Collations.keyBytes("A", "utf8mb4_bin")))
    // accent-insensitive under ci (general_ci folds é to e)
    assert(Collations.strcmp("café", "cafe", "utf8mb4_general_ci").contains(0))
  }
}
