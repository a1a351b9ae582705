package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Core geometry kernel tests: the FIXTURES.md §1 corpus (mirroring
  * `/root/reference/tests/testthat/test-handle.R:93-134` round-trips) plus
  * double-printing parity cases. */
class CoreGeomSpec extends AnyFunSuite {

  // WKT corpus per FIXTURES.md §1; writer-normal form (flat multipoint).
  val corpus: Seq[String] = Seq(
    "POINT (30 10)",
    "POINT Z (30 10 40)",
    "POINT M (30 10 300)",
    "POINT ZM (30 10 40 300)",
    "POINT EMPTY",
    "LINESTRING (30 10, 10 30, 40 40)",
    "LINESTRING Z (30 10 1, 10 30 2, 40 40 3)",
    "LINESTRING M (30 10 1, 10 30 2, 40 40 3)",
    "LINESTRING ZM (30 10 1 2, 10 30 3 4, 40 40 5 6)",
    "LINESTRING EMPTY",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
    "POLYGON Z ((30 10 1, 40 40 2, 20 40 3, 10 20 4, 30 10 1))",
    "POLYGON ZM ((30 10 1 9, 40 40 2 8, 20 40 3 7, 10 20 4 6, 30 10 1 9))",
    "POLYGON EMPTY",
    "MULTIPOINT (10 40, 40 30, 20 20, 30 10)",
    "MULTIPOINT Z (10 40 1, 40 30 2)",
    "MULTIPOINT EMPTY",
    "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
    "MULTILINESTRING Z ((10 10 1, 20 20 2, 10 40 3))",
    "MULTILINESTRING EMPTY",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))",
    "MULTIPOLYGON Z (((30 20 1, 45 40 2, 10 40 3, 30 20 1)))",
    "MULTIPOLYGON EMPTY",
    "GEOMETRYCOLLECTION (POINT (40 10), LINESTRING (10 10, 20 20, 10 40))",
    "GEOMETRYCOLLECTION EMPTY",
    "POINT (0.222222 1.333333)",
    "POINT (-30.5 -10.25)"
  )

  test("WKT -> geom -> WKT identity over the corpus") {
    corpus.foreach { wkt =>
      val g = Wkt.parse(wkt)
      assert(Wkt.write(g) == wkt, s"roundtrip of '$wkt'")
    }
  }

  test("verbose multipoint parses; writer emits flat form") {
    val g = Wkt.parse("MULTIPOINT ((10 40), (40 30))")
    assert(Wkt.write(g) == "MULTIPOINT (10 40, 40 30)")
    assert(g == Wkt.parse("MULTIPOINT (10 40, 40 30)"))
  }

  test("WKT -> WKB -> geom -> WKB byte identity") {
    corpus.filterNot(_.startsWith("POINT EMPTY")).foreach { wkt =>
      val g = Wkt.parse(wkt)
      val b1 = Wkb.write(g)
      val g2 = Wkb.parse(b1)
      val b2 = Wkb.write(g2)
      assert(java.util.Arrays.equals(b1, b2), s"WKB roundtrip of '$wkt'")
    }
  }

  test("WKB roundtrip preserves structure (non-empty, non-point-empty)") {
    corpus.filterNot(w => w.contains("EMPTY")).foreach { wkt =>
      val g = Wkt.parse(wkt)
      val g2 = Wkb.parse(Wkb.write(g))
      assert(Wkt.write(g2) == wkt, s"via WKB: '$wkt'")
    }
  }

  test("POINT EMPTY writes as NaN WKB coords") {
    val b = Wkb.write(Wkt.parse("POINT EMPTY"))
    assert(b.length == 21)
    val g = Wkb.parse(b)
    assert(g.geomType == GeomTypes.Point && g.coords.forall(_.isNaN))
  }

  test("EWKB flags accepted, SRID recorded") {
    // EWKB: little endian, POINT with Z|SRID flags, srid=4326
    val buf = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(0x80000000 | 0x20000000 | 1).putInt(4326)
      .putDouble(1.0).putDouble(2.0).putDouble(3.0)
    val g = Wkb.parse(buf.array())
    assert(g.geomType == GeomTypes.Point && g.dims == Dims.XYZ && g.srid == 4326)
    assert(Wkt.write(g) == "POINT Z (1 2 3)")
  }

  test("big-endian WKB accepted") {
    val buf = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(0.toByte).putInt(1).putDouble(30.0).putDouble(10.0)
    assert(Wkt.write(Wkb.parse(buf.array())) == "POINT (30 10)")
  }

  test("double printing matches reference ryu fixed-precision semantics") {
    assert(DoubleFormat.print(0.0) == "0")
    assert(DoubleFormat.print(-0.0) == "0")
    assert(DoubleFormat.print(30.0) == "30")
    assert(DoubleFormat.print(-30.5) == "-30.5")
    assert(DoubleFormat.print(0.222222) == "0.222222")
    assert(DoubleFormat.print(0.1) == "0.1")
    assert(DoubleFormat.print(1.0 / 3.0) == "0.3333333333333333")
    assert(DoubleFormat.print(2.0 / 3.0) == "0.6666666666666666")
    assert(DoubleFormat.print(Double.NaN) == "nan")
    assert(DoubleFormat.print(Double.PositiveInfinity) == "Infinity")
    assert(DoubleFormat.print(Double.NegativeInfinity) == "-Infinity")
    // precision clamp + half-even on decimal digits
    assert(DoubleFormat.print(0.0001, 3) == "0")
    assert(DoubleFormat.print(1.2345, 3) == "1.234") // 1.2345 shortest=1.2345, half-even -> 1.234
    assert(DoubleFormat.print(1.5, 0) == "2")
    assert(DoubleFormat.print(2.5, 0) == "2")
    // > 1e17 -> scientific, ignoring precision
    assert(DoubleFormat.print(1e18) == "1e+18")
    assert(DoubleFormat.print(1.5e20) == "1.5e+20")
    assert(DoubleFormat.print(-2e300) == "-2e+300")
    assert(DoubleFormat.print(1e17) == "100000000000000000")
    // big but <= 1e17 integral
    assert(DoubleFormat.print(9007199254740992.0) == "9007199254740992")
  }

  test("dim casts NaN-fill and positional z/m mapping") {
    val xy = Wkt.parse("POINT (1 2)")
    val xyz = Geom.castDims(xy, Dims.XYZ)
    assert(Wkt.write(xyz) == "POINT Z (1 2 nan)")
    val xyzm = Geom.castDims(Wkt.parse("POINT M (1 2 7)"), Dims.XYZM)
    assert(Wkt.write(xyzm) == "POINT ZM (1 2 nan 7)")
    val down = Geom.castDims(Wkt.parse("POINT ZM (1 2 3 4)"), Dims.XYM)
    assert(Wkt.write(down) == "POINT M (1 2 4)")
  }

  test("removeRepeated collapses runs, preserves closure/offsets/dims") {
    def rr(wkt: String): String = Wkt.write(Geom.removeRepeated(Wkt.parse(wkt)))
    assert(rr("LINESTRING (0 0, 0 0, 1 1, 1 1, 1 1, 2 2)") ==
      "LINESTRING (0 0, 1 1, 2 2)")
    // endpoint repeat collapses into the run (PostGIS tolerance-0 parity)
    assert(rr("LINESTRING (0 0, 1 1, 1 1)") == "LINESTRING (0 0, 1 1)")
    assert(rr("MULTIPOINT (1 1, 1 1, 2 2)") == "MULTIPOINT (1 1, 2 2)")
    // ring stays closed; hole offsets remap
    assert(rr("POLYGON ((0 0, 4 0, 4 0, 4 4, 0 4, 0 0, 0 0), (1 1, 1 1, 2 1, 2 2, 1 1))") ==
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 1))")
    // multipolygon: ring-count offsets unchanged, coord offsets remap
    assert(rr("MULTIPOLYGON (((0 0, 1 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 6 6, 5 5)))") ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
    // Z differs -> NOT repeated (every ordinate participates)
    assert(rr("LINESTRING Z (0 0 1, 0 0 2, 1 1 3)") ==
      "LINESTRING Z (0 0 1, 0 0 2, 1 1 3)")
    // collection recurses; points and empties pass through
    assert(rr("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 0 0, 3 3))") ==
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 3))")
    assert(rr("LINESTRING EMPTY") == "LINESTRING EMPTY")
    assert(rr("POINT (7 7)") == "POINT (7 7)")
    // pathological all-identical ring collapses to one vertex (documented)
    assert(rr("POLYGON ((2 2, 2 2, 2 2, 2 2))") == "POLYGON ((2 2))")
    // NaN never equals NaN: NaN-filled vertices survive
    val nan = Geom(GeomTypes.LineString, Dims.XY,
      Array(Double.NaN, Double.NaN, Double.NaN, Double.NaN, 1.0, 1.0))
    assert(Geom.removeRepeated(nan).numCoords == 3)
    // no-op input returns the same instance (no copy)
    val clean = Wkt.parse("LINESTRING (0 0, 1 1, 2 2)")
    assert(Geom.removeRepeated(clean) eq clean)
  }

  test("type promotion casts") {
    val p = Wkt.parse("POINT (1 2)")
    assert(Wkt.write(Geom.castType(p, GeomTypes.MultiPoint)) == "MULTIPOINT (1 2)")
    val mp1 = Wkt.parse("MULTIPOINT (1 2)")
    assert(Wkt.write(Geom.castType(mp1, GeomTypes.Point)) == "POINT (1 2)")
    val ls = Wkt.parse("LINESTRING (1 2, 3 4)")
    assert(Wkt.write(Geom.castType(ls, GeomTypes.MultiLineString)) ==
      "MULTILINESTRING ((1 2, 3 4))")
    val pg = Wkt.parse("POLYGON ((0 0, 1 0, 1 1, 0 0))")
    assert(Wkt.write(Geom.castType(pg, GeomTypes.MultiPolygon)) ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    val mpg = Wkt.parse("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    assert(Wkt.write(Geom.castType(mpg, GeomTypes.Polygon)) ==
      "POLYGON ((0 0, 1 0, 1 1, 0 0))")
    intercept[IllegalArgumentException] {
      Geom.castType(Wkt.parse("MULTIPOINT (1 2, 3 4)"), GeomTypes.Point)
    }
    intercept[IllegalArgumentException] {
      Geom.castType(p, GeomTypes.Polygon)
    }
  }

  test("snap to grid uses half-away rounding") {
    val g = Geom.snapToGrid(Wkt.parse("POINT (1.234 -5.675)"), 100)
    assert(Wkt.write(g) == "POINT (1.23 -5.68)")
    val h = Geom.snapToGrid(Wkt.parse("POINT (0.005 -0.005)"), 100)
    assert(Wkt.write(h) == "POINT (0.01 -0.01)")
  }

  test("envelope") {
    val e = Geom.envelope(Wkt.parse(
      "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))"))
    assert(e.toSeq == Seq(10.0, 10.0, 40.0, 40.0))
  }

  test("iso type ids") {
    assert(Geom.isoTypeId(Wkt.parse("POINT (1 2)")) == 1)
    assert(Geom.isoTypeId(Wkt.parse("POINT Z (1 2 3)")) == 1001)
    assert(Geom.isoTypeId(Wkt.parse("POINT M (1 2 3)")) == 2001)
    assert(Geom.isoTypeId(Wkt.parse("LINESTRING ZM (1 2 3 4, 5 6 7 8)")) == 3002)
  }

  test("parse errors") {
    intercept[IllegalArgumentException](Wkt.parse("POINT (1)"))
    intercept[IllegalArgumentException](Wkt.parse("FOO (1 2)"))
    intercept[IllegalArgumentException](Wkt.parse("POINT (1 2"))
    intercept[IllegalArgumentException](Wkt.parse("POINT (1 2) x"))
  }

  test("nan/inf ordinates parse like strtod") {
    val g = Wkt.parse("POINT (nan inf)")
    assert(g.coords(0).isNaN && g.coords(1).isPosInfinity)
    assert(Wkt.write(g) == "POINT (nan Infinity)")
  }

  test("convex hull: monotone chain, deterministic ring, degenerate cases") {
    // rect corners + strict-interior points -> the rect, CCW from lex min
    val mp = Wkt.parse(
      "MULTIPOINT (10 0, 0 10, 3 3, 0 0, 10 10, 7 2, 2 7)")
    val hull = Hull.convexHull(mp)
    assert(Wkt.write(hull) == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(Measure.area(hull) == 100.0 && Measure.perimeter(hull) == 40.0)
    // collinear boundary points dropped
    assert(Wkt.write(Hull.convexHull(Wkt.parse(
      "MULTIPOINT (0 0, 5 0, 10 0, 10 10, 0 10)"))) ==
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    // all collinear -> LINESTRING of the extremes
    assert(Wkt.write(Hull.convexHull(Wkt.parse(
      "MULTIPOINT (1 1, 3 3, 2 2, 5 5)"))) == "LINESTRING (1 1, 5 5)")
    // single point, empty, duplicates
    assert(Wkt.write(Hull.convexHull(Wkt.parse("MULTIPOINT (4 5, 4 5)"))) ==
      "POINT (4 5)")
    assert(Wkt.write(Hull.convexHull(Wkt.parse("MULTIPOINT EMPTY"))) ==
      "POLYGON EMPTY")
    // any geometry kind: hull of a polygon's vertices
    assert(Measure.area(Hull.convexHull(Wkt.parse(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"))) == 100.0)
  }

  test("st_distance: gaps, intersections, containment, degenerate") {
    def d(a: String, b: String) = Measure.distance(Wkt.parse(a), Wkt.parse(b))
    val rectA = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    // horizontal gap
    assert(d(rectA, "POLYGON ((5 0, 7 0, 7 2, 5 2, 5 0))") == 3.0)
    // corner-to-corner 3-4-5
    assert(d(rectA, "POLYGON ((5 6, 7 6, 7 8, 5 8, 5 6))") == 5.0)
    // crossing edges, no vertex containment -> 0
    assert(d("POLYGON ((0 2, 10 2, 10 4, 0 4, 0 2))",
      "POLYGON ((4 0, 6 0, 6 6, 4 6, 4 0))") == 0.0)
    // point inside polygon -> 0; crossing lines -> 0
    assert(d(rectA, "POINT (1 1)") == 0.0)
    assert(d("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)") == 0.0)
    // point to segment (perpendicular foot inside)
    assert(d("POINT (0 0)", "LINESTRING (3 4, 3 -4)") == 3.0)
    // point to point
    assert(d("POINT (0 0)", "POINT (3 4)") == 5.0)
    // EMPTY -> NaN (including collections whose parts are all EMPTY)
    assert(d(rectA, "POINT EMPTY").isNaN)
    assert(d(rectA, "GEOMETRYCOLLECTION (POINT EMPTY)").isNaN)
    // collections participate in containment
    assert(d("GEOMETRYCOLLECTION (POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)))",
      "POINT (5 5)") == 0.0)
    assert(Measure.intersects(
      Wkt.parse("GEOMETRYCOLLECTION (POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)))"),
      Wkt.parse("POINT (5 5)")))
    // symmetric
    assert(d("POINT (9 2)", rectA) == d(rectA, "POINT (9 2)"))
    // intersects: overlap, touch (shared edge), containment, disjoint
    def ix(a: String, b: String) = Measure.intersects(Wkt.parse(a), Wkt.parse(b))
    assert(ix(rectA, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"))
    assert(ix(rectA, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")) // edge touch
    assert(ix(rectA, "POINT (1 1)") && !ix(rectA, "POINT (9 9)"))
    assert(ix("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", rectA)) // contains
    assert(!ix(rectA, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"))
    assert(!ix(rectA, "POINT EMPTY"))
  }

  test("st_hausdorff: discrete vertex-sampled symmetric Hausdorff") {
    def h(a: String, b: String) = Measure.hausdorff(Wkt.parse(a), Wkt.parse(b))
    // identical geometry -> 0 (every vertex has a zero-distance partner)
    assert(h("LINESTRING (0 0, 3 4, 10 0)", "LINESTRING (0 0, 3 4, 10 0)") == 0.0)
    // classic asymmetric case: directed h(A,B) differs from h(B,A); the
    // symmetric measure takes the max. A = {(0,0)}, B = {(3,4), (6,8)}:
    // h(A,B) = 5, h(B,A) = 10 -> 10
    assert(h("POINT (0 0)", "MULTIPOINT (3 4, 6 8)") == 10.0)
    assert(h("MULTIPOINT (3 4, 6 8)", "POINT (0 0)") == 10.0) // symmetric
    // vertex-sampled: segment interiors do NOT participate — the midpoint
    // vertex of B is 1 away from A's nearest VERTEX (not 0 from its edge)
    assert(h("LINESTRING (0 0, 2 0)", "LINESTRING (0 0, 1 1, 2 0)") ==
      math.sqrt(2.0))
    // collections flatten
    assert(h("GEOMETRYCOLLECTION (POINT (0 0), POINT (6 8))",
      "MULTIPOINT (0 0, 6 8)") == 0.0)
    // EMPTY -> NaN (either side, incl. collection of EMPTY parts)
    assert(h("POINT EMPTY", "POINT (1 1)").isNaN)
    assert(h("POINT (1 1)", "GEOMETRYCOLLECTION (POINT EMPTY)").isNaN)
    // brute-force parity on seeded random multipoints (squared-space
    // max/min + one sqrt == per-pair sqrt + max/min, bit-for-bit)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val pa = Seq.fill(rnd.nextInt(12) + 1)(
        (rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10))
      val pb = Seq.fill(rnd.nextInt(12) + 1)(
        (rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10))
      def wkt(ps: Seq[(Double, Double)]) =
        ps.map { case (x, y) => s"$x $y" }.mkString("MULTIPOINT (", ", ", ")")
      def directed(u: Seq[(Double, Double)], v: Seq[(Double, Double)]) =
        u.map { case (ux, uy) =>
          v.map { case (vx, vy) =>
            math.sqrt((ux - vx) * (ux - vx) + (uy - vy) * (uy - vy)) }.min
        }.max
      val want = math.max(directed(pa, pb), directed(pb, pa))
      assert(h(wkt(pa), wkt(pb)) == want)
    }
  }

  test("convex hull properties over seeded random point sets") {
    def cross(ox: Double, oy: Double, ax: Double, ay: Double,
              bx: Double, by: Double): Double =
      (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
    for (trial <- 0 until 50) {
      val n = 3 + (trial % 20)
      val pts = (0 until n).map { i =>
        val h = graft.sql.GeoOps.splitmix64(trial * 1000L + i)
        ((h % 1000L).toDouble / 10.0, ((h >> 20) % 1000L).toDouble / 10.0)
      }
      val wkt = pts.map { case (x, y) => s"$x $y" }.mkString("MULTIPOINT (", ", ", ")")
      val hull = Hull.convexHull(Wkt.parse(wkt))
      if (hull.geomType == GeomTypes.Polygon) {
        val ring = (0 until hull.numCoords - 1).map(i =>
          (hull.coords(2 * i), hull.coords(2 * i + 1)))
        // hull vertices are input points
        assert(ring.forall(pts.contains), s"trial $trial")
        // strictly convex (CCW, no collinear triples)
        val m = ring.length
        assert((0 until m).forall { i =>
          cross(ring(i)._1, ring(i)._2, ring((i + 1) % m)._1, ring((i + 1) % m)._2,
            ring((i + 2) % m)._1, ring((i + 2) % m)._2) > 0
        }, s"trial $trial not strictly convex: $ring")
        // every input point is inside or on the hull (left of every edge)
        assert(pts.forall { case (px, py) =>
          (0 until m).forall { i =>
            cross(ring(i)._1, ring(i)._2, ring((i + 1) % m)._1,
              ring((i + 1) % m)._2, px, py) >= 0
          }
        }, s"trial $trial point outside hull")
      }
    }
  }

  test("simplify: Douglas-Peucker keep/drop, rings stay valid") {
    // mid deviation 4 > eps 2 -> kept; deviation 1 <= 2 -> dropped
    assert(Wkt.write(Simplify.simplify(
      Wkt.parse("LINESTRING (0 0, 3 4, 6 0)"), 2.0)) ==
      "LINESTRING (0 0, 3 4, 6 0)")
    assert(Wkt.write(Simplify.simplify(
      Wkt.parse("LINESTRING (0 0, 3 1, 6 0)"), 2.0)) == "LINESTRING (0 0, 6 0)")
    // recursive split: both big bends survive, small wiggle between goes
    assert(Wkt.write(Simplify.simplify(Wkt.parse(
      "LINESTRING (0 0, 10 10, 20 9, 30 10, 40 0)"), 3.0)) ==
      "LINESTRING (0 0, 10 10, 30 10, 40 0)")
    // polygon ring: wiggly edge flattens, ring stays closed
    assert(Wkt.write(Simplify.simplify(Wkt.parse(
      "POLYGON ((0 0, 5 1, 10 0, 10 10, 0 10, 0 0))"), 2.0)) ==
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    // a ring that would collapse below 4 points is kept unsimplified
    assert(Wkt.write(Simplify.simplify(Wkt.parse(
      "POLYGON ((0 0, 10 1, 20 0, 0 0))"), 5.0)) ==
      "POLYGON ((0 0, 10 1, 20 0, 0 0))")
    // multilinestring simplifies per part
    assert(Wkt.write(Simplify.simplify(Wkt.parse(
      "MULTILINESTRING ((0 0, 3 1, 6 0), (0 0, 3 4, 6 0))"), 2.0)) ==
      "MULTILINESTRING ((0 0, 6 0), (0 0, 3 4, 6 0))")
  }

  test("planar measures: area/perimeter/length/centroid") {
    val sq = Wkt.parse("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(Measure.area(sq) == 100.0)
    assert(Measure.perimeter(sq) == 40.0)
    assert(Measure.length(sq) == 0.0)
    assert(Measure.centroid(sq) == ((5.0, 5.0)))
    // hole subtracts area, adds perimeter, shifts nothing (symmetric)
    val holed = Wkt.parse(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(Measure.area(holed) == 96.0)
    assert(Measure.perimeter(holed) == 48.0)
    assert(Measure.centroid(holed) == ((5.0, 5.0)))
    // winding-agnostic: CW shell, CCW hole — same values
    val cw = Wkt.parse(
      "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))")
    assert(Measure.area(cw) == 96.0)
    assert(Measure.centroid(cw) == ((5.0, 5.0)))
    // multipolygon sums; asymmetric parts move the centroid
    val mp = Wkt.parse(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 0, 14 0, 14 4, 10 4, 10 0)))")
    assert(Measure.area(mp) == 4.0 + 16.0)
    assert(Measure.perimeter(mp) == 8.0 + 16.0)
    val (cx, cy) = Measure.centroid(mp)
    assert(cx == (1.0 * 4 + 12.0 * 16) / 20 && cy == (1.0 * 4 + 2.0 * 16) / 20)
    // linestring arc length; 3-4-5 exact
    val ls = Wkt.parse("LINESTRING (0 0, 3 4, 3 0)")
    assert(Measure.length(ls) == 9.0)
    assert(Measure.area(ls) == 0.0)
    // degenerate/EMPTY
    assert(Measure.area(Wkt.parse("POLYGON EMPTY")) == 0.0)
    val (ex, ey) = Measure.centroid(Wkt.parse("POINT EMPTY"))
    assert(ex.isNaN && ey.isNaN)
    assert(Measure.centroid(Wkt.parse("POINT (3 4)")) == ((3.0, 4.0)))
  }
}
