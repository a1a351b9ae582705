package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Martinez–Rueda boolean overlay: closed-form rectangle fixtures, hole
  * creation, multipolygon operands, random-rect area identities, and
  * point-classification sampling on random convex polygons (the overlay
  * result must classify every off-boundary point exactly like the boolean
  * combination of the input memberships). */
class OverlaySpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Geom =
    Geom(GeomTypes.Polygon, Dims.XY,
      Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0), Array(0, 5))

  private def wkt(g: Geom): String = Wkt.write(g)

  // ------------------------------------------------------------------
  // closed-form rectangle cases
  // ------------------------------------------------------------------

  test("proper overlap: intersection is the exact clipped rect, canonical") {
    val a = rect(0, 0, 10, 10)
    val b = rect(4, -2, 14, 6)
    val i = Overlay.intersection(a, b)
    assert(wkt(i) == "POLYGON ((4 0, 10 0, 10 6, 4 6, 4 0))")
    assert(Measure.area(i) == 36.0)
    assert(Measure.area(Overlay.union(a, b)) == 100.0 + 80.0 - 36.0)
    assert(Measure.area(Overlay.difference(a, b)) == 100.0 - 36.0)
    assert(Measure.area(Overlay.symDifference(a, b)) == 100.0 + 80.0 - 72.0)
  }

  test("disjoint: empty intersection, two-part union, identity difference") {
    val a = rect(0, 0, 2, 2)
    val b = rect(5, 5, 7, 8)
    assert(Overlay.intersection(a, b).isEmpty)
    val u = Overlay.union(a, b)
    assert(u.geomType == GeomTypes.MultiPolygon)
    assert(Measure.area(u) == 4.0 + 6.0)
    assert(wkt(Overlay.difference(a, b)) == wkt(Overlay.normalizeCopy(a)))
    assert(wkt(Overlay.symDifference(a, b)) == wkt(u))
  }

  test("containment: difference punches a hole; union is the outer") {
    val a = rect(0, 0, 10, 10)
    val b = rect(3, 4, 6, 7)
    val d = Overlay.difference(a, b)
    assert(wkt(d) ==
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 4, 3 7, 6 7, 6 4, 3 4))")
    assert(Measure.area(d) == 100.0 - 9.0)
    assert(wkt(Overlay.union(a, b)) == wkt(Overlay.normalizeCopy(a)))
    assert(wkt(Overlay.intersection(a, b)) == wkt(Overlay.normalizeCopy(b)))
    assert(Measure.area(Overlay.symDifference(a, b)) == 91.0)
  }

  test("identical inputs: idempotent union/intersection, empty diff/xor") {
    val a = rect(1, 2, 5, 9)
    assert(wkt(Overlay.union(a, a)) == wkt(Overlay.normalizeCopy(a)))
    assert(wkt(Overlay.intersection(a, a)) == wkt(Overlay.normalizeCopy(a)))
    assert(Overlay.difference(a, a).isEmpty)
    assert(Overlay.symDifference(a, a).isEmpty)
  }

  test("shared full edge: union merges, intersection collapses to empty") {
    val a = rect(0, 0, 1, 1)
    val b = rect(1, 0, 2, 1)
    assert(Overlay.intersection(a, b).isEmpty)
    val u = Overlay.union(a, b)
    assert(Measure.area(u) == 2.0)
    assert(u.geomType == GeomTypes.Polygon)
    val d = Overlay.difference(a, b)
    assert(Measure.area(d) == 1.0)
  }

  test("corner touch: point contact does not merge area") {
    val a = rect(0, 0, 1, 1)
    val b = rect(1, 1, 2, 2)
    assert(Overlay.intersection(a, b).isEmpty)
    assert(Measure.area(Overlay.union(a, b)) == 2.0)
  }

  test("empty operands follow PostGIS shortcuts") {
    val a = rect(0, 0, 2, 2)
    val e = Geom(GeomTypes.Polygon, Dims.XY, Geom.emptyDoubles, Array(0))
    assert(Overlay.intersection(a, e).isEmpty)
    assert(Overlay.intersection(e, a).isEmpty)
    assert(wkt(Overlay.union(a, e)) == wkt(Overlay.normalizeCopy(a)))
    assert(wkt(Overlay.union(e, a)) == wkt(Overlay.normalizeCopy(a)))
    assert(wkt(Overlay.difference(a, e)) == wkt(Overlay.normalizeCopy(a)))
    assert(Overlay.difference(e, a).isEmpty)
    assert(wkt(Overlay.symDifference(e, a)) == wkt(Overlay.normalizeCopy(a)))
  }

  test("two C-shapes close into a ring: union has a hole") {
    // U-shape opening up + cap that closes it
    val u = Geom(GeomTypes.Polygon, Dims.XY, Array[Double](
      0, 0, 10, 0, 10, 10, 7, 10, 7, 3, 3, 3, 3, 10, 0, 10, 0, 0), Array(0, 9))
    val cap = rect(0, 8, 10, 12)
    val un = Overlay.union(u, cap)
    assert(un.geomType == GeomTypes.Polygon)
    assert(un.o0.length - 1 == 2, s"expected shell+hole, got ${wkt(un)}")
    // hole is the enclosed rectangle x in [3,7], y in [3,8]
    assert(Measure.area(un) ==
      (Measure.area(u) + Measure.area(cap)
        - Measure.area(Overlay.intersection(u, cap))))
    // the void is NOT part of the union
    assert(!Pip.containsPoint(un, 5.0, 5.0))
    assert(Pip.containsPoint(un, 5.0, 1.0))
    assert(Pip.containsPoint(un, 5.0, 9.0))
  }

  test("multipolygon operand: op applies across parts") {
    val a = Geom(GeomTypes.MultiPolygon, Dims.XY, Array[Double](
      0, 0, 2, 0, 2, 2, 0, 2, 0, 0,
      10, 0, 12, 0, 12, 2, 10, 2, 10, 0),
      Array(0, 1, 2), Array(0, 5, 10))
    val b = rect(1, 1, 11, 3)
    val i = Overlay.intersection(a, b)
    assert(Measure.area(i) == 1.0 + 1.0)
    assert(i.geomType == GeomTypes.MultiPolygon)
    val d = Overlay.difference(a, b)
    assert(Measure.area(d) == 8.0 - 2.0)
    assert(Measure.area(Overlay.union(a, b)) == 4.0 + 4.0 + 20.0 - 2.0)
  }

  test("input polygon with hole participates correctly") {
    val withHole = Geom(GeomTypes.Polygon, Dims.XY, Array[Double](
      0, 0, 10, 0, 10, 10, 0, 10, 0, 0,
      4, 4, 4, 6, 6, 6, 6, 4, 4, 4), Array(0, 5, 10))
    val b = rect(3, 3, 7, 7)
    val i = Overlay.intersection(withHole, b)
    assert(Measure.area(i) == 16.0 - 4.0) // hole area removed
    assert(Pip.containsPoint(i, 3.5, 3.5))
    assert(!Pip.containsPoint(i, 5.0, 5.0))
    val u = Overlay.union(withHole, b)
    assert(Measure.area(u) == (100.0 - 4.0) + 4.0) // b fills the hole
    assert(Pip.containsPoint(u, 5.0, 5.0))
  }

  // ------------------------------------------------------------------
  // randomized properties
  // ------------------------------------------------------------------

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("random integer rects: all four areas match closed form exactly") {
    var s = 42L
    def next(n: Int): Int = { s = splitmix(s); ((s >>> 8) % n).toInt }
    for (trial <- 0 until 300) {
      val ax0 = next(50); val ay0 = next(50)
      val ax1 = ax0 + 1 + next(30); val ay1 = ay0 + 1 + next(30)
      val bx0 = next(50); val by0 = next(50)
      val bx1 = bx0 + 1 + next(30); val by1 = by0 + 1 + next(30)
      val a = rect(ax0, ay0, ax1, ay1)
      val b = rect(bx0, by0, bx1, by1)
      val aa = (ax1 - ax0).toDouble * (ay1 - ay0)
      val ab = (bx1 - bx0).toDouble * (by1 - by0)
      val w = math.max(0, math.min(ax1, bx1) - math.max(ax0, bx0))
      val h = math.max(0, math.min(ay1, by1) - math.max(ay0, by0))
      val ai = w.toDouble * h
      assert(Measure.area(Overlay.intersection(a, b)) == ai, s"trial $trial ∩")
      assert(Measure.area(Overlay.union(a, b)) == aa + ab - ai, s"trial $trial ∪")
      assert(Measure.area(Overlay.difference(a, b)) == aa - ai, s"trial $trial −")
      assert(Measure.area(Overlay.symDifference(a, b)) == aa + ab - 2 * ai,
        s"trial $trial ⊕")
    }
  }

  test("random convex polygons: sampled point classification matches") {
    var s = 7L
    def nextD(): Double = { s = splitmix(s); (s >>> 11).toDouble / (1L << 53).toDouble }
    def convex(cx: Double, cy: Double, r: Double, n: Int): Geom = {
      // jittered-uniform angles: max gap < π, so the radial polygon is
      // guaranteed simple (a free-angle generator can put a > π gap
      // before the closing edge, which makes it SELF-intersect)
      val angles = Array.tabulate(n)(i => 2 * math.Pi * (i + 0.8 * nextD()) / n)
      val pts = new Array[Double]((n + 1) * 2)
      for (i <- 0 until n) {
        pts(i * 2) = cx + r * (0.5 + 0.5 * nextD()) * math.cos(angles(i))
        pts(i * 2 + 1) = cy + r * (0.5 + 0.5 * nextD()) * math.sin(angles(i))
      }
      pts(n * 2) = pts(0); pts(n * 2 + 1) = pts(1)
      Geom(GeomTypes.Polygon, Dims.XY, pts, Array(0, n + 1))
    }
    def minEdgeDist(g: Geom, x: Double, y: Double): Double = {
      var best = Double.MaxValue
      var r = 0
      while (r < g.o0.length - 1) {
        var i = g.o0(r)
        while (i < g.o0(r + 1) - 1) {
          val ax = g.coords(i * 2); val ay = g.coords(i * 2 + 1)
          val bx = g.coords((i + 1) * 2); val by = g.coords((i + 1) * 2 + 1)
          val dx = bx - ax; val dy = by - ay
          val len2 = dx * dx + dy * dy
          val t = if (len2 == 0) 0.0
            else math.max(0.0, math.min(1.0, ((x - ax) * dx + (y - ay) * dy) / len2))
          val ddx = x - (ax + t * dx); val ddy = y - (ay + t * dy)
          best = math.min(best, math.sqrt(ddx * ddx + ddy * ddy))
          i += 1
        }
        r += 1
      }
      best
    }
    for (trial <- 0 until 40) {
      val a = convex(nextD() * 10, nextD() * 10, 3 + nextD() * 5, 5 + (trial % 5))
      val b = convex(nextD() * 10, nextD() * 10, 3 + nextD() * 5, 5 + (trial % 4))
      val ops = Seq(
        Overlay.intersection(a, b) -> ((x: Boolean, y: Boolean) => x && y),
        Overlay.union(a, b) -> ((x: Boolean, y: Boolean) => x || y),
        Overlay.difference(a, b) -> ((x: Boolean, y: Boolean) => x && !y),
        Overlay.symDifference(a, b) -> ((x: Boolean, y: Boolean) => x != y))
      // area identity
      val aI = Measure.area(ops(0)._1); val aU = Measure.area(ops(1)._1)
      val aA = Measure.area(a); val aB = Measure.area(b)
      assert(math.abs(aI + aU - aA - aB) <= 1e-9 * (aA + aB),
        s"trial $trial area identity")
      // sampled classification (off-boundary points only)
      for (_ <- 0 until 120) {
        val x = nextD() * 24 - 2; val y = nextD() * 24 - 2
        val eps = 1e-7
        val boundary = Seq(a, b).exists(g => minEdgeDist(g, x, y) < eps) ||
          ops.exists { case (g, _) => !g.isEmpty && minEdgeDist(g, x, y) < eps }
        if (!boundary) {
          val inA = Pip.containsPoint(a, x, y)
          val inB = Pip.containsPoint(b, x, y)
          ops.zipWithIndex.foreach { case ((g, f), oi) =>
            assert(Pip.containsPoint(g, x, y) == f(inA, inB),
              s"trial $trial op $oi point ($x,$y) inA=$inA inB=$inB")
          }
        }
      }
    }
  }

  test("result is a pure function of the input value (operand ring rotation)") {
    val a1 = rect(0, 0, 10, 10)
    // same rect, ring rotated to a different start vertex
    val a2 = Geom(GeomTypes.Polygon, Dims.XY,
      Array[Double](10, 0, 10, 10, 0, 10, 0, 0, 10, 0), Array(0, 5))
    val b = rect(4, -2, 14, 6)
    assert(wkt(Overlay.intersection(a1, b)) == wkt(Overlay.intersection(a2, b)))
    assert(wkt(Overlay.union(a1, b)) == wkt(Overlay.union(a2, b)))
    assert(wkt(Overlay.difference(a1, b)) == wkt(Overlay.difference(a2, b)))
  }

  // ------------------------------------------------------------------
  // line/point × polygon clip
  // ------------------------------------------------------------------

  test("line clip: crossing segment splits at the exact boundary") {
    val poly = rect(0, 0, 10, 10)
    val line = Geom(GeomTypes.LineString, Dims.XY,
      Array[Double](-5, 5, 15, 5))
    val in = Overlay.intersection(line, poly)
    assert(wkt(in) == "LINESTRING (0 5, 10 5)")
    val out = Overlay.difference(line, poly)
    assert(out.geomType == GeomTypes.MultiLineString)
    assert(wkt(out) == "MULTILINESTRING ((-5 5, 0 5), (10 5, 15 5))")
  }

  test("line clip: polygon-with-hole cuts the middle piece out") {
    val withHole = Geom(GeomTypes.Polygon, Dims.XY, Array[Double](
      0, 0, 10, 0, 10, 10, 0, 10, 0, 0,
      4, 4, 4, 6, 6, 6, 6, 4, 4, 4), Array(0, 5, 10))
    val line = Geom(GeomTypes.LineString, Dims.XY, Array[Double](-2, 5, 12, 5))
    val in = Overlay.intersection(line, withHole)
    assert(wkt(in) == "MULTILINESTRING ((0 5, 4 5), (6 5, 10 5))")
  }

  test("point clip keeps boundary points (closed semantics)") {
    val poly = rect(0, 0, 4, 4)
    val pts = Geom(GeomTypes.MultiPoint, Dims.XY,
      Array[Double](2, 2, 0, 2, 9, 9, -1, -1))
    val in = Overlay.intersection(pts, poly)
    assert(wkt(in) == "MULTIPOINT (2 2, 0 2)")
    val out = Overlay.difference(pts, poly)
    assert(wkt(out) == "MULTIPOINT (9 9, -1 -1)")
  }

  test("diagonal line through a corner") {
    val poly = rect(0, 0, 10, 10)
    val line = Geom(GeomTypes.LineString, Dims.XY, Array[Double](-5, -5, 15, 15))
    val in = Overlay.intersection(line, poly)
    assert(wkt(in) == "LINESTRING (0 0, 10 10)")
  }

  test("non-XY and unsupported combinations are rejected") {
    val a3d = Geom(GeomTypes.Polygon, Dims.XYZ,
      Array[Double](0, 0, 1, 4, 0, 1, 4, 4, 1, 0, 4, 1, 0, 0, 1), Array(0, 5))
    intercept[IllegalArgumentException](Overlay.union(a3d, a3d))
    val pt = Geom.point(1, 1)
    intercept[IllegalArgumentException](
      Overlay.union(pt, rect(0, 0, 2, 2)))
  }
}
