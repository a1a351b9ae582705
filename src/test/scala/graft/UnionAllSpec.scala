package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** N-ary union sweep (`Overlay.unionAll` — the dissolve engine) against
  * the binary cascade as ground truth: on exact-arithmetic (integer)
  * inputs the two must produce the IDENTICAL canonical value; on float
  * inputs the result must classify sampled points exactly like the OR of
  * the operand memberships. */
class UnionAllSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Geom =
    Geom(GeomTypes.Polygon, Dims.XY,
      Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0), Array(0, 5))

  private def cascade(gs: Seq[Geom]): Geom =
    gs.reduceLeft(Overlay.union)

  private def w(g: Geom): String = Wkt.write(g)

  test("random integer rect multisets: unionAll == binary cascade, bit for bit") {
    val rnd = new scala.util.Random(20260819)
    for (trial <- 1 to 500) {
      // dense small frames force shared corners/edges, T-junctions,
      // duplicates and deep coincident bundles; sparse frames force
      // multipolygon results
      val dense = trial % 3 != 0
      val span = if (dense) 8 else 24
      val n = 2 + rnd.nextInt(if (dense) 40 else 12)
      val gs = Seq.fill(n) {
        val x0 = rnd.nextInt(span) - span / 2; val y0 = rnd.nextInt(span) - span / 2
        val wdt = 1 + rnd.nextInt(5); val hgt = 1 + rnd.nextInt(5)
        rect(x0, y0, x0 + wdt, y0 + hgt)
      }
      val got = w(Overlay.unionAll(gs))
      val want = w(cascade(gs))
      assert(got == want, s"trial $trial (n=$n): $got != $want")
    }
  }

  test("random right triangles (slope-±1 hypotenuses, T-junctions): unionAll == cascade") {
    // axis-parallel legs + slope-±1 hypotenuses keep every crossing on
    // the exact half-integer grid, so the cascade's intermediate rounding
    // is exact too and bit-equality is a fair oracle — while exercising
    // slanted-edge divisions, slanted coincident overlaps and crossings
    // the rectangle battery cannot produce
    val rnd = new scala.util.Random(555)
    def tri(): Geom = {
      val x0 = rnd.nextInt(10) - 5; val y0 = rnd.nextInt(10) - 5
      val s = 1 + rnd.nextInt(4)
      val o = rnd.nextInt(4) // corner orientation
      val pts = o match {
        case 0 => Array[Double](x0, y0, x0 + s, y0, x0, y0 + s)
        case 1 => Array[Double](x0, y0, x0 + s, y0, x0 + s, y0 + s)
        case 2 => Array[Double](x0, y0, x0 + s, y0 + s, x0, y0 + s)
        case _ => Array[Double](x0 + s, y0, x0 + s, y0 + s, x0, y0 + s)
      }
      // CCW orient via signed area
      val a2 = (pts(2) - pts(0)) * (pts(5) - pts(1)) -
        (pts(4) - pts(0)) * (pts(3) - pts(1))
      val ring =
        if (a2 > 0) Array(pts(0), pts(1), pts(2), pts(3), pts(4), pts(5), pts(0), pts(1))
        else Array(pts(0), pts(1), pts(4), pts(5), pts(2), pts(3), pts(0), pts(1))
      Geom(GeomTypes.Polygon, Dims.XY, ring, Array(0, 4))
    }
    for (trial <- 1 to 250) {
      val n = 2 + rnd.nextInt(8)
      val gs = Seq.fill(n)(tri())
      // valid inputs must never throw: cross-operand coincidence
      // (including exact duplicates and vertex-on-edge pinches — the
      // configuration that crashed the pre-cover-machinery labeling)
      // folds, never errors
      assert(w(Overlay.unionAll(gs)) == w(cascade(gs)), s"trial $trial")
    }
  }

  test("adjacent grid strips (dissolve shape): unionAll == cascade") {
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 80) {
      val n = 2 + rnd.nextInt(30)
      val gs = (0 until n).map { j =>
        val x = (j * 7) % 16; val y = j / 16
        rect(x, y, x + 1, y + 1)
      }
      assert(w(Overlay.unionAll(gs)) == w(cascade(gs)), s"trial $trial n=$n")
    }
  }

  test("duplicates (idempotence) and stacked coincident bundles") {
    val a = rect(0, 0, 3, 3)
    assert(w(Overlay.unionAll(Seq(a, a, a, a))) == w(Overlay.normalizeCopy(a)))
    // three boxes sharing edges pairwise + one duplicate
    val gs = Seq(rect(0, 0, 1, 1), rect(1, 0, 2, 1), rect(0, 0, 1, 1),
      rect(2, 0, 3, 1))
    assert(w(Overlay.unionAll(gs)) ==
      "POLYGON ((0 0, 1 0, 2 0, 3 0, 3 1, 2 1, 1 1, 0 1, 0 0))")
  }

  test("holed operands: hole survives where nothing fills it, fills where covered") {
    val holed = Geom(GeomTypes.Polygon, Dims.XY,
      Array[Double](0, 0, 10, 0, 10, 10, 0, 10, 0, 0,
        3, 3, 3, 7, 7, 7, 7, 3, 3, 3), Array(0, 5, 10))
    // disjoint second operand: hole intact
    val u1 = Overlay.unionAll(Seq(holed, rect(20, 20, 22, 22)))
    assert(w(u1) == w(cascade(Seq(holed, rect(20, 20, 22, 22)))))
    assert(Measure.area(u1) == 100.0 - 16.0 + 4.0)
    // operand covering the hole exactly: union is the solid outer
    val u2 = Overlay.unionAll(Seq(holed, rect(3, 3, 7, 7)))
    assert(w(u2) == w(Overlay.normalizeCopy(rect(0, 0, 10, 10))))
    // partial plug: matches the cascade bit for bit
    val u3gs = Seq(holed, rect(2, 2, 5, 5), rect(6, 4, 8, 9))
    assert(w(Overlay.unionAll(u3gs)) == w(cascade(u3gs)))
  }

  test("multipolygon operands and order invariance on exact inputs") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 60) {
      val n = 2 + rnd.nextInt(6)
      val gs: Seq[Geom] = Seq.fill(n) {
        val x0 = rnd.nextInt(10); val y0 = rnd.nextInt(10)
        if (rnd.nextBoolean()) rect(x0, y0, x0 + 1 + rnd.nextInt(4), y0 + 1 + rnd.nextInt(4))
        else {
          // two-part multipolygon (disjoint by construction)
          val a = rect(x0, y0, x0 + 2, y0 + 2)
          val b = rect(x0 + 20, y0, x0 + 22, y0 + 2)
          Geom(GeomTypes.MultiPolygon, Dims.XY,
            a.coords ++ b.coords, Array(0, 1, 2), Array(0, 5, 10), null, 0)
        }
      }
      val base = w(Overlay.unionAll(gs))
      assert(base == w(cascade(gs)), s"trial $trial vs cascade")
      assert(w(Overlay.unionAll(gs.reverse)) == base, s"trial $trial reversed")
      assert(w(Overlay.unionAll(rnd.shuffle(gs))) == base, s"trial $trial shuffled")
    }
  }

  test("random convex float polygons: sampled point classification is the OR of operands") {
    val rnd = new scala.util.Random(991)
    def convex(cx: Double, cy: Double, r: Double, k: Int): Geom = {
      val angles = Seq.fill(k)(rnd.nextDouble() * 2 * math.Pi).sorted
      val pts = angles.map(a => (cx + r * math.cos(a), cy + r * math.sin(a)))
      val flat = (pts :+ pts.head).flatMap { case (x, y) => Seq(x, y) }.toArray
      Geom(GeomTypes.Polygon, Dims.XY, flat, Array(0, k + 1))
    }
    for (trial <- 1 to 60) {
      val n = 2 + rnd.nextInt(4)
      val gs = Seq.fill(n)(convex(rnd.nextDouble() * 8 - 4,
        rnd.nextDouble() * 8 - 4, 1.0 + rnd.nextDouble() * 3, 5 + rnd.nextInt(4)))
      val u = Overlay.unionAll(gs)
      var checked = 0
      var s = 0
      while (s < 400) {
        val px = rnd.nextDouble() * 16 - 8
        val py = rnd.nextDouble() * 16 - 8
        // skip samples near any boundary (classification there is a
        // representation choice, not a correctness question)
        val nearEdge = gs.exists { g =>
          var minD = Double.MaxValue
          val c = g.coords
          var i = 0
          while (i < c.length / 2 - 1) {
            val ax = c(2 * i); val ay = c(2 * i + 1)
            val bx = c(2 * i + 2); val by = c(2 * i + 3)
            val dx = bx - ax; val dy = by - ay
            val len2 = dx * dx + dy * dy
            val t = math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
            val ddx = px - (ax + dx * t); val ddy = py - (ay + dy * t)
            minD = math.min(minD, ddx * ddx + ddy * ddy)
            i += 1
          }
          minD < 1e-6
        }
        if (!nearEdge) {
          val want = gs.exists(g => Pip.containsPoint(g, px, py))
          val got = Pip.containsPoint(u, px, py)
          assert(got == want, s"trial $trial sample ($px, $py)")
          checked += 1
        }
        s += 1
      }
      assert(checked > 300, s"too few off-boundary samples: $checked")
    }
  }

  test("degenerate inputs: empties, singletons, all-empty") {
    val e = Geom(GeomTypes.Polygon, Dims.XY, Geom.emptyDoubles, Array(0))
    assert(Overlay.unionAll(Seq(e, e)).isEmpty)
    assert(w(Overlay.unionAll(Seq(e, rect(0, 0, 2, 2), e))) ==
      w(Overlay.normalizeCopy(rect(0, 0, 2, 2))))
    assert(w(Overlay.unionAll(Seq(rect(1, 2, 5, 9)))) ==
      w(Overlay.normalizeCopy(rect(1, 2, 5, 9))))
  }
}
