package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level tests for the scanline polygon rasterizer: fill-rule
  * exactness against independent per-pixel predicates, hole subtraction,
  * the no-seam/no-double-light partition property, and multipolygon union
  * (see core/Raster.scala for the semantics under test). */
class RasterSpec extends AnyFunSuite {

  private def boxGeom(a: Double, c: Double, b: Double, d: Double): Geom =
    Geom(GeomTypes.Polygon, Dims.XY,
      Array(a, c, b, c, b, d, a, d, a, c), o0 = Array(0, 5))

  /** Independent per-pixel predicate for a box: the documented half-open
    * pixel-center rule, straight from the projected bounds. */
  private def boxPixels(a: Double, c: Double, b: Double, d: Double,
                        id: Long, size: Int): Set[Int] = {
    val z = Tiles.z(id)
    val x0 = Tiles.x(id).toLong * size
    val y0 = Tiles.y(id).toLong * size
    val ua = Tiles.worldPixelXD(a, z, size); val ub = Tiles.worldPixelXD(b, z, size)
    val vc = Tiles.worldPixelYD(d, z, size); val vd = Tiles.worldPixelYD(c, z, size)
    (for {
      q <- 0 until size
      p <- 0 until size
      cx = x0 + p + 0.5
      cy = y0 + q + 0.5
      if cx >= ua && cx < ub && cy >= vc && cy < vd
    } yield q * size + p).toSet
  }

  test("box fill matches the half-open pixel-center predicate (random sweep)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val z = 1 + rnd.nextInt(4)
      val size = 64
      val a = rnd.nextDouble() * 300 - 150
      val b = a + rnd.nextDouble() * 80 + 0.01
      val c = rnd.nextDouble() * 120 - 60
      val d = c + rnd.nextDouble() * 40 + 0.01
      val g = boxGeom(a, c, b, d)
      for (id <- Tiles.coverGeom(g, z)) {
        val got = Raster.rasterize(g, id, size).toSet
        val want = boxPixels(a, c, b, d, id, size)
        assert(got == want,
          s"box ($a,$c,$b,$d) tile z=${Tiles.z(id)} x=${Tiles.x(id)} y=${Tiles.y(id)}")
      }
    }
  }

  /** Independent even-odd pixel-center test in projected space, using the
    * same crossing expression tree as the rasterizer (anchored at the
    * previous vertex) so float rounding can never diverge. */
  private def insideProjected(rings: Seq[(Array[Double], Array[Double])],
                              cx: Double, cy: Double): Boolean = {
    var inside = false
    for ((xs, ys) <- rings) {
      var j = xs.length - 1
      for (i <- xs.indices) {
        val y1 = ys(j); val y2 = ys(i)
        if ((y1 <= cy && cy < y2) || (y2 <= cy && cy < y1)) {
          val cxr = xs(j) + (cy - y1) * (xs(i) - xs(j)) / (y2 - y1)
          if (cx >= cxr) inside = !inside
        }
        j = i
      }
    }
    inside
  }

  private def projectRing(coords: Array[Double], z: Int, size: Int) = {
    val n = coords.length / 2
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    for (i <- 0 until n) {
      xs(i) = Tiles.worldPixelXD(coords(2 * i), z, size)
      ys(i) = Tiles.worldPixelYD(coords(2 * i + 1), z, size)
    }
    (xs, ys)
  }

  test("triangle fill matches independent even-odd pixel-center test") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val z = 1 + rnd.nextInt(3)
      val size = 64
      val cxDeg = rnd.nextDouble() * 280 - 140
      val cyDeg = rnd.nextDouble() * 110 - 55
      def vert() = (cxDeg + rnd.nextDouble() * 60 - 30,
        cyDeg + rnd.nextDouble() * 30 - 15)
      val (x1, y1) = vert(); val (x2, y2) = vert(); val (x3, y3) = vert()
      val coords = Array(x1, y1, x2, y2, x3, y3, x1, y1)
      val g = Geom(GeomTypes.Polygon, Dims.XY, coords, o0 = Array(0, 4))
      val rings = Seq(projectRing(coords, z, size))
      for (id <- Raster.coverTiles(g, z, size)) {
        val x0 = Tiles.x(id).toLong * size
        val y0 = Tiles.y(id).toLong * size
        val got = Raster.rasterize(g, id, size).toSet
        val want = (for {
          q <- 0 until size
          p <- 0 until size
          if insideProjected(rings, x0 + p + 0.5, y0 + q + 0.5)
        } yield q * size + p).toSet
        assert(got == want, s"triangle tile ${Tiles.x(id)}/${Tiles.y(id)} z=$z")
      }
    }
  }

  test("holes subtract: donut = outer minus hole, hole pixels dark") {
    val z = 2; val size = 128
    val outer = boxGeom(10, 10, 50, 40)
    val donut = Geom(GeomTypes.Polygon, Dims.XY,
      Array[Double](10, 10, 50, 10, 50, 40, 10, 40, 10, 10,
        20, 18, 40, 18, 40, 32, 20, 32, 20, 18),
      o0 = Array(0, 5, 10))
    val hole = boxGeom(20, 18, 40, 32)
    for (id <- Tiles.coverGeom(outer, z)) {
      val o = Raster.rasterize(outer, id, size).toSet
      val h = Raster.rasterize(hole, id, size).toSet
      val d = Raster.rasterize(donut, id, size).toSet
      assert(d == (o -- h), "even-odd hole subtraction")
      assert((d & h).isEmpty)
    }
    // the donut actually has pixels and the hole actually removed some
    val all = Tiles.coverGeom(outer, z)
      .flatMap(id => Raster.rasterize(donut, id, size)).length
    val allOuter = Tiles.coverGeom(outer, z)
      .flatMap(id => Raster.rasterize(outer, id, size)).length
    assert(all > 0 && all < allOuter)
  }

  test("shared edge never double-lights: adjacent boxes partition pixels") {
    val z = 2; val size = 128
    // two boxes sharing the lon=30 edge exactly
    val left = boxGeom(10, 10, 30, 40)
    val right = boxGeom(30, 10, 55, 40)
    val both = boxGeom(10, 10, 55, 40)
    val ids = Tiles.coverGeom(both, z)
    for (id <- ids) {
      val l = Raster.rasterize(left, id, size).toSet
      val r = Raster.rasterize(right, id, size).toSet
      val u = Raster.rasterize(both, id, size).toSet
      assert((l & r).isEmpty, "half-open fill: no double-lit shared edge")
      assert((l ++ r) == u, "half-open fill: no seam either")
    }
  }

  test("multipolygon unions disjoint parts; collection unions parts") {
    val z = 2; val size = 128
    val a = boxGeom(-60, -20, -40, 0)
    val b = boxGeom(20, 10, 45, 30)
    val mp = Geom(GeomTypes.MultiPolygon, Dims.XY,
      Array[Double](-60, -20, -40, -20, -40, 0, -60, 0, -60, -20,
        20, 10, 45, 10, 45, 30, 20, 30, 20, 10),
      o0 = Array(0, 1, 2), o1 = Array(0, 5, 10))
    val gc = Geom(GeomTypes.Collection, Dims.XY, Array.empty,
      parts = Array(a, b))
    val ids = (Tiles.coverGeom(a, z) ++ Tiles.coverGeom(b, z)).distinct
    for (id <- ids) {
      val ua = Raster.rasterize(a, id, size).toSet
      val ub = Raster.rasterize(b, id, size).toSet
      assert(Raster.rasterize(mp, id, size).toSet == (ua ++ ub))
      assert(Raster.rasterize(gc, id, size).toSet == (ua ++ ub))
    }
  }

  test("coverTiles is a superset of every lit tile — incl. the slanted-edge " +
    "tiles the geographic cover prunes (projected/geographic divergence)") {
    // Mercator y is concave in lat: the projected straight hypotenuse of
    // this triangle bulges ~7° of latitude north of the lon/lat-straight
    // one around lon 60, so whole tiles inside the bulge intersect the
    // PROJECTED interior while the geographic cover prunes them.
    val size = 256
    val coords = Array[Double](0, 0, 120, 66, 120, 0, 0, 0)
    val g = Geom(GeomTypes.Polygon, Dims.XY, coords, o0 = Array(0, 4))
    for (z <- 4 to 6) {
      // ground truth: every tile in the projected envelope that lights
      val n = 1 << z
      val ex0 = Tiles.tileX(0.0, z); val ex1 = Tiles.tileX(120.0, z)
      val ey0 = Tiles.tileY(66.0, z); val ey1 = Tiles.tileY(0.0, z)
      val lit = (for {
        xi <- ex0 to math.min(n - 1, ex1)
        yi <- ey0 to math.min(n - 1, ey1)
        id = Tiles.pack(z, xi, yi)
        if Raster.rasterize(g, id, size).nonEmpty
      } yield id).toSet
      val cov = Raster.coverTiles(g, z, size).toSet
      assert(lit.subsetOf(cov),
        s"z=$z: coverTiles missed lit tiles ${(lit -- cov).map(Tiles.x(_))}")
      // the geographic cover genuinely misses some of them (the bug this
      // projected cover exists to fix) — if this ever starts passing,
      // coverGeom changed semantics and the two covers can be unified
      val geo = Tiles.coverGeom(g, z).toSet
      if (z == 6) assert((lit -- geo).nonEmpty,
        "expected the geographic cover to miss projected-interior tiles")
      // and the projected cover is still pruned (not the full envelope)
      val envCount = (math.min(n - 1, ex1) - ex0 + 1).toLong *
        (math.min(n - 1, ey1) - ey0 + 1)
      if (z == 6) assert(cov.size < envCount,
        s"z=$z: projected cover should prune the envelope lattice")
    }
  }

  test("points rasterize to nothing; linestrings stroke") {
    val size = 64
    val pt = Geom.point(10.0, 10.0)
    val ls = Geom(GeomTypes.LineString, Dims.XY, Array[Double](0, 0, 20, 20))
    val id = Tiles.tileId(10.0, 10.0, 2)
    assert(Raster.rasterize(pt, id, size).isEmpty)
    assert(Raster.rasterize(ls, id, size).nonEmpty)
  }

  /** Independent supercover predicate: segment touches the CLOSED pixel
    * box — via the clip test in projected space. */
  private def segTouchesBox(x1: Double, y1: Double, x2: Double, y2: Double,
                            bx0: Double, by0: Double, bx1: Double,
                            by1: Double): Boolean = {
    // Liang–Barsky on the closed box
    var t0 = 0.0; var t1 = 1.0
    val dx = x2 - x1; val dy = y2 - y1
    def clip(p: Double, q: Double): Boolean = {
      if (p == 0.0) q >= 0.0
      else {
        val r = q / p
        if (p < 0) { if (r > t1) return false; if (r > t0) t0 = r }
        else { if (r < t0) return false; if (r < t1) t1 = r }
        true
      }
    }
    clip(-dx, x1 - bx0) && clip(dx, bx1 - x1) &&
      clip(-dy, y1 - by0) && clip(dy, by1 - y1) && t0 <= t1
  }

  test("linestring stroke matches the closed-box supercover predicate") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 300) {
      val z = 1 + rnd.nextInt(3)
      val size = 64
      val cx = rnd.nextDouble() * 280 - 140
      val cy = rnd.nextDouble() * 110 - 55
      val ax = cx + rnd.nextDouble() * 40 - 20
      val ay = cy + rnd.nextDouble() * 20 - 10
      val bx = cx + rnd.nextDouble() * 40 - 20
      val by = cy + rnd.nextDouble() * 20 - 10
      val g = Geom(GeomTypes.LineString, Dims.XY, Array(ax, ay, bx, by))
      val px1 = Tiles.worldPixelXD(ax, z, size)
      val py1 = Tiles.worldPixelYD(ay, z, size)
      val px2 = Tiles.worldPixelXD(bx, z, size)
      val py2 = Tiles.worldPixelYD(by, z, size)
      for (id <- Raster.coverTiles(g, z, size)) {
        val x0 = Tiles.x(id).toLong * size
        val y0 = Tiles.y(id).toLong * size
        val got = Raster.rasterize(g, id, size).toSet
        val want = (for {
          q <- 0 until size
          p <- 0 until size
          if segTouchesBox(px1, py1, px2, py2,
            x0 + p, y0 + q, x0 + p + 1, y0 + q + 1)
        } yield q * size + p).toSet
        assert(got == want,
          s"stroke ($ax,$ay)->($bx,$by) tile ${Tiles.x(id)}/${Tiles.y(id)} z=$z")
      }
    }
  }

  test("coverTiles is a superset of every lit tile for STROKES too " +
    "(random diagonal segments, full envelope-lattice enumeration)") {
    val rnd = new scala.util.Random(31)
    val size = 64
    for (_ <- 0 until 100) {
      val z = 2 + rnd.nextInt(3)
      val ax = rnd.nextDouble() * 280 - 140
      val ay = rnd.nextDouble() * 110 - 55
      val bx = ax + rnd.nextDouble() * 80 - 40
      val by = ay + rnd.nextDouble() * 40 - 20
      val g = Geom(GeomTypes.LineString, Dims.XY, Array(ax, ay, bx, by))
      val n = 1 << z
      val x0 = math.max(0, Tiles.tileX(math.min(ax, bx), z) - 1)
      val x1 = math.min(n - 1, Tiles.tileX(math.max(ax, bx), z) + 1)
      val y0 = math.max(0, Tiles.tileY(math.max(ay, by), z) - 1)
      val y1 = math.min(n - 1, Tiles.tileY(math.min(ay, by), z) + 1)
      val lit = (for {
        xi <- x0 to x1
        yi <- y0 to y1
        id = Tiles.pack(z, xi, yi)
        if Raster.rasterize(g, id, size).nonEmpty
      } yield id).toSet
      val cov = Raster.coverTiles(g, z, size).toSet
      assert(lit.nonEmpty, "fixture stroke must light something")
      assert(lit.subsetOf(cov),
        s"stroke ($ax,$ay)->($bx,$by) z=$z: cover missed ${lit -- cov}")
    }
  }

  test("thick strokes match the capsule distance predicate; cover superset holds") {
    val rnd = new scala.util.Random(41)
    val size = 64
    for (trial <- 0 until 120) {
      val z = 2 + rnd.nextInt(3)
      val ax = rnd.nextDouble() * 280 - 140
      val ay = rnd.nextDouble() * 110 - 55
      val bx = ax + rnd.nextDouble() * 60 - 30
      val by = ay + rnd.nextDouble() * 30 - 15
      val width = 0.5 + rnd.nextDouble() * 7.0 // pixels
      val r = width / 2.0
      val g = Geom(GeomTypes.LineString, Dims.XY, Array(ax, ay, bx, by))
      val x1 = Tiles.worldPixelXD(ax, z, size)
      val y1 = Tiles.worldPixelYD(ay, z, size)
      val x2 = Tiles.worldPixelXD(bx, z, size)
      val y2 = Tiles.worldPixelYD(by, z, size)
      val ddx = x2 - x1; val ddy = y2 - y1
      val len2 = ddx * ddx + ddy * ddy
      def inCapsule(cx: Double, cy: Double): Boolean = {
        val tRaw = if (len2 == 0.0) 0.0
          else ((cx - x1) * ddx + (cy - y1) * ddy) / len2
        val t = math.max(0.0, math.min(1.0, tRaw))
        val dx = cx - (x1 + t * ddx); val dy = cy - (y1 + t * ddy)
        dx * dx + dy * dy <= r * r
      }
      val cov = Raster.coverTiles(g, z, size, padPx = r)
      // per covered tile: exact per-pixel match against the predicate
      for (id <- cov) {
        val tx0 = Tiles.x(id).toLong * size
        val ty0 = Tiles.y(id).toLong * size
        val got = Raster.rasterize(g, id, size, width).toSet
        val want = (for {
          q <- 0 until size
          p <- 0 until size
          if inCapsule(tx0 + p + 0.5, ty0 + q + 0.5)
        } yield q * size + p).toSet
        assert(got == want, s"trial $trial width=$width tile " +
          s"${Tiles.x(id)}/${Tiles.y(id)} z=$z")
      }
      // superset: every lit tile of the envelope lattice is covered
      if (trial % 10 == 0) {
        val n = 1 << z
        val ex0 = math.max(0, Tiles.tileX(math.min(ax, bx), z) - 1)
        val ex1 = math.min(n - 1, Tiles.tileX(math.max(ax, bx), z) + 1)
        val ey0 = math.max(0, Tiles.tileY(math.max(ay, by), z) - 1)
        val ey1 = math.min(n - 1, Tiles.tileY(math.min(ay, by), z) + 1)
        val lit = (for {
          xi <- ex0 to ex1; yi <- ey0 to ey1
          id = Tiles.pack(z, xi, yi)
          if Raster.rasterize(g, id, size, width).nonEmpty
        } yield id).toSet
        assert(lit.subsetOf(cov.toSet),
          s"trial $trial: padded cover missed ${lit -- cov.toSet}")
      }
    }
  }

  test("multilinestring strokes union; stroke pixels are connected per tile") {
    val z = 2; val size = 128
    val a = Geom(GeomTypes.LineString, Dims.XY, Array[Double](-50, -20, 10, 25))
    val b = Geom(GeomTypes.LineString, Dims.XY, Array[Double](-30, 30, 40, -10))
    val mls = Geom(GeomTypes.MultiLineString, Dims.XY,
      Array[Double](-50, -20, 10, 25, -30, 30, 40, -10), o0 = Array(0, 2, 4))
    val ids = (Raster.coverTiles(a, z, size) ++ Raster.coverTiles(b, z, size)).distinct
    for (id <- ids) {
      val ua = Raster.rasterize(a, id, size).toSet
      val ub = Raster.rasterize(b, id, size).toSet
      assert(Raster.rasterize(mls, id, size).toSet == (ua ++ ub))
    }
  }

  test("rasterize output is sorted, in-range, duplicate-free") {
    val g = boxGeom(-10.3, -5.7, 25.9, 18.2)
    for (id <- Tiles.coverGeom(g, 3)) {
      val px = Raster.rasterize(g, id, 256)
      assert(px.toSeq == px.toSeq.sorted)
      assert(px.distinct.length == px.length)
      assert(px.forall(p => p >= 0 && p < 256 * 256))
    }
  }
}
