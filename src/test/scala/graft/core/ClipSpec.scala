package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** st_segmentize / st_clipbybox2d kernels (q125/q126). */
class ClipSpec extends AnyFunSuite {

  private def g(wkt: String): Geom = Wkt.parse(wkt)
  private def w(geom: Geom): String = Wkt.write(geom)

  // ---- segmentize ----------------------------------------------------

  test("segmentize: no segment exceeds maxLen, original vertices survive") {
    val rnd = new scala.util.Random(125)
    for (_ <- 1 to 100) {
      val n = 2 + rnd.nextInt(5)
      val pts = Seq.fill(n)((rnd.nextDouble() * 100 - 50, rnd.nextDouble() * 100 - 50))
      val wkt = pts.map { case (x, y) => s"$x $y" }.mkString("LINESTRING (", ", ", ")")
      val maxLen = 0.5 + rnd.nextDouble() * 20
      val out = Clip.segmentize(g(wkt), maxLen)
      val c = out.coords
      var i = 0
      while (i < c.length / 2 - 1) {
        val dx = c(2 * i + 2) - c(2 * i); val dy = c(2 * i + 3) - c(2 * i + 1)
        assert(math.sqrt(dx * dx + dy * dy) <= maxLen * (1 + 1e-12),
          s"segment $i too long in ${w(out)}")
        i += 1
      }
      // original vertices appear in order (bit-exact — inserted points
      // never replace them)
      val outPts = c.grouped(2).map(a => (a(0), a(1))).toSeq
      assert(pts.forall(outPts.contains), "an input vertex vanished")
    }
  }

  test("segmentize: short segments untouched, Z lerps, polygons densify rings") {
    assert(w(Clip.segmentize(g("LINESTRING (0 0, 1 0)"), 5.0)) ==
      "LINESTRING (0 0, 1 0)")
    // 10-long segment at maxLen 2.5 -> 4 subsegments, exact quarters
    assert(w(Clip.segmentize(g("LINESTRING (0 0, 10 0)"), 2.5)) ==
      "LINESTRING (0 0, 2.5 0, 5 0, 7.5 0, 10 0)")
    // Z rides the lerp
    assert(w(Clip.segmentize(g("LINESTRING Z (0 0 0, 10 0 4)"), 5.0)) ==
      "LINESTRING Z (0 0 0, 5 0 2, 10 0 4)")
    val poly = Clip.segmentize(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"), 5.0)
    assert(w(poly) ==
      "POLYGON ((0 0, 5 0, 10 0, 10 5, 10 10, 5 10, 0 10, 0 5, 0 0))")
    // EMPTY passes through; explosion guard fires with a clear message
    assert(Clip.segmentize(g("LINESTRING EMPTY"), 1.0).isEmpty)
    val e = intercept[IllegalArgumentException] {
      Clip.segmentize(g("LINESTRING (0 0, 1e9 0)"), 1e-9)
    }
    assert(e.getMessage.contains("vertices"))
  }

  // ---- clipByBox -----------------------------------------------------

  test("clip: points and multipoints filter on the closed box") {
    assert(w(Clip.clipByBox(g("POINT (5 5)"), 0, 0, 10, 10)) == "POINT (5 5)")
    assert(Clip.clipByBox(g("POINT (15 5)"), 0, 0, 10, 10).isEmpty)
    assert(w(Clip.clipByBox(g("MULTIPOINT (1 1, 11 1, 0 0, 10 10)"), 0, 0, 10, 10)) ==
      "MULTIPOINT (1 1, 0 0, 10 10)")
  }

  test("clip: lines cross, stitch, and split into multi pieces") {
    // straight crossing: clipped to the chord
    assert(w(Clip.clipByBox(g("LINESTRING (-5 5, 15 5)"), 0, 0, 10, 10)) ==
      "LINESTRING (0 5, 10 5)")
    // fully inside: verbatim (single piece stays LINESTRING)
    assert(w(Clip.clipByBox(g("LINESTRING (1 1, 9 9)"), 0, 0, 10, 10)) ==
      "LINESTRING (1 1, 9 9)")
    // zig-zag leaving and re-entering: two pieces -> MULTILINESTRING
    val zig = Clip.clipByBox(g("LINESTRING (1 1, 1 15, 9 15, 9 1)"), 0, 0, 10, 10)
    assert(zig.geomType == GeomTypes.MultiLineString && zig.o0.length - 1 == 2,
      s"expected 2 pieces: ${w(zig)}")
    // interior vertices stitch into ONE piece
    assert(w(Clip.clipByBox(g("LINESTRING (-5 1, 5 1, 5 9, 15 9)"), 0, 0, 10, 10)) ==
      "LINESTRING (0 1, 5 1, 5 9, 10 9)")
    // disjoint -> EMPTY
    assert(Clip.clipByBox(g("LINESTRING (20 20, 30 30)"), 0, 0, 10, 10).isEmpty)
    // corner graze (zero-length piece) drops
    assert(Clip.clipByBox(g("LINESTRING (-5 5, 5 -5)"), 0, 0, 10, 10).isEmpty)
    // duplicate consecutive vertices: the zero-length segment is skipped
    // WITHOUT splitting the stitched piece or duplicating the vertex
    assert(w(Clip.clipByBox(g("LINESTRING (5 5, 5 5, 9 9)"), 0, 0, 10, 10)) ==
      "LINESTRING (5 5, 9 9)")
    // a standalone zero-length line clips to EMPTY, inside the box or not
    assert(Clip.clipByBox(g("LINESTRING (5 5, 5 5)"), 0, 0, 10, 10).isEmpty)
  }

  test("clip: axis-aligned polygons clip to exact GREATEST/LEAST corners") {
    val got = Clip.clipByBox(
      g("POLYGON ((2 2, 20 2, 20 8, 2 8, 2 2))"), 5, 0, 12, 6)
    assert(got.geomType == GeomTypes.Polygon)
    val xs = got.coords.grouped(2).map(_(0)).toSet
    val ys = got.coords.grouped(2).map(_(1)).toSet
    assert(xs == Set(5.0, 12.0) && ys == Set(2.0, 6.0), w(got))
    // polygon fully inside -> verbatim; box fully inside polygon -> the box
    assert(w(Clip.clipByBox(g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"), 0, 0, 10, 10)) ==
      "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    val boxed = Clip.clipByBox(g("POLYGON ((-100 -100, 100 -100, 100 100, -100 100, -100 -100))"), 0, 0, 10, 10)
    assert(Measure.area(boxed) == 100.0, w(boxed))
    // disjoint -> POLYGON EMPTY
    assert(Clip.clipByBox(g("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"), 0, 0, 10, 10).isEmpty)
    // hole survives where it overlaps the box
    val holed = Clip.clipByBox(
      g("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (4 4, 8 4, 8 8, 4 8, 4 4))"),
      0, 0, 10, 10)
    assert(holed.o0.length - 1 == 2 && Measure.area(holed) == 100.0 - 16.0, w(holed))
  }

  test("clip: random polygons — PIP(original)∧in-box == PIP(clipped) on samples") {
    val rnd = new scala.util.Random(126)
    var checked = 0
    for (_ <- 1 to 60) {
      // random star-shaped (possibly concave) polygon around a center
      val n = 3 + rnd.nextInt(6)
      val cx = rnd.nextDouble() * 20 - 10; val cy = rnd.nextDouble() * 20 - 10
      val pts = (0 until n).map { i =>
        val a = 2 * math.Pi * i / n
        val r = 2 + rnd.nextDouble() * 10
        (cx + r * math.cos(a), cy + r * math.sin(a))
      }
      val ring = (pts :+ pts.head).map { case (x, y) => s"$x $y" }
        .mkString("POLYGON ((", ", ", "))")
      val (bx1, by1) = (rnd.nextDouble() * 16 - 12, rnd.nextDouble() * 16 - 12)
      val (bx2, by2) = (bx1 + 2 + rnd.nextDouble() * 12, by1 + 2 + rnd.nextDouble() * 12)
      val orig = g(ring)
      val clip = Clip.clipByBox(orig, bx1, by1, bx2, by2)
      for (_ <- 1 to 80) {
        val px = rnd.nextDouble() * 30 - 15; val py = rnd.nextDouble() * 30 - 15
        // skip samples near any boundary: containment flips are legit there
        val nearBox = math.abs(px - bx1).min(math.abs(px - bx2)) < 1e-6 ||
          math.abs(py - by1).min(math.abs(py - by2)) < 1e-6
        if (!nearBox) {
          val expect = Pip.containsPoint(orig, px, py) &&
            px >= bx1 && px <= bx2 && py >= by1 && py <= by2
          val got = !clip.isEmpty && Pip.containsPoint(clip, px, py)
          assert(got == expect,
            s"PIP mismatch at ($px,$py): $ring clip ($bx1 $by1, $bx2 $by2) -> ${w(clip)}")
          checked += 1
        }
      }
    }
    assert(checked > 3000)
  }

  test("clip: multipolygon drops empty members, collection recurses") {
    val mp = Clip.clipByBox(
      g("MULTIPOLYGON (((1 1, 4 1, 4 4, 1 4, 1 1)), ((20 20, 24 20, 24 24, 20 24, 20 20)))"),
      0, 0, 10, 10)
    assert(mp.geomType == GeomTypes.MultiPolygon && mp.o0.length - 1 == 1)
    assert(Measure.area(mp) == 9.0, w(mp))
    val gc = Clip.clipByBox(
      g("GEOMETRYCOLLECTION (POINT (5 5), POINT (50 5), LINESTRING (-5 5, 15 5))"),
      0, 0, 10, 10)
    assert(w(gc) == "GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 5, 10 5))")
  }
}
