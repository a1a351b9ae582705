package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.util.Random

/** Property tests for the cell/tile index (deterministic seed=42). The cell
  * index needs self-consistency, not parity with any external library
  * (SURVEY.md §7 "Hard parts"). */
class CellSpec extends AnyFunSuite {

  private def randLonLat(r: Random): (Double, Double) =
    (r.nextDouble() * 360 - 180, r.nextDouble() * 170 - 85)

  test("fromFaceIj / toFaceIj roundtrip") {
    val r = new Random(42)
    (1 to 2000).foreach { _ =>
      val face = r.nextInt(6)
      val i = r.nextInt(Cells.MaxSize)
      val j = r.nextInt(Cells.MaxSize)
      val id = Cells.fromFaceIj(face, i, j)
      assert(Cells.isValid(id))
      assert(Cells.level(id) == 30)
      assert(Cells.toFaceIj(id) == ((face, i, j)))
    }
  }

  test("parent contains child; level arithmetic") {
    val r = new Random(42)
    (1 to 1000).foreach { _ =>
      val (lon, lat) = randLonLat(r)
      val leaf = Cells.leafFromLonLat(lon, lat)
      (0 to 29).foreach { lvl =>
        val p = Cells.parent(leaf, lvl)
        assert(Cells.level(p) == lvl)
        assert(Cells.contains(p, leaf))
        val kids = Cells.children(p)
        assert(kids.count(k => Cells.contains(k, leaf)) == 1)
        kids.foreach(k => assert(Cells.contains(p, k)))
      }
    }
  }

  test("cell id is stable under center roundtrip") {
    val r = new Random(42)
    (1 to 500).foreach { _ =>
      val (lon, lat) = randLonLat(r)
      val id = Cells.cellId(lon, lat, 12)
      val (clon, clat) = Cells.centerLonLat(id)
      assert(Cells.cellId(clon, clat, 12) == id,
        s"center of cell at ($lon,$lat) maps back to same cell")
    }
  }

  test("edge neighbors are symmetric and distinct") {
    val r = new Random(42)
    (1 to 300).foreach { _ =>
      val (lon, lat) = randLonLat(r)
      val lvl = 1 + r.nextInt(15)
      val id = Cells.cellId(lon, lat, lvl)
      val nbrs = Cells.edgeNeighbors(id)
      assert(nbrs.length == 4)
      nbrs.foreach { n =>
        assert(Cells.isValid(n) && Cells.level(n) == lvl && n != id)
        assert(Cells.edgeNeighbors(n).contains(id),
          s"neighbor symmetry at level $lvl for ($lon,$lat)")
      }
    }
  }

  test("ring union grows and contains the center") {
    val id = Cells.cellId(5.0, 45.0, 10)
    val r0 = Cells.ringUnion(id, 0)
    val r1 = Cells.ringUnion(id, 1)
    val r2 = Cells.ringUnion(id, 2)
    assert(r0.toSeq == Seq(id))
    assert(r1.length > 1 && r2.length > r1.length)
    assert(r1.toSet.subsetOf(r2.toSet))
  }

  test("coverBox covers every point of the box") {
    val r = new Random(42)
    (1 to 100).foreach { _ =>
      val (lon, lat) = randLonLat(r)
      val w = r.nextDouble() * 10 + 0.1
      val h = r.nextDouble() * 10 + 0.1
      val (minLon, minLat) = (math.max(-180, lon - w), math.max(-85, lat - h))
      val (maxLon, maxLat) = (math.min(180, lon + w), math.min(85, lat + h))
      val lvl = 4 + r.nextInt(5)
      val cover = Cells.coverBox(minLon, minLat, maxLon, maxLat, lvl).toSet
      assert(cover.nonEmpty)
      // sample interior points; each must fall in a covered cell
      (1 to 50).foreach { _ =>
        val px = minLon + r.nextDouble() * (maxLon - minLon)
        val py = minLat + r.nextDouble() * (maxLat - minLat)
        val cell = Cells.cellId(px, py, lvl)
        assert(cover.contains(cell),
          s"point ($px,$py) in box [($minLon,$minLat),($maxLon,$maxLat)] " +
            s"level $lvl not covered")
      }
    }
  }

  test("capCover contains every cell holding a point within the radius") {
    // random caps at every scale (including continental radii at coarse
    // levels, the regime where lattice-ring stepping breaks across
    // cube-face corners — the q84 sf0.1 regression): sample points inside
    // the cap by (bearing, distance) destination formula and require the
    // cover to contain each sample's cell
    val rnd = new scala.util.Random(71)
    val R = Measure.EarthRadiusMeters
    def dest(lon: Double, lat: Double, bearingRad: Double, distM: Double) = {
      val d = distM / R
      val p1 = math.toRadians(lat); val l1 = math.toRadians(lon)
      val p2 = math.asin(math.sin(p1) * math.cos(d) +
        math.cos(p1) * math.sin(d) * math.cos(bearingRad))
      val l2 = l1 + math.atan2(
        math.sin(bearingRad) * math.sin(d) * math.cos(p1),
        math.cos(d) - math.sin(p1) * math.sin(p2))
      val lonOut = math.toDegrees(l2)
      (((lonOut + 540.0) % 360.0) - 180.0, math.toDegrees(p2))
    }
    for (_ <- 0 until 60) {
      val qlon = rnd.nextDouble() * 360 - 180
      val qlat = rnd.nextDouble() * 178 - 89
      val level = rnd.nextInt(10) // coarse to medium
      val radius = (0.3 + 3.0 * rnd.nextDouble()) *
        Cells.minEdgeMetersLowerBound(level)
      val cover = Cells.capCover(qlon, qlat, radius, level).toSet
      for (_ <- 0 until 25) {
        val (plon, plat) = dest(qlon, qlat,
          rnd.nextDouble() * 2 * math.Pi, rnd.nextDouble() * radius)
        val cell = Cells.cellId(plon, plat, level)
        assert(cover.contains(cell),
          s"cap ($qlon,$qlat,r=$radius,L=$level) missing cell of ($plon,$plat)")
      }
    }
    // the exact q84 miss: continental radius at level 1, pair straddling
    // a cube-face corner region across the antimeridian
    val cover24 = Cells.capCover(163.0499999, -43.4500001, 2000000.0, 1).toSet
    assert(cover24.contains(Cells.cellId(-177.8364, -54.1018, 1)))
    val cover21 = Cells.capCover(121.0499999, -6.4500001, 2000000.0, 1).toSet
    assert(cover21.contains(Cells.cellId(136.3286, 2.7755, 1)))
    // whole-sphere cap terminates with all cells at the level
    assert(Cells.capCover(0, 0, math.Pi * R + 1, 2).length == 6 * 16)
  }

  test("tile ids roundtrip and cover exactly") {
    val r = new Random(42)
    (1 to 1000).foreach { _ =>
      val (lon, lat) = randLonLat(r)
      val z = r.nextInt(16)
      val id = Tiles.tileId(lon, lat, z)
      assert(Tiles.z(id) == z)
      val (minLon, minLat, maxLon, maxLat) = Tiles.tileEnvelope(id)
      assert(lon >= minLon - 1e-9 && lon <= maxLon + 1e-9)
      if (math.abs(lat) <= Tiles.MaxLat)
        assert(lat >= minLat - 1e-9 && lat <= maxLat + 1e-9)
      if (z > 0) {
        val p = Tiles.parent(id)
        assert(Tiles.children(p).contains(id))
      }
    }
  }

  test("geometry covers: superset of contained-point keys, tighter than envelope") {
    val r = new Random(99)
    (1 to 40).foreach { _ =>
      // random triangle (diagonal-ish shape: envelope cover wastes ~half)
      val cx = r.nextDouble() * 300 - 150
      val cy = r.nextDouble() * 120 - 60
      val pts = (0 until 3).map { _ =>
        (cx + r.nextDouble() * 30 - 15, cy + r.nextDouble() * 20 - 10)
      }
      val wkt = s"POLYGON ((${pts.map(p => s"${p._1} ${p._2}").mkString(", ")}, ${pts.head._1} ${pts.head._2}))"
      val g = Wkt.parse(wkt)
      val box = Geom.envelope(g)
      val z = 8
      val tCover = Tiles.coverGeom(g, z).toSet
      val tEnv = Tiles.coverBox(box(0), box(1), box(2), box(3), z).toSet
      assert(tCover.subsetOf(tEnv))
      val cCover = Cells.coverGeom(g, 8).toSet
      val cEnv = Cells.coverBox(box(0), box(1), box(2), box(3), 8).toSet
      assert(cCover.subsetOf(cEnv))
      // every contained random point's key must be covered (no false negatives)
      (1 to 200).foreach { _ =>
        val px = box(0) + r.nextDouble() * (box(2) - box(0))
        val py = box(1) + r.nextDouble() * (box(3) - box(1))
        if (Pip.containsPoint(g, px, py)) {
          assert(tCover.contains(Tiles.tileId(px, py, z)), s"tile miss $px $py in $wkt")
          assert(cCover.contains(Cells.cellId(px, py, 8)), s"cell miss $px $py in $wkt")
        }
      }
    }
  }

  test("geometry cover prunes meaningfully vs envelope for thin diagonals") {
    val g = Wkt.parse("POLYGON ((-40 -40, 40 40, 41 40, -39 -40, -40 -40))")
    val box = Geom.envelope(g)
    val tCover = Tiles.coverGeom(g, 8).length
    val tEnv = Tiles.coverBox(box(0), box(1), box(2), box(3), 8).length
    assert(tCover < tEnv / 4, s"cover $tCover vs envelope $tEnv")
  }

  test("quadkey codec: Bing fixture, round-trip, prefix = ancestor") {
    // the documented Bing example: level 3, tile (x=3, y=5) -> "213"
    assert(Tiles.quadkey(Tiles.pack(3, 3, 5)) == "213")
    assert(Tiles.quadkeyTile("213") == Tiles.pack(3, 3, 5))
    assert(Tiles.quadkey(Tiles.pack(0, 0, 0)) == "")
    assert(Tiles.quadkeyTile("") == Tiles.pack(0, 0, 0))
    var h = 99L
    for (_ <- 0 until 2000) {
      h = graft.sql.GeoOps.splitmix64(h)
      val z = (java.lang.Long.remainderUnsigned(h, 29L) + 1).toInt
      val x = java.lang.Long.remainderUnsigned(h >>> 8, 1L << z).toInt
      val y = java.lang.Long.remainderUnsigned(h >>> 37, 1L << z).toInt
      val id = Tiles.pack(z, x, y)
      val qk = Tiles.quadkey(id)
      assert(qk.length == z && Tiles.quadkeyTile(qk) == id)
      // every proper prefix is the ancestor tile at that zoom
      if (z > 1)
        assert(Tiles.quadkeyTile(qk.substring(0, z - 1)) ==
          Tiles.parentAt(id, z - 1))
    }
    intercept[IllegalArgumentException](Tiles.quadkeyTile("0124"))
    intercept[IllegalArgumentException](Tiles.quadkeyTile("0" * 30))
  }

  test("tile parentAt equals direct assignment at every coarser zoom") {
    // the pyramid-derivation property the flagship relies on: one mercator
    // projection at the finest zoom, bit-shift ancestors for the rest
    val r = new Random(42)
    (1 to 2000).foreach { _ =>
      val (lon, lat) = randLonLat(r)
      val fine = 16
      val id = Tiles.tileId(lon, lat, fine)
      (0 to fine).foreach { z =>
        assert(Tiles.parentAt(id, z) == Tiles.tileId(lon, lat, z),
          s"lon=$lon lat=$lat z=$z")
      }
    }
  }

  test("tile coverBox is exact") {
    val r = new Random(42)
    (1 to 200).foreach { _ =>
      val (lon, lat) = randLonLat(r)
      val w = r.nextDouble() * 5 + 0.01
      val (minLon, minLat) = (math.max(-180, lon - w), math.max(-85, lat - w))
      val (maxLon, maxLat) = (math.min(180, lon + w), math.min(85, lat + w))
      val z = 4 + r.nextInt(8)
      val cover = Tiles.coverBox(minLon, minLat, maxLon, maxLat, z).toSet
      (1 to 30).foreach { _ =>
        val px = minLon + r.nextDouble() * (maxLon - minLon)
        val py = minLat + r.nextDouble() * (maxLat - minLat)
        assert(cover.contains(Tiles.tileId(px, py, z)))
      }
    }
  }

  test("PIP against brute-force winding on convex polygons") {
    val r = new Random(42)
    (1 to 200).foreach { _ =>
      val cx = r.nextDouble() * 300 - 150
      val cy = r.nextDouble() * 140 - 70
      val k = 3 + r.nextInt(9)
      val radius = 0.5 + r.nextDouble() * 5
      val coords = new Array[Double]((k + 1) * 2)
      (0 to k).foreach { v =>
        val ang = 2 * math.Pi * (v % k) / k
        coords(v * 2) = cx + radius * math.cos(ang)
        coords(v * 2 + 1) = cy + radius * math.sin(ang)
      }
      val poly = Geom(GeomTypes.Polygon, Dims.XY, coords, Array(0, k + 1))
      (1 to 50).foreach { _ =>
        val px = cx + (r.nextDouble() * 4 - 2) * radius
        val py = cy + (r.nextDouble() * 4 - 2) * radius
        // convex: inside iff same side of all edges
        var allLeft = true; var allRight = true
        (0 until k).foreach { v =>
          val x1 = coords(v * 2); val y1 = coords(v * 2 + 1)
          val x2 = coords((v + 1) * 2); val y2 = coords((v + 1) * 2 + 1)
          val cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
          if (cross < 0) allLeft = false
          if (cross > 0) allRight = false
        }
        val expected = allLeft || allRight
        assert(Pip.containsPoint(poly, px, py) == expected,
          s"PIP mismatch at ($px,$py) vs $k-gon at ($cx,$cy) r=$radius")
      }
    }
  }

  test("cellIdXyz agrees with the lon/lat trig path") {
    // the oracle-able xyz entry and st_cellid must be the same index: for
    // any lon/lat, feeding the corresponding unit vector through
    // cellIdXyz yields the identical cell id at every level
    val rr = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val lon = rr.nextDouble() * 360 - 180
      val lat = rr.nextDouble() * 180 - 90
      val (x, y, z) = Cells.lonLatToXyz(lon, lat)
      for (lvl <- Seq(0, 5, 12, 30)) {
        assert(graft.sql.GeoOps.cellIdXyz(x, y, z, lvl) ==
          Cells.cellId(lon, lat, lvl), s"($lon, $lat) level $lvl")
      }
    }
    // scale invariance: only the direction matters
    assert(graft.sql.GeoOps.cellIdXyz(0.2, 0.4, 0.6, 12) ==
      graft.sql.GeoOps.cellIdXyz(0.1, 0.2, 0.3, 12))
  }

  test("polygon with hole") {
    val outer = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    val g = Wkt.parse(outer)
    assert(Pip.containsPoint(g, 1, 1))
    assert(!Pip.containsPoint(g, 5, 5)) // in hole
    assert(Pip.containsPoint(g, 2.9, 5))
    assert(!Pip.containsPoint(g, 11, 5))
  }
}
