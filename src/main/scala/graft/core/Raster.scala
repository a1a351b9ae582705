package graft.core

import scala.collection.mutable.ArrayBuffer

/** Scanline polygon rasterization over one Web-Mercator z/x/y tile — the
  * vector→raster half of the raster↔vector bridge (SURVEY.md §2C; the
  * point renderer in [[graft.operators.TileRender]] is the density half).
  *
  * Semantics (chosen so a distributed render is exactly reproducible and
  * closed-form oracle-able):
  *
  *  - Vertices project through the SAME forward web-mercator pixel math as
  *    point binning ([[Tiles.worldPixelXD]]/[[Tiles.worldPixelYD]] — the
  *    continuous, non-truncated form of `worldPixelX/Y`), and edges are
  *    straight lines in PROJECTED space. That is what slippy-map renderers
  *    do (project, then rasterize in screen space), and it keeps every
  *    crossing computation in exactly-specified IEEE arithmetic — no
  *    inverse mercator, no transcendentals past the per-vertex projection.
  *  - A pixel lights when its CENTER `(P + 0.5, Q + 0.5)` (global world
  *    pixels) is inside by the even-odd rule, with the half-open
  *    `[lo, hi)` fill convention on BOTH axes (the raster "top-left rule").
  *    Half-open fill means two polygons sharing an edge never double-light
  *    a pixel and never leave a seam — which is what makes categorical /
  *    zone rasters partition the grid.
  *  - Holes subtract via even-odd across a polygon's rings; a
  *    MULTIPOLYGON's rings participate in one even-odd pass (matching
  *    [[Pip.containsPoint]]); GEOMETRYCOLLECTION parts union.
  *  - LINESTRING / MULTILINESTRING stroke as width-1 supercover (every
  *    pixel box the projected segment touches) — trajectory/road
  *    rendering; pass `strokeWidthPx` for thicker round-capped capsules.
  *    POINTs light nothing
  *    (zero extent — density rendering is the point renderer's job).
  *
  * Coordinates past the Web-Mercator domain clamp exactly like point
  * binning does; polygons crossing the antimeridian are not supported
  * (split them first — same contract as [[Tiles.coverBox]]).
  */
object Raster {

  /** Tile cover for RASTERIZATION — the projected-space companion of
    * [[Tiles.coverGeom]]. The fill rule treats edges as straight in
    * PROJECTED space, while `coverGeom` prunes with straight lon/lat
    * edges; Mercator y is concave in latitude, so a long slanted edge's
    * projected interior can extend into tiles the geographic cover prunes
    * (up to ~7° of latitude for an edge spanning 0°→66°N over 120° of
    * longitude) — pixels there would silently never render. This cover
    * therefore projects the vertices ONCE (the same [[Tiles.worldPixelXD]]
    * projection the fill uses) and descends hierarchically with
    * [[Pip.boxIntersects]] tests in world-pixel space, so it is a
    * guaranteed superset of every tile [[rasterize]] can light: a lit
    * pixel's center is an interior point of both the projected geometry
    * and its tile's pixel box, hence the two intersect. */
  def coverTiles(g: Geom, zoom: Int, size: Int,
                 padPx: Double = 0.0): Array[Long] = {
    require(zoom >= 0 && zoom <= 29, s"zoom out of [0,29]: $zoom")
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    require(padPx >= 0.0 && padPx <= size, s"cover pad out of [0,size]: $padPx")
    val pg = projectGeom(g, zoom, size)
    if (pg == null) return Array.emptyLongArray
    val env = Geom.envelope(pg)
    if (!(env(0) <= env(2)) || !(env(1) <= env(3))) return Array.emptyLongArray
    val out = new ArrayBuffer[Long]()
    def hit(id: Long): Boolean = {
      val k = zoom - Tiles.z(id)
      val span = size.toDouble * (1L << k)
      val bx0 = Tiles.x(id) * span; val by0 = Tiles.y(id) * span
      // padPx inflates for thick strokes (a width-2·padPx capsule can
      // reach that many pixels past the bare segment)
      val pad = span * 1e-9 + 1e-9 + padPx
      Pip.boxIntersects(pg, bx0 - pad, by0 - pad,
        bx0 + span + pad, by0 + span + pad)
    }
    def recurse(id: Long): Unit = {
      if (!hit(id)) return
      if (Tiles.z(id) >= zoom) { out += id; return }
      Tiles.children(id).foreach(recurse)
    }
    val startZ = math.max(0, zoom - 8)
    val coarseSpan = size.toDouble * (1L << (zoom - startZ))
    val cn = 1 << startZ
    def clampTile(v: Double): Int =
      math.max(0, math.min(cn - 1, math.floor(v / coarseSpan).toInt))
    var xi = clampTile(env(0) - padPx)
    val x1 = clampTile(env(2) + padPx)
    val y0 = clampTile(env(1) - padPx); val y1 = clampTile(env(3) + padPx)
    while (xi <= x1) {
      var yi = y0
      while (yi <= y1) { recurse(Tiles.pack(startZ, xi, yi)); yi += 1 }
      xi += 1
    }
    out.toArray
  }

  /** Projects every vertex to continuous world pixels at (zoom, size),
    * preserving the flat layout — yields a Geom in pixel coordinates that
    * [[Pip]]'s planar predicates apply to directly. */
  private def projectGeom(g: Geom, zoom: Int, size: Int): Geom = {
    if (g.geomType == GeomTypes.Collection) {
      if (g.parts == null || g.parts.isEmpty) return null
      return Geom(GeomTypes.Collection, g.dims, Geom.emptyDoubles,
        parts = g.parts.map(projectGeom(_, zoom, size)).filter(_ != null))
    }
    val stride = g.stride
    val nc = g.numCoords
    if (nc == 0) return null
    val coords = new Array[Double](nc * 2)
    var i = 0
    while (i < nc) {
      coords(2 * i) = Tiles.worldPixelXD(g.coords(i * stride), zoom, size)
      coords(2 * i + 1) = Tiles.worldPixelYD(g.coords(i * stride + 1), zoom, size)
      i += 1
    }
    // the projected copy is always XY (z/m don't participate in covers)
    new Geom(g.geomType, Dims.XY, g.srid, coords, g.o0, g.o1, null)
  }

  /** Lit in-tile pixel indices (`py * size + px`, row-major, ascending) of
    * the geometry's interior over tile `id` rasterized at `size`×`size`.
    * `strokeWidthPx > 0` renders linestrings as round-capped capsules of
    * that width in PIXELS (a pixel lights when its center is within
    * width/2 of the projected segment — the natural renderer unit, and
    * one shared distance expression, so even diagonal thick strokes are
    * closed-form oracle-able); `<= 0` keeps the width-1 supercover.
    * Polygon fills ignore the width. */
  def rasterize(g: Geom, id: Long, size: Int,
                strokeWidthPx: Double = 0.0): Array[Int] = {
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    require(strokeWidthPx.isNaN == false && strokeWidthPx <= size,
      s"stroke width out of range: $strokeWidthPx")
    val z = Tiles.z(id)
    val x0 = Tiles.x(id).toLong * size
    val y0 = Tiles.y(id).toLong * size
    val bits = new java.util.BitSet(size * size)
    fillInto(g, z, x0, y0, size, bits, strokeWidthPx)
    val out = new Array[Int](bits.cardinality())
    var i = bits.nextSetBit(0)
    var k = 0
    while (i >= 0) { out(k) = i; k += 1; i = bits.nextSetBit(i + 1) }
    out
  }

  /** Union-fills one geometry (recursing into collection parts): areal
    * interiors scanline-fill; linestrings stroke as width-1 supercover
    * (every pixel box the projected segment touches — trajectory / road
    * rendering; `strokeWidthPx > 0` widens them to round-capped
    * capsules); points light nothing (density rendering is the point
    * renderer's job). */
  private def fillInto(g: Geom, z: Int, x0: Long, y0: Long, size: Int,
                       bits: java.util.BitSet,
                       strokeWidthPx: Double): Unit = g.geomType match {
    case GeomTypes.Polygon =>
      fillRings(projectRings(g, g.o0, z, size), x0, y0, size, bits)
    case GeomTypes.MultiPolygon =>
      fillRings(projectRings(g, g.o1, z, size), x0, y0, size, bits)
    case GeomTypes.LineString =>
      val rs = projectRings(g, Array(0, g.numCoords), z, size)
      strokePath(rs(0)._1, rs(0)._2, x0, y0, size, bits, strokeWidthPx)
    case GeomTypes.MultiLineString =>
      projectRings(g, g.o0, z, size).foreach { case (xs, ys) =>
        strokePath(xs, ys, x0, y0, size, bits, strokeWidthPx)
      }
    case GeomTypes.Collection =>
      if (g.parts != null)
        g.parts.foreach(fillInto(_, z, x0, y0, size, bits, strokeWidthPx))
    case _ => () // points: no extent, no pixels
  }

  /** Width-1 supercover stroke of an open path: a pixel lights when the
    * projected segment touches its CLOSED box `[P, P+1] × [Q, Q+1]`
    * (conservative by at most the measure-zero exact-boundary touches;
    * exact on the axis-aligned strokes the oracle replicates). Row-band
    * sweep: for each pixel row the segment's y-span crosses, the x-extent
    * of the in-band portion gives the lit column range. */
  private def strokePath(xs: Array[Double], ys: Array[Double],
                         x0: Long, y0: Long, size: Int,
                         bits: java.util.BitSet,
                         strokeWidthPx: Double): Unit = {
    var i = 1
    while (i < xs.length) {
      if (strokeWidthPx > 0.0)
        strokeSegmentWide(xs(i - 1), ys(i - 1), xs(i), ys(i),
          x0, y0, size, strokeWidthPx / 2.0, bits)
      else
        strokeSegment(xs(i - 1), ys(i - 1), xs(i), ys(i), x0, y0, size, bits)
      i += 1
    }
  }

  /** Width-`2r` round-capped stroke: pixel center within distance `r`
    * (pixel units) of the projected segment. One shared expression tree —
    * the squared point-to-segment distance with a [0,1]-clamped
    * projection parameter — evaluated per candidate pixel of the
    * segment's inflated bounding box, so the oracle replicates ANY angle
    * bit-exactly (q110). The box scan is O((len+2r)·(2r+extent)) per
    * (segment, tile) — bounded by tile area, exact, no per-piece capsule
    * algebra to keep in sync with the oracle. */
  private def strokeSegmentWide(x1: Double, y1: Double, x2: Double,
                                y2: Double, x0: Long, y0: Long, size: Int,
                                r: Double, bits: java.util.BitSet): Unit = {
    val ddx = x2 - x1; val ddy = y2 - y1
    val len2 = ddx * ddx + ddy * ddy
    val minX = math.min(x1, x2) - r; val maxX = math.max(x1, x2) + r
    val minY = math.min(y1, y2) - r; val maxY = math.max(y1, y2) + r
    val qLo = math.min(size - 1L,
      math.max(0L, math.floor(minY - 0.5).toLong - y0)).toInt
    val qHi = math.max(0L,
      math.min(size - 1L, math.ceil(maxY - 0.5).toLong - y0)).toInt
    val pLo = math.min(size - 1L,
      math.max(0L, math.floor(minX - 0.5).toLong - x0)).toInt
    val pHi = math.max(0L,
      math.min(size - 1L, math.ceil(maxX - 0.5).toLong - x0)).toInt
    val r2 = r * r
    var q = qLo
    while (q <= qHi) {
      val cy = y0 + q + 0.5
      var p = pLo
      while (p <= pHi) {
        val cx = x0 + p + 0.5
        val tRaw = if (len2 == 0.0) 0.0
          else ((cx - x1) * ddx + (cy - y1) * ddy) / len2
        val t = math.max(0.0, math.min(1.0, tRaw))
        val qx = x1 + t * ddx; val qy = y1 + t * ddy
        val dx = cx - qx; val dy = cy - qy
        if (dx * dx + dy * dy <= r2) bits.set(q * size + p)
        p += 1
      }
      q += 1
    }
  }

  private def strokeSegment(xa: Double, ya: Double, xb: Double, yb: Double,
                            x0: Long, y0: Long, size: Int,
                            bits: java.util.BitSet): Unit = {
    def cols(q: Int, xLo: Double, xHi: Double): Unit = {
      var p = math.max(x0, math.floor(xLo).toLong)
      val pEnd = math.min(x0 + size - 1, math.floor(xHi).toLong)
      while (p <= pEnd) { bits.set(q * size + (p - x0).toInt); p += 1 }
    }
    if (ya == yb) {
      val q = math.floor(ya).toLong - y0
      if (q >= 0 && q < size)
        cols(q.toInt, math.min(xa, xb), math.max(xa, xb))
    } else {
      val (x1, y1, x2, y2) =
        if (ya <= yb) (xa, ya, xb, yb) else (xb, yb, xa, ya)
      // Long-clamped row bounds (same discipline as the fill: a wrapped
      // .toInt at high zoom must not spin an empty loop)
      val qLo = math.min(size - 1L,
        math.max(0L, math.floor(y1).toLong - y0)).toInt
      val qHi = math.max(0L,
        math.min(size - 1L, math.floor(y2).toLong - y0)).toInt
      val dy = y2 - y1
      var q = qLo
      while (q <= qHi) {
        val bandLo = math.max(y1, (y0 + q).toDouble)
        val bandHi = math.min(y2, (y0 + q + 1).toDouble)
        if (bandLo <= bandHi) {
          val xA = x1 + (bandLo - y1) * (x2 - x1) / dy
          val xB = x1 + (bandHi - y1) * (x2 - x1) / dy
          cols(q, math.min(xA, xB), math.max(xA, xB))
        }
        q += 1
      }
    }
  }

  /** Projects every ring's vertices to continuous world pixels once.
    * Returns (xs, ys) per ring. */
  private def projectRings(g: Geom, ringOffsets: Array[Int], z: Int,
                           size: Int): Array[(Array[Double], Array[Double])] = {
    val stride = g.stride
    val out = new Array[(Array[Double], Array[Double])](ringOffsets.length - 1)
    var r = 0
    while (r < ringOffsets.length - 1) {
      val from = ringOffsets(r); val until = ringOffsets(r + 1)
      val n = until - from
      val xs = new Array[Double](n); val ys = new Array[Double](n)
      var i = 0
      while (i < n) {
        xs(i) = Tiles.worldPixelXD(g.coords((from + i) * stride), z, size)
        ys(i) = Tiles.worldPixelYD(g.coords((from + i) * stride + 1), z, size)
        i += 1
      }
      out(r) = (xs, ys)
      r += 1
    }
    out
  }

  /** One even-odd scanline pass over all rings (holes subtract), OR-ing
    * lit pixels into `bits`. */
  private def fillRings(rings: Array[(Array[Double], Array[Double])],
                        x0: Long, y0: Long, size: Int,
                        bits: java.util.BitSet): Unit = {
    if (rings.isEmpty) return
    // row bounds: only rows whose center can be inside [minY, maxY)
    var minY = Double.MaxValue; var maxY = -Double.MaxValue
    rings.foreach { case (_, ys) =>
      var i = 0
      while (i < ys.length) {
        if (ys(i) < minY) minY = ys(i)
        if (ys(i) > maxY) maxY = ys(i)
        i += 1
      }
    }
    if (minY > maxY) return
    // clamp in Long on BOTH sides before .toInt: at high zoom the raw row
    // bound can exceed Int range and a wrapped qLo would spin a
    // multi-billion-iteration empty loop (the crossing test governs
    // correctness, so clamping only ever shrinks wasted work)
    val qLo = math.min(size - 1L,
      math.max(0L, math.ceil(minY - 0.5).toLong - y0 - 1)).toInt
    val qHi = math.max(0L,
      math.min(size - 1L, math.ceil(maxY - 0.5).toLong - y0)).toInt
    val cross = new ArrayBuffer[Double](8)
    var q = qLo
    while (q <= qHi) {
      val cy = y0 + q + 0.5
      cross.clear()
      rings.foreach { case (xs, ys) =>
        val n = xs.length
        var j = n - 1
        var i = 0
        while (i < n) {
          val y1 = ys(j); val y2 = ys(i)
          // half-open vertex rule: an edge crosses when cy is in
          // [min(y1,y2), max(y1,y2)) — shared vertices count exactly once
          if ((y1 <= cy && cy < y2) || (y2 <= cy && cy < y1)) {
            cross += xs(j) + (cy - y1) * (xs(i) - xs(j)) / (y2 - y1)
          }
          j = i; i += 1
        }
      }
      if (cross.nonEmpty) {
        val cs = cross.toArray
        java.util.Arrays.sort(cs)
        var k = 0
        while (k + 1 < cs.length) {
          // columns P (global) with cs(k) <= P + 0.5 < cs(k+1)
          var p = math.max(x0, math.ceil(cs(k) - 0.5).toLong)
          val pEnd = math.min(x0 + size - 1, math.ceil(cs(k + 1) - 0.5).toLong - 1)
          while (p <= pEnd) {
            bits.set(q * size + (p - x0).toInt)
            p += 1
          }
          k += 2
        }
      }
      q += 1
    }
  }
}
