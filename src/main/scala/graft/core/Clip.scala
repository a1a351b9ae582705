package graft.core

import scala.collection.mutable.ArrayBuffer

/** Densification and axis-aligned box clipping.
  *
  * Both operators keep every arithmetic step order-fixed so their outputs
  * are bit-replicable by the DuckDB oracle (q125/q126):
  *  - segmentize: per-segment 2D length `sqrt(dx·dx + dy·dy)`,
  *    `n = ceil(len / maxLen)`, inserted points at `t = i/n` with every
  *    ordinate `va + (vb - va)·t` (the `lineInterpolatePoint` lerp shape).
  *  - clipByBox: Liang–Barsky parametric clip for segments
  *    (`t = (c - a)/d` per boundary, max/min folds — exact, no rounding),
  *    Sutherland–Hodgman for rings (crossing with `x = c` sets the clamped
  *    ordinate to `c` EXACTLY and lerps the rest), so axis-aligned inputs
  *    clip to exactly their GREATEST/LEAST corner coordinates.
  *
  * clipByBox follows PostGIS ST_ClipByBox2D's speed-over-validity
  * contract: no snapping or validation, output rings may contain
  * collinear runs, zero-length line grazes (t0 == t1 corner touches) are
  * dropped. Z/M ordinates ride through every lerp (2D clip test).
  */
object Clip {

  /** Max vertices one geometry may densify to — a 100-TB guard: a tiny
    * maxLen on a continental line would otherwise OOM an executor. */
  val MaxDensifyVertices: Int = 1 << 22

  // ------------------------------------------------------------------
  // segmentize
  // ------------------------------------------------------------------

  def segmentize(g: Geom, maxLen: Double): Geom = {
    require(maxLen > 0.0 && !maxLen.isNaN, s"maxLen must be > 0: $maxLen")
    import GeomTypes._
    g.geomType match {
      case Point | MultiPoint => g
      case LineString =>
        val (coords, _) = densifyRange(g, 0, g.numCoords, maxLen)
        new Geom(LineString, g.dims, g.srid, coords, Geom.emptyInts,
          Geom.emptyInts, null)
      case Polygon | MultiLineString =>
        val outC = new ArrayBuffer[Double]()
        val outO = new ArrayBuffer[Int](g.o0.length)
        outO += 0
        var r = 0
        while (r < g.o0.length - 1) {
          val (coords, n) = densifyRange(g, g.o0(r), g.o0(r + 1), maxLen)
          outC ++= coords
          outO += outO.last + n
          r += 1
        }
        new Geom(g.geomType, g.dims, g.srid, outC.toArray, outO.toArray,
          Geom.emptyInts, null)
      case MultiPolygon =>
        val outC = new ArrayBuffer[Double]()
        val outO1 = new ArrayBuffer[Int](g.o1.length)
        outO1 += 0
        var r = 0
        while (r < g.o1.length - 1) {
          val (coords, n) = densifyRange(g, g.o1(r), g.o1(r + 1), maxLen)
          outC ++= coords
          outO1 += outO1.last + n
          r += 1
        }
        new Geom(MultiPolygon, g.dims, g.srid, outC.toArray, g.o0.clone(),
          outO1.toArray, null)
      case Collection =>
        val parts =
          if (g.parts == null) null else g.parts.map(segmentize(_, maxLen))
        new Geom(Collection, g.dims, g.srid, g.coords, g.o0, g.o1, parts)
      case other =>
        throw new IllegalArgumentException(
          s"st_segmentize: unsupported type ${GeomTypes.name(other)}")
    }
  }

  /** Densify one coordinate sequence [from, to) (coord indices). Returns
    * (flat coords, vertex count). */
  private def densifyRange(g: Geom, from: Int, to: Int,
                           maxLen: Double): (Array[Double], Int) = {
    val s = g.stride
    val out = new ArrayBuffer[Double]((to - from) * s)
    var count = 0
    def push(v: Int): Unit = {
      var d = 0
      while (d < s) { out += g.coords(v * s + d); d += 1 }
      count += 1
      if (count > MaxDensifyVertices) throw new IllegalArgumentException(
        s"st_segmentize would emit more than $MaxDensifyVertices vertices " +
          "for one geometry; raise maxLen or pre-split the input")
    }
    if (to > from) push(from)
    var i = from
    while (i < to - 1) {
      val dx = g.coords((i + 1) * s) - g.coords(i * s)
      val dy = g.coords((i + 1) * s + 1) - g.coords(i * s + 1)
      val len = math.sqrt(dx * dx + dy * dy)
      val n = if (len > maxLen) math.ceil(len / maxLen).toLong else 1L
      if (count + n > MaxDensifyVertices) throw new IllegalArgumentException(
        s"st_segmentize would emit more than $MaxDensifyVertices vertices " +
          "for one geometry; raise maxLen or pre-split the input")
      val nd = n.toDouble
      var k = 1L
      while (k < n) {
        val t = k.toDouble / nd
        var d = 0
        while (d < s) {
          val va = g.coords(i * s + d)
          out += va + (g.coords((i + 1) * s + d) - va) * t
          d += 1
        }
        count += 1
        k += 1
      }
      push(i + 1)
      i += 1
    }
    (out.toArray, count)
  }

  // ------------------------------------------------------------------
  // clipByBox
  // ------------------------------------------------------------------

  def clipByBox(g: Geom, xmin: Double, ymin: Double,
                xmax: Double, ymax: Double): Geom = {
    require(xmin <= xmax && ymin <= ymax,
      s"st_clipbybox2d: inverted box ($xmin $ymin, $xmax $ymax)")
    import GeomTypes._
    val s = g.stride
    def inside(v: Int): Boolean = {
      val x = g.coords(v * s); val y = g.coords(v * s + 1)
      x >= xmin && x <= xmax && y >= ymin && y <= ymax
    }
    g.geomType match {
      case Point =>
        if (!g.isEmpty && inside(0)) g
        else new Geom(Point, g.dims, g.srid, Geom.emptyDoubles,
          Geom.emptyInts, Geom.emptyInts, null)
      case MultiPoint =>
        val out = new ArrayBuffer[Double]()
        var v = 0
        while (v < g.numCoords) {
          if (inside(v)) { var d = 0; while (d < s) { out += g.coords(v * s + d); d += 1 } }
          v += 1
        }
        new Geom(MultiPoint, g.dims, g.srid, out.toArray, Geom.emptyInts,
          Geom.emptyInts, null)
      case LineString =>
        val pieces = clipLineRange(g, 0, g.numCoords, xmin, ymin, xmax, ymax)
        linesResult(g, pieces, forceMulti = false)
      case MultiLineString =>
        val pieces = new ArrayBuffer[Array[Double]]()
        var p = 0
        while (p < g.o0.length - 1) {
          pieces ++= clipLineRange(g, g.o0(p), g.o0(p + 1), xmin, ymin, xmax, ymax)
          p += 1
        }
        linesResult(g, pieces, forceMulti = true)
      case Polygon =>
        val rings = clipRings(g, (0 until math.max(0, g.o0.length - 1))
          .map(r => (g.o0(r), g.o0(r + 1))), xmin, ymin, xmax, ymax)
        polygonFrom(g, rings)
      case MultiPolygon =>
        val polys = new ArrayBuffer[(Array[Int], Array[Double])]()
        var p = 0
        while (p < g.o0.length - 1) {
          val ringRanges = (g.o0(p) until g.o0(p + 1))
            .map(r => (g.o1(r), g.o1(r + 1)))
          val rings = clipRings(g, ringRanges, xmin, ymin, xmax, ymax)
          if (rings.nonEmpty) {
            val offs = new Array[Int](rings.length + 1)
            val flat = new ArrayBuffer[Double]()
            var i = 0
            while (i < rings.length) {
              offs(i + 1) = offs(i) + rings(i).length / s
              flat ++= rings(i)
              i += 1
            }
            polys += ((offs, flat.toArray))
          }
          p += 1
        }
        // rebuild multipolygon offsets: o0 = polygon -> ring index,
        // o1 = ring -> coord index
        val o0 = new ArrayBuffer[Int](); o0 += 0
        val o1 = new ArrayBuffer[Int](); o1 += 0
        val flat = new ArrayBuffer[Double]()
        polys.foreach { case (offs, coords) =>
          val base = o1.last
          var i = 1
          while (i < offs.length) { o1 += base + offs(i); i += 1 }
          o0 += o0.last + (offs.length - 1)
          flat ++= coords
        }
        new Geom(MultiPolygon, g.dims, g.srid, flat.toArray, o0.toArray,
          o1.toArray, null)
      case Collection =>
        val parts = if (g.parts == null) null
          else g.parts.map(clipByBox(_, xmin, ymin, xmax, ymax))
            .filterNot(_.isEmpty)
        new Geom(Collection, g.dims, g.srid, g.coords, g.o0, g.o1,
          if (parts == null) null else parts)
      case other =>
        throw new IllegalArgumentException(
          s"st_clipbybox2d: unsupported type ${GeomTypes.name(other)}")
    }
  }

  /** Liang–Barsky clip of each segment in [from, to), stitched: a piece
    * whose first vertex bit-equals the previous piece's last vertex
    * extends it (shared interior vertex). Zero-length grazes (t0 >= t1)
    * drop. Entry/exit ts: for d > 0 enter at (min - a)/d, exit at
    * (max - a)/d; for d < 0 the two swap; for d == 0 the axis only
    * rejects when outside its slab — divisions never see a zero
    * denominator, so the oracle's GREATEST/LEAST fold replicates t0/t1
    * exactly (max/min are rounding-free). */
  private def clipLineRange(g: Geom, from: Int, to: Int,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): ArrayBuffer[Array[Double]] = {
    val s = g.stride
    val pieces = new ArrayBuffer[Array[Double]]()
    var cur: ArrayBuffer[Double] = null
    var i = from
    while (i < to - 1) {
      val xa = g.coords(i * s); val ya = g.coords(i * s + 1)
      val xb = g.coords((i + 1) * s); val yb = g.coords((i + 1) * s + 1)
      val dx = xb - xa; val dy = yb - ya
      // degenerate input segment (duplicate consecutive vertices):
      // contributes no length — skip WITHOUT breaking the stitch (the
      // neighbors share the vertex, so their pieces still weld); a
      // standalone zero-length line therefore clips to EMPTY, matching
      // the zero-length-graze drop rule
      var reject = dx == 0.0 && dy == 0.0
      var degenerate = reject
      var t0 = 0.0; var t1 = 1.0
      if (reject) {}
      else if (dx == 0.0) { if (xa < xmin || xa > xmax) reject = true }
      else {
        val te = if (dx > 0) (xmin - xa) / dx else (xmax - xa) / dx
        val tx = if (dx > 0) (xmax - xa) / dx else (xmin - xa) / dx
        if (te > t0) t0 = te
        if (tx < t1) t1 = tx
      }
      if (!reject) {
        if (dy == 0.0) { if (ya < ymin || ya > ymax) reject = true }
        else {
          val te = if (dy > 0) (ymin - ya) / dy else (ymax - ya) / dy
          val tx = if (dy > 0) (ymax - ya) / dy else (ymin - ya) / dy
          if (te > t0) t0 = te
          if (tx < t1) t1 = tx
        }
      }
      if (!reject && t0 < t1) {
        val head = lerpVertex(g, i, i + 1, t0, atStart = t0 == 0.0, atEnd = false)
        val tail = lerpVertex(g, i, i + 1, t1, atStart = false, atEnd = t1 == 1.0)
        if (cur != null && sameVertex(cur, head, s)) {
          cur ++= tail
        } else {
          if (cur != null) pieces += cur.toArray
          cur = new ArrayBuffer[Double]()
          cur ++= head; cur ++= tail
        }
      } else if (!degenerate) {
        if (cur != null) { pieces += cur.toArray; cur = null }
      }
      i += 1
    }
    if (cur != null) pieces += cur.toArray
    pieces
  }

  /** Vertex at parameter t along segment (a, b): endpoint verbatim when
    * t lands exactly on it, else the pinned lerp on every ordinate. */
  private def lerpVertex(g: Geom, a: Int, b: Int, t: Double,
                         atStart: Boolean, atEnd: Boolean): Array[Double] = {
    val s = g.stride
    val out = new Array[Double](s)
    var d = 0
    while (d < s) {
      out(d) =
        if (atStart) g.coords(a * s + d)
        else if (atEnd) g.coords(b * s + d)
        else {
          val va = g.coords(a * s + d)
          va + (g.coords(b * s + d) - va) * t
        }
      d += 1
    }
    out
  }

  private def sameVertex(cur: ArrayBuffer[Double], v: Array[Double], s: Int): Boolean = {
    if (cur.length < s) return false
    var d = 0
    while (d < s) {
      if (java.lang.Double.doubleToRawLongBits(cur(cur.length - s + d)) !=
          java.lang.Double.doubleToRawLongBits(v(d))) return false
      d += 1
    }
    true
  }

  private def linesResult(g: Geom, pieces: ArrayBuffer[Array[Double]],
                          forceMulti: Boolean): Geom = {
    val s = g.stride
    import GeomTypes._
    if (pieces.isEmpty) {
      val t = if (forceMulti) MultiLineString else LineString
      return Geom(t, g.dims, Geom.emptyDoubles, srid = g.srid)
    }
    if (pieces.length == 1 && !forceMulti)
      return new Geom(LineString, g.dims, g.srid, pieces(0),
        Geom.emptyInts, Geom.emptyInts, null)
    val offs = new Array[Int](pieces.length + 1)
    val flat = new ArrayBuffer[Double]()
    var i = 0
    while (i < pieces.length) {
      offs(i + 1) = offs(i) + pieces(i).length / s
      flat ++= pieces(i)
      i += 1
    }
    new Geom(MultiLineString, g.dims, g.srid, flat.toArray, offs,
      Geom.emptyInts, null)
  }

  /** Sutherland–Hodgman each ring against the four half-planes in fixed
    * order (left, right, bottom, top); the shell (first range) emptying
    * empties the polygon; degenerate rings (< 3 distinct vertices after
    * consecutive-dup removal) drop. Returns closed rings. */
  private def clipRings(g: Geom, ranges: Seq[(Int, Int)],
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): ArrayBuffer[Array[Double]] = {
    val s = g.stride
    val out = new ArrayBuffer[Array[Double]]()
    var first = true
    ranges.foreach { case (from, to) =>
      // open the ring: the closing duplicate drops before clipping
      var n = to - from
      if (n >= 2) {
        var dup = true
        var d = 0
        while (d < s && dup) {
          if (g.coords(from * s + d) != g.coords((to - 1) * s + d)) dup = false
          d += 1
        }
        if (dup) n -= 1
      }
      var ring: Array[Double] = new Array[Double](n * s)
      System.arraycopy(g.coords, from * s, ring, 0, n * s)
      // 0=left(x>=xmin) 1=right(x<=xmax) 2=bottom(y>=ymin) 3=top(y<=ymax)
      var pass = 0
      while (pass < 4 && ring.length >= s) {
        ring = shPass(ring, s, pass, xmin, ymin, xmax, ymax)
        pass += 1
      }
      val cleaned = dropConsecutiveDups(ring, s)
      if (cleaned.length / s >= 3) {
        // re-close
        val closed = new Array[Double](cleaned.length + s)
        System.arraycopy(cleaned, 0, closed, 0, cleaned.length)
        System.arraycopy(cleaned, 0, closed, cleaned.length, s)
        out += closed
      } else if (first) {
        // shell degenerate -> whole polygon empties
        out.clear()
        return out
      }
      first = false
    }
    out
  }

  private def shPass(ring: Array[Double], s: Int, pass: Int,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Double] = {
    val m = ring.length / s
    val out = new ArrayBuffer[Double](ring.length + 2 * s)
    def in(v: Int): Boolean = {
      val x = ring(v * s); val y = ring(v * s + 1)
      pass match {
        case 0 => x >= xmin
        case 1 => x <= xmax
        case 2 => y >= ymin
        case _ => y <= ymax
      }
    }
    // crossing with a vertical boundary x = c sets x to c EXACTLY and
    // lerps every other ordinate at t = (c - xa)/(xb - xa); horizontal
    // boundaries mirror on y — axis-aligned inputs stay exact
    def cross(a: Int, b: Int): Unit = {
      val vertical = pass <= 1
      val c = pass match {
        case 0 => xmin; case 1 => xmax; case 2 => ymin; case _ => ymax
      }
      val pa = if (vertical) ring(a * s) else ring(a * s + 1)
      val pb = if (vertical) ring(b * s) else ring(b * s + 1)
      val t = (c - pa) / (pb - pa)
      var d = 0
      while (d < s) {
        if (vertical && d == 0) out += c
        else if (!vertical && d == 1) out += c
        else {
          val va = ring(a * s + d)
          out += va + (ring(b * s + d) - va) * t
        }
        d += 1
      }
    }
    var i = 0
    while (i < m) {
      val prev = (i + m - 1) % m
      val curIn = in(i); val prevIn = in(prev)
      if (curIn) {
        if (!prevIn) cross(prev, i)
        var d = 0
        while (d < s) { out += ring(i * s + d); d += 1 }
      } else if (prevIn) cross(prev, i)
      i += 1
    }
    out.toArray
  }

  private def dropConsecutiveDups(ring: Array[Double], s: Int): Array[Double] = {
    val m = ring.length / s
    if (m == 0) return ring
    val out = new ArrayBuffer[Double](ring.length)
    var i = 0
    while (i < m) {
      val prevLen = out.length
      var dup = prevLen >= s
      var d = 0
      while (d < s && dup) {
        if (java.lang.Double.doubleToRawLongBits(ring(i * s + d)) !=
            java.lang.Double.doubleToRawLongBits(out(prevLen - s + d))) dup = false
        d += 1
      }
      if (!dup) { d = 0; while (d < s) { out += ring(i * s + d); d += 1 } }
      i += 1
    }
    // first == last after the wrap? drop the trailing one
    if (out.length / s >= 2) {
      var dup = true
      var d = 0
      while (d < s && dup) {
        if (java.lang.Double.doubleToRawLongBits(out(d)) !=
            java.lang.Double.doubleToRawLongBits(out(out.length - s + d))) dup = false
        d += 1
      }
      if (dup) out.remove(out.length - s, s)
    }
    out.toArray
  }

  private def polygonFrom(g: Geom, rings: ArrayBuffer[Array[Double]]): Geom = {
    val s = g.stride
    if (rings.isEmpty)
      return Geom(GeomTypes.Polygon, g.dims, Geom.emptyDoubles, srid = g.srid)
    val offs = new Array[Int](rings.length + 1)
    val flat = new ArrayBuffer[Double]()
    var i = 0
    while (i < rings.length) {
      offs(i + 1) = offs(i) + rings(i).length / s
      flat ++= rings(i)
      i += 1
    }
    new Geom(GeomTypes.Polygon, g.dims, g.srid, flat.toArray, offs,
      Geom.emptyInts, null)
  }
}
