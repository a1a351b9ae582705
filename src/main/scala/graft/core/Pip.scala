package graft.core

/** Planar point-in-polygon and distance primitives.
  *
  * Ray casting with the even-odd rule over the flat polygon layout
  * (SURVEY.md §2C; the reference itself has no predicates — these build on
  * its coordinate layout). Edges are planar (the reference stores but never
  * computes spherical edges — `/root/reference/src/geoarrow.c:1747-1750` —
  * and so do we).
  */
object Pip {

  /** Even-odd ray cast of (x,y) against one ring [from,until) of coord
    * indices (interleaved coords with the given stride). */
  private def ringCrossings(coords: Array[Double], stride: Int, from: Int,
                            until: Int, x: Double, y: Double): Boolean = {
    var inside = false
    var i = from
    var jx = coords((until - 1) * stride)
    var jy = coords((until - 1) * stride + 1)
    while (i < until) {
      val ix = coords(i * stride); val iy = coords(i * stride + 1)
      if ((iy > y) != (jy > y) &&
        x < (jx - ix) * (y - iy) / (jy - iy) + ix) inside = !inside
      jx = ix; jy = iy
      i += 1
    }
    inside
  }

  /** Point-in-geometry for POLYGON and MULTIPOLYGON (even-odd across all
    * rings, so holes subtract). Other types -> false. */
  def containsPoint(g: Geom, x: Double, y: Double): Boolean = g.geomType match {
    case GeomTypes.Polygon =>
      var inside = false
      var r = 0
      while (r < g.o0.length - 1) {
        if (ringCrossings(g.coords, g.stride, g.o0(r), g.o0(r + 1), x, y))
          inside = !inside
        r += 1
      }
      inside
    case GeomTypes.MultiPolygon =>
      var inside = false
      var r = 0
      while (r < g.o1.length - 1) {
        if (ringCrossings(g.coords, g.stride, g.o1(r), g.o1(r + 1), x, y))
          inside = !inside
        r += 1
      }
      inside
    case GeomTypes.Collection =>
      if (g.parts == null) false
      else g.parts.exists(containsPoint(_, x, y))
    case _ => false
  }

  /** Squared planar distance between two points. */
  def dist2(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    dx * dx + dy * dy
  }

  // ------------------------------------------------------- box x polygon

  /** Conservative box-geometry intersection: true when the box could share
    * any point with the geometry (vertex in box, box corner in polygon, or
    * any edge touching the box). Used to prune cover cells — "false" must
    * be certain, "true" may be conservative, so the cover stays a superset
    * of every cell containing a point of the geometry. */
  def boxIntersects(g: Geom, xmin: Double, ymin: Double, xmax: Double,
                    ymax: Double): Boolean = g.geomType match {
    case GeomTypes.Point | GeomTypes.MultiPoint =>
      anyVertexInBox(g.coords, g.stride, 0, g.numCoords, xmin, ymin, xmax, ymax)
    case GeomTypes.LineString =>
      pathIntersectsBox(g.coords, g.stride, 0, g.numCoords,
        xmin, ymin, xmax, ymax)
    case GeomTypes.MultiLineString =>
      (0 until g.o0.length - 1).exists(p =>
        pathIntersectsBox(g.coords, g.stride, g.o0(p), g.o0(p + 1),
          xmin, ymin, xmax, ymax))
    case GeomTypes.Polygon =>
      ringsIntersectBox(g.coords, g.stride, g.o0, 0, g.o0.length - 1,
        xmin, ymin, xmax, ymax) ||
        containsPoint(g, xmin, ymin) || containsPoint(g, xmax, ymin) ||
        containsPoint(g, xmin, ymax) || containsPoint(g, xmax, ymax)
    case GeomTypes.MultiPolygon =>
      ringsIntersectBox(g.coords, g.stride, g.o1, 0, g.o1.length - 1,
        xmin, ymin, xmax, ymax) ||
        containsPoint(g, xmin, ymin) || containsPoint(g, xmax, ymin) ||
        containsPoint(g, xmin, ymax) || containsPoint(g, xmax, ymax)
    case GeomTypes.Collection =>
      g.parts != null && g.parts.exists(boxIntersects(_, xmin, ymin, xmax, ymax))
    case _ =>
      // unknown layout: envelope overlap (always conservative)
      val env = Geom.envelope(g)
      env(0) <= xmax && env(2) >= xmin && env(1) <= ymax && env(3) >= ymin
  }

  private def anyVertexInBox(coords: Array[Double], stride: Int, from: Int,
                             until: Int, xmin: Double, ymin: Double,
                             xmax: Double, ymax: Double): Boolean = {
    var i = from
    while (i < until) {
      val x = coords(i * stride); val y = coords(i * stride + 1)
      if (x >= xmin && x <= xmax && y >= ymin && y <= ymax) return true
      i += 1
    }
    false
  }

  /** Open path (no closing edge) vs box. */
  private def pathIntersectsBox(coords: Array[Double], stride: Int, from: Int,
                                until: Int, xmin: Double, ymin: Double,
                                xmax: Double, ymax: Double): Boolean = {
    if (until <= from) return false
    var i = from + 1
    var jx = coords(from * stride); var jy = coords(from * stride + 1)
    if (jx >= xmin && jx <= xmax && jy >= ymin && jy <= ymax) return true
    while (i < until) {
      val ix = coords(i * stride); val iy = coords(i * stride + 1)
      if (ix >= xmin && ix <= xmax && iy >= ymin && iy <= ymax) return true
      if (segmentIntersectsBox(ix, iy, jx, jy, xmin, ymin, xmax, ymax))
        return true
      jx = ix; jy = iy
      i += 1
    }
    false
  }

  private def ringsIntersectBox(coords: Array[Double], stride: Int,
                                offs: Array[Int], from: Int, until: Int,
                                xmin: Double, ymin: Double, xmax: Double,
                                ymax: Double): Boolean = {
    var r = from
    while (r < until) {
      var i = offs(r)
      val end = offs(r + 1)
      var jx = coords((end - 1) * stride)
      var jy = coords((end - 1) * stride + 1)
      while (i < end) {
        val ix = coords(i * stride); val iy = coords(i * stride + 1)
        // vertex inside the box
        if (ix >= xmin && ix <= xmax && iy >= ymin && iy <= ymax) return true
        // segment (ix,iy)-(jx,jy) crosses the box
        if (segmentIntersectsBox(ix, iy, jx, jy, xmin, ymin, xmax, ymax))
          return true
        jx = ix; jy = iy
        i += 1
      }
      r += 1
    }
    false
  }

  /** Liang-Barsky-style reject test: does the segment touch the box? */
  private def segmentIntersectsBox(x1: Double, y1: Double, x2: Double,
                                   y2: Double, xmin: Double, ymin: Double,
                                   xmax: Double, ymax: Double): Boolean = {
    // trivial reject: both endpoints on the same outside side
    if (x1 < xmin && x2 < xmin) return false
    if (x1 > xmax && x2 > xmax) return false
    if (y1 < ymin && y2 < ymin) return false
    if (y1 > ymax && y2 > ymax) return false
    // clip parameter interval [t0,t1] against each slab
    val dx = x2 - x1; val dy = y2 - y1
    var t0 = 0.0; var t1 = 1.0
    def clip(p: Double, q: Double): Boolean = {
      // p*t <= q must hold somewhere in [t0,t1]
      if (p == 0.0) q >= 0.0
      else {
        val t = q / p
        if (p < 0) { if (t > t1) return false; if (t > t0) t0 = t }
        else { if (t < t0) return false; if (t < t1) t1 = t }
        true
      }
    }
    clip(-dx, x1 - xmin) && clip(dx, xmax - x1) &&
      clip(-dy, y1 - ymin) && clip(dy, ymax - y1) && t0 <= t1
  }
}
