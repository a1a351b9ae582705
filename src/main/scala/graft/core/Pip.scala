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
}
