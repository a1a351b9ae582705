package graft.core

/** Planar convex hull (Andrew's monotone chain — exact sign tests on
  * doubles, no epsilon). The reference is codec-only; this is standard
  * relational-surface geometry (PostGIS `ST_ConvexHull` semantics for the
  * degenerate cases). Output is deterministic: the ring starts at the
  * lexicographically smallest (x, y) vertex and winds CCW, collinear
  * boundary points dropped — which is what lets the q62 oracle verify the
  * hull analytically (area/perimeter/vertex count of a known shape).
  * Z/M ordinates are dropped (hull is a planar construct). */
object Hull {

  /** Gather all XY vertices of any geometry (collections recursed). */
  private def gather(g: Geom, out: scala.collection.mutable.ArrayBuffer[(Double, Double)]): Unit = {
    if (g.geomType == GeomTypes.Collection) {
      if (g.parts != null) g.parts.foreach(gather(_, out))
    } else {
      val s = g.stride
      var i = 0
      val n = g.numCoords
      while (i < n) {
        val x = g.coords(i * s); val y = g.coords(i * s + 1)
        if (!x.isNaN && !y.isNaN) out += ((x, y))
        i += 1
      }
    }
  }

  private def cross(ox: Double, oy: Double, ax: Double, ay: Double,
                    bx: Double, by: Double): Double =
    (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  /** Convex hull: POLYGON (CCW, closed, from the lexicographic min) for
    * >=3 non-collinear points; LINESTRING (the two extreme points) for
    * collinear input; POINT for a single point; POINT/POLYGON EMPTY in. */
  def convexHull(g: Geom): Geom = {
    val buf = new scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    gather(g, buf)
    val pts = buf.distinct.sorted.toArray
    if (pts.isEmpty)
      return Geom(GeomTypes.Polygon, Dims.XY, Geom.emptyDoubles)
    if (pts.length == 1)
      return Geom(GeomTypes.Point, Dims.XY, Array(pts(0)._1, pts(0)._2))
    // monotone chain: lower then upper hull, strict turns only
    val h = new Array[(Double, Double)](2 * pts.length)
    var k = 0
    for (p <- pts) {
      while (k >= 2 && cross(h(k - 2)._1, h(k - 2)._2, h(k - 1)._1,
        h(k - 1)._2, p._1, p._2) <= 0) k -= 1
      h(k) = p; k += 1
    }
    val lower = k + 1
    for (i <- pts.length - 2 to 0 by -1) {
      val p = pts(i)
      while (k >= lower && cross(h(k - 2)._1, h(k - 2)._2, h(k - 1)._1,
        h(k - 1)._2, p._1, p._2) <= 0) k -= 1
      h(k) = p; k += 1
    }
    // h[0, k-1) is the CCW hull starting at the lexicographic min
    val ring = h.take(k - 1)
    if (ring.length == 2) {
      val coords = Array(ring(0)._1, ring(0)._2, ring(1)._1, ring(1)._2)
      return Geom(GeomTypes.LineString, Dims.XY, coords)
    }
    val coords = new Array[Double]((ring.length + 1) * 2)
    var i = 0
    while (i < ring.length) {
      coords(2 * i) = ring(i)._1; coords(2 * i + 1) = ring(i)._2; i += 1
    }
    coords(2 * ring.length) = ring(0)._1
    coords(2 * ring.length + 1) = ring(0)._2
    Geom(GeomTypes.Polygon, Dims.XY, coords, Array(0, ring.length + 1))
  }
}
