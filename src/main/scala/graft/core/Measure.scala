package graft.core

/** Planar measurement kernels: area (shoelace, shell minus holes), length
  * (linestring arc length), perimeter (polygon ring lengths), and
  * area-weighted centroid. The reference is codec-only — these are the
  * standard relational-surface measures a geospatial engine needs (PostGIS
  * naming/semantics). All planar (the `PlanarEdgesGuard` conventions
  * apply); summation order is the storage order, so results are
  * deterministic and, on exact inputs, oracle-replicable.
  */
object Measure {

  /** Signed shoelace sum of ring [from, until) (in coords): twice the
    * signed area. Summation in vertex order. */
  private def shoelace2(coords: Array[Double], stride: Int, from: Int,
                        until: Int): Double = {
    var s = 0.0
    var i = from
    while (i < until - 1) {
      val x0 = coords(i * stride); val y0 = coords(i * stride + 1)
      val x1 = coords((i + 1) * stride); val y1 = coords((i + 1) * stride + 1)
      s += x0 * y1 - x1 * y0
      i += 1
    }
    s
  }

  private def ringLength(coords: Array[Double], stride: Int, from: Int,
                         until: Int): Double = {
    var s = 0.0
    var i = from
    while (i < until - 1) {
      val dx = coords((i + 1) * stride) - coords(i * stride)
      val dy = coords((i + 1) * stride + 1) - coords(i * stride + 1)
      s += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    s
  }

  /** Polygon area: |shell| minus |holes| (first ring is the shell —
    * winding-agnostic, the convention GEOS/sf apply to well-formed rings);
    * multipolygons sum; everything else is 0. */
  def area(g: Geom): Double = {
    val s = g.stride
    g.geomType match {
      case GeomTypes.Polygon =>
        var a = 0.0
        var r = 0
        while (r < g.o0.length - 1) {
          val ringA = math.abs(shoelace2(g.coords, s, g.o0(r), g.o0(r + 1))) * 0.5
          a += (if (r == 0) ringA else -ringA)
          r += 1
        }
        a
      case GeomTypes.MultiPolygon =>
        var a = 0.0
        var p = 0
        while (p < g.o0.length - 1) {
          var r = g.o0(p)
          while (r < g.o0(p + 1)) {
            val ringA = math.abs(shoelace2(g.coords, s, g.o1(r), g.o1(r + 1))) * 0.5
            a += (if (r == g.o0(p)) ringA else -ringA)
            r += 1
          }
          p += 1
        }
        a
      case GeomTypes.Collection =>
        if (g.parts == null) 0.0 else g.parts.map(area).sum
      case _ => 0.0
    }
  }

  /** Arc length of (multi)linestrings; 0 for everything else (use
    * [[perimeter]] for polygon boundaries, PostGIS semantics). */
  def length(g: Geom): Double = {
    val s = g.stride
    g.geomType match {
      case GeomTypes.LineString => ringLength(g.coords, s, 0, g.numCoords)
      case GeomTypes.MultiLineString =>
        var l = 0.0
        var p = 0
        while (p < g.o0.length - 1) {
          l += ringLength(g.coords, s, g.o0(p), g.o0(p + 1)); p += 1
        }
        l
      case GeomTypes.Collection =>
        if (g.parts == null) 0.0 else g.parts.map(length).sum
      case _ => 0.0
    }
  }

  /** Total ring length of (multi)polygons (shell + holes); 0 otherwise. */
  def perimeter(g: Geom): Double = {
    val s = g.stride
    g.geomType match {
      case GeomTypes.Polygon =>
        var l = 0.0
        var r = 0
        while (r < g.o0.length - 1) {
          l += ringLength(g.coords, s, g.o0(r), g.o0(r + 1)); r += 1
        }
        l
      case GeomTypes.MultiPolygon =>
        var l = 0.0
        var r = 0
        while (r < g.o1.length - 1) {
          l += ringLength(g.coords, s, g.o1(r), g.o1(r + 1)); r += 1
        }
        l
      case GeomTypes.Collection =>
        if (g.parts == null) 0.0 else g.parts.map(perimeter).sum
      case _ => 0.0
    }
  }

  /** Area-weighted centroid (x, y) of a polygon/multipolygon; vertex mean
    * for points/lines; NaNs for EMPTY. Standard planar formula:
    * c = Σ (p_i + p_{i+1}) * cross_i / (6A), holes subtracting (signed
    * shoelace keeps the sign convention consistent per ring). */
  def centroid(g: Geom): (Double, Double) = {
    val s = g.stride
    g.geomType match {
      case GeomTypes.Polygon | GeomTypes.MultiPolygon =>
        // accumulate signed ring moments; shell/hole handling falls out of
        // consistent winding (well-formed inputs); normalize by total 6A
        var a2 = 0.0; var cx = 0.0; var cy = 0.0
        def ring(from: Int, until: Int, sign: Double): Unit = {
          val sgn = if (shoelace2(g.coords, s, from, until) >= 0) sign else -sign
          var i = from
          while (i < until - 1) {
            val x0 = g.coords(i * s); val y0 = g.coords(i * s + 1)
            val x1 = g.coords((i + 1) * s); val y1 = g.coords((i + 1) * s + 1)
            val cr = (x0 * y1 - x1 * y0) * sgn
            a2 += cr
            cx += (x0 + x1) * cr
            cy += (y0 + y1) * cr
            i += 1
          }
        }
        if (g.geomType == GeomTypes.Polygon) {
          var r = 0
          while (r < g.o0.length - 1) {
            ring(g.o0(r), g.o0(r + 1), if (r == 0) 1.0 else -1.0); r += 1
          }
        } else {
          var p = 0
          while (p < g.o0.length - 1) {
            var r = g.o0(p)
            while (r < g.o0(p + 1)) {
              ring(g.o1(r), g.o1(r + 1), if (r == g.o0(p)) 1.0 else -1.0)
              r += 1
            }
            p += 1
          }
        }
        if (a2 == 0.0) vertexMean(g) else (cx / (3.0 * a2), cy / (3.0 * a2))
      case _ => vertexMean(g)
    }
  }

  private def vertexMean(g: Geom): (Double, Double) = {
    val s = g.stride
    val n = g.numCoords
    if (n == 0) return (Double.NaN, Double.NaN)
    var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < n) { sx += g.coords(i * s); sy += g.coords(i * s + 1); i += 1 }
    (sx / n, sy / n)
  }
}
