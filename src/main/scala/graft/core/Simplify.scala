package graft.core

/** Douglas-Peucker polyline simplification (PostGIS `ST_Simplify`
  * semantics: vertices farther than `eps` from the local chord survive;
  * endpoints always kept). Distances compare as squared point-to-segment
  * distance vs `eps²` — a fixed sequence of correctly-rounded double ops,
  * so keep/drop decisions are deterministic and, on exact fixtures,
  * oracle-replicable (q62). Applies per linestring part and per polygon
  * ring (ring endpoints pinned; a ring that would collapse below 4 points
  * is kept unsimplified rather than emitted invalid). Points/multipoints
  * pass through. */
object Simplify {

  /** Squared distance from p to segment [a, b]. */
  private def d2Seg(px: Double, py: Double, ax: Double, ay: Double,
                    bx: Double, by: Double): Double = {
    val abx = bx - ax; val aby = by - ay
    val apx = px - ax; val apy = py - ay
    val len2 = abx * abx + aby * aby
    val dot = apx * abx + apy * aby
    if (len2 == 0 || dot <= 0) return apx * apx + apy * apy
    if (dot >= len2) {
      val dx = px - bx; val dy = py - by
      return dx * dx + dy * dy
    }
    val cr = apx * aby - apy * abx
    (cr * cr) / len2
  }

  /** DP keep-mask over vertices [from, until) (coords index space);
    * iterative stack, no recursion depth hazard on long lines. */
  private def mask(coords: Array[Double], stride: Int, from: Int, until: Int,
                   eps2: Double): Array[Boolean] = {
    val n = until - from
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val stack = scala.collection.mutable.ArrayDeque((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.removeLast()
      if (hi - lo > 1) {
        val ax = coords((from + lo) * stride); val ay = coords((from + lo) * stride + 1)
        val bx = coords((from + hi) * stride); val by = coords((from + hi) * stride + 1)
        var best = -1
        var bestD2 = eps2
        var i = lo + 1
        while (i < hi) {
          val d2 = d2Seg(coords((from + i) * stride),
            coords((from + i) * stride + 1), ax, ay, bx, by)
          if (d2 > bestD2) { bestD2 = d2; best = i }
          i += 1
        }
        if (best >= 0) {
          keep(best) = true
          stack.append((lo, best))
          stack.append((best, hi))
        }
      }
    }
    keep
  }

  /** Copies kept vertices (all ordinates) of [from, until) into `out`. */
  private def copyKept(coords: Array[Double], stride: Int, from: Int,
                       keep: Array[Boolean],
                       out: scala.collection.mutable.ArrayBuilder[Double]): Int = {
    var kept = 0
    var i = 0
    while (i < keep.length) {
      if (keep(i)) {
        var d = 0
        while (d < stride) { out += coords((from + i) * stride + d); d += 1 }
        kept += 1
      }
      i += 1
    }
    kept
  }

  def simplify(g: Geom, eps: Double): Geom = {
    val eps2 = eps * eps
    val s = g.stride
    g.geomType match {
      case GeomTypes.LineString =>
        val n = g.numCoords
        if (n <= 2) return g
        val out = Array.newBuilder[Double]
        copyKept(g.coords, s, 0, mask(g.coords, s, 0, n, eps2), out)
        Geom(GeomTypes.LineString, g.dims, out.result(), srid = g.srid)
      case GeomTypes.MultiLineString =>
        val out = Array.newBuilder[Double]
        val offs = Array.newBuilder[Int]
        offs += 0
        var total = 0
        var p = 0
        while (p < g.o0.length - 1) {
          val from = g.o0(p); val until = g.o0(p + 1)
          total += (if (until - from <= 2) {
            var i = from
            while (i < until) {
              var d = 0
              while (d < s) { out += g.coords(i * s + d); d += 1 }
              i += 1
            }
            until - from
          } else copyKept(g.coords, s, from, mask(g.coords, s, from, until, eps2), out))
          offs += total
          p += 1
        }
        Geom(GeomTypes.MultiLineString, g.dims, out.result(), offs.result(),
          srid = g.srid)
      case GeomTypes.Polygon =>
        val out = Array.newBuilder[Double]
        val offs = Array.newBuilder[Int]
        offs += 0
        var total = 0
        var r = 0
        while (r < g.o0.length - 1) {
          total += simplifyRing(g, g.o0(r), g.o0(r + 1), eps2, out)
          offs += total
          r += 1
        }
        Geom(GeomTypes.Polygon, g.dims, out.result(), offs.result(),
          srid = g.srid)
      case GeomTypes.MultiPolygon =>
        val out = Array.newBuilder[Double]
        val ringOffs = Array.newBuilder[Int]
        val polyOffs = Array.newBuilder[Int]
        ringOffs += 0
        polyOffs += 0
        var total = 0
        var p = 0
        while (p < g.o0.length - 1) {
          var r = g.o0(p)
          while (r < g.o0(p + 1)) {
            total += simplifyRing(g, g.o1(r), g.o1(r + 1), eps2, out)
            ringOffs += total
            r += 1
          }
          polyOffs += g.o0(p + 1)
          p += 1
        }
        Geom(GeomTypes.MultiPolygon, g.dims, out.result(), polyOffs.result(),
          ringOffs.result(), srid = g.srid)
      case GeomTypes.Collection =>
        if (g.parts == null) g
        else Geom(GeomTypes.Collection, g.dims, Geom.emptyDoubles,
          parts = g.parts.map(simplify(_, eps)), srid = g.srid)
      case _ => g // points/multipoints pass through
    }
  }

  /** Ring vertices appended to `out`; returns the kept count. Endpoints
    * (first == last) pinned; collapse below 4 points keeps the original. */
  private def simplifyRing(g: Geom, from: Int, until: Int, eps2: Double,
                           out: scala.collection.mutable.ArrayBuilder[Double]): Int = {
    val s = g.stride
    val n = until - from
    if (n >= 5) {
      val keep = mask(g.coords, s, from, until, eps2)
      if (keep.count(identity) >= 4) return copyKept(g.coords, s, from, keep, out)
    }
    var i = from
    while (i < until) {
      var d = 0
      while (d < s) { out += g.coords(i * s + d); d += 1 }
      i += 1
    }
    n
  }
}
