package graft.core

import scala.collection.mutable

/** S2-style 64-bit hierarchical cell index: cube faces + Hilbert curve.
  *
  * Implements the public S2 cell-id scheme (quadratic cube-to-sphere
  * projection, Hilbert position with 4-bit lookup tables, 3-bit face +
  * 60-bit position + trailing marker bit) from the published algorithm.
  * The reference has no cell index at all (SURVEY.md §2C) — this layer is
  * required by the north rule; only self-consistency is needed, which the
  * property tests in `CellSpec` enforce.
  *
  * Levels 0..30; a cell id's lowest set bit encodes its level.
  */
object Cells {
  final val MaxLevel = 30
  final val MaxSize = 1 << MaxLevel // ij range per face
  private final val LookupBits = 4
  private final val SwapMask = 0x01
  private final val InvertMask = 0x02

  private val PosToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)
  private val PosToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical order
    Array(0, 2, 3, 1), // axes swapped
    Array(3, 2, 0, 1), // bits inverted
    Array(3, 1, 0, 2)) // swapped & inverted

  private val lookupPos = new Array[Int](1 << (2 * LookupBits + 2))
  private val lookupIj = new Array[Int](1 << (2 * LookupBits + 2))

  private def initLookup(level: Int, i: Int, j: Int, origOrientation: Int,
                         pos: Int, orientation: Int): Unit = {
    if (level == LookupBits) {
      val ij = (i << LookupBits) + j
      lookupPos((ij << 2) + origOrientation) = (pos << 2) + orientation
      lookupIj((pos << 2) + origOrientation) = (ij << 2) + orientation
    } else {
      val l = level + 1; val i2 = i << 1; val j2 = j << 1; val p2 = pos << 2
      val r = PosToIJ(orientation)
      var sub = 0
      while (sub < 4) {
        initLookup(l, i2 + (r(sub) >> 1), j2 + (r(sub) & 1), origOrientation,
          p2 + sub, orientation ^ PosToOrientation(sub))
        sub += 1
      }
    }
  }
  initLookup(0, 0, 0, 0, 0, 0)
  initLookup(0, 0, 0, SwapMask, 0, SwapMask)
  initLookup(0, 0, 0, InvertMask, 0, InvertMask)
  initLookup(0, 0, 0, SwapMask | InvertMask, 0, SwapMask | InvertMask)

  // ---------------------------------------------------- projections

  /** Quadratic cube-to-sphere: uv in [-1,1] -> st in [0,1]. */
  def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1)
    else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  def stToIj(s: Double): Int =
    math.max(0, math.min(MaxSize - 1, math.floor(MaxSize * s).toInt))

  def faceUvToXyz(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  def xyzToFaceUv(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val f0 = if (ax > ay) { if (ax > az) 0 else 2 } else { if (ay > az) 1 else 2 }
    val face = f0 match {
      case 0 if x < 0 => 3
      case 1 if y < 0 => 4
      case 2 if z < 0 => 5
      case f => f
    }
    face match {
      case 0 => (0, y / x, z / x)
      case 1 => (1, -x / y, z / y)
      case 2 => (2, -x / z, -y / z)
      case 3 => (3, z / x, y / x)
      case 4 => (4, z / y, -x / y)
      case _ => (5, -y / z, -x / z)
    }
  }

  def lonLatToXyz(lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val lon = math.toRadians(lonDeg); val lat = math.toRadians(latDeg)
    val cl = math.cos(lat)
    (cl * math.cos(lon), cl * math.sin(lon), math.sin(lat))
  }

  def xyzToLonLat(x: Double, y: Double, z: Double): (Double, Double) = {
    val lon = math.toDegrees(math.atan2(y, x))
    val lat = math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))
    (lon, lat)
  }

  // ---------------------------------------------------- id construction

  def fromFaceIj(face: Int, i: Int, j: Int): Long = {
    var n: Long = face.toLong << 60
    var bits = face & SwapMask
    var k = 7
    val mask = (1 << LookupBits) - 1
    while (k >= 0) {
      bits += ((i >> (k * LookupBits)) & mask) << (LookupBits + 2)
      bits += ((j >> (k * LookupBits)) & mask) << 2
      bits = lookupPos(bits)
      n |= (bits >> 2).toLong << (k * 2 * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1
  }

  /** Leaf cell id of a lon/lat point. */
  def leafFromLonLat(lon: Double, lat: Double): Long = {
    val (x, y, z) = lonLatToXyz(lon, lat)
    val (face, u, v) = xyzToFaceUv(x, y, z)
    fromFaceIj(face, stToIj(uvToSt(u)), stToIj(uvToSt(v)))
  }

  /** Cell id of a lon/lat point at the given level. */
  def cellId(lon: Double, lat: Double, level: Int): Long =
    parent(leafFromLonLat(lon, lat), level)

  /** (face, i, j) of a cell id (i/j of its min leaf corner's curve pos). */
  def toFaceIj(id: Long): (Int, Int, Int) = {
    val face = (id >>> 61).toInt
    var i = 0; var j = 0
    var bits = face & SwapMask
    var k = 7
    while (k >= 0) {
      val nbits = if (k == 7) MaxLevel - 7 * LookupBits else LookupBits
      bits += (((id >>> (k * 2 * LookupBits + 1)).toInt &
        ((1 << (2 * nbits)) - 1)) << 2)
      bits = lookupIj(bits)
      i += (bits >> (LookupBits + 2)) << (k * LookupBits)
      j += ((bits >> 2) & ((1 << LookupBits) - 1)) << (k * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    (face, i, j)
  }

  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def lsb(id: Long): Long = id & -id

  def parent(id: Long, lvl: Int): Long = {
    val newLsb = 1L << (2 * (MaxLevel - lvl))
    (id & -newLsb) | newLsb
  }

  def isValid(id: Long): Boolean =
    (id >>> 61) < 6 && (lsb(id) & 0x1555555555555555L) != 0

  def rangeMin(id: Long): Long = id - (lsb(id) - 1)
  def rangeMax(id: Long): Long = id + (lsb(id) - 1)

  def contains(parentId: Long, childId: Long): Boolean =
    childId >= rangeMin(parentId) && childId <= rangeMax(parentId)

  def children(id: Long): Array[Long] = {
    val l = lsb(id)
    require(l > 1, "leaf cell has no children")
    val cl = l >> 2
    Array(id - l + cl, id - l + 3 * cl, id - l + 5 * cl, id - l + 7 * cl)
  }

  /** Center lon/lat of a cell. */
  def centerLonLat(id: Long): (Double, Double) = {
    val (face, i, j) = toFaceIj(id)
    val lvl = level(id)
    val size = 1 << (MaxLevel - lvl)
    // center of the ij square in st space
    val si = (i & -size) + size / 2.0
    val sj = (j & -size) + size / 2.0
    val u = stToUv(si / MaxSize)
    val v = stToUv(sj / MaxSize)
    val (x, y, z) = faceUvToXyz(face, u, v)
    xyzToLonLat(x, y, z)
  }

  // ---------------------------------------------------- neighbors

  /** Leaf cell just past the face edge, wrapped onto the adjacent face
    * (linear projection trick — valid because cells touching the boundary
    * map to u/v = ±1 where linear and quadratic projections agree). */
  private def fromFaceIjWrap(face: Int, i0: Int, j0: Int): Long = {
    val i = math.max(-1, math.min(MaxSize, i0))
    val j = math.max(-1, math.min(MaxSize, j0))
    val kScale = 1.0 / MaxSize
    val kLimit = 1.0 + 2.220446049250313e-16
    val u = math.max(-kLimit, math.min(kLimit, kScale * (2 * (i - MaxSize / 2) + 1)))
    val v = math.max(-kLimit, math.min(kLimit, kScale * (2 * (j - MaxSize / 2) + 1)))
    val (x, y, z) = faceUvToXyz(face, u, v)
    val (f2, u2, v2) = xyzToFaceUv(x, y, z)
    fromFaceIj(f2, stToIjLinear(0.5 * (u2 + 1)), stToIjLinear(0.5 * (v2 + 1)))
  }

  private def stToIjLinear(s: Double): Int =
    math.max(0, math.min(MaxSize - 1, math.round(MaxSize * s - 0.5).toInt))

  private def fromFaceIjSame(face: Int, i: Int, j: Int, same: Boolean): Long =
    if (same) fromFaceIj(face, i, j) else fromFaceIjWrap(face, i, j)

  /** The 4 edge-adjacent neighbors at the same level. */
  def edgeNeighbors(id: Long): Array[Long] = {
    val lvl = level(id)
    val size = 1 << (MaxLevel - lvl)
    val (face, i0, j0) = toFaceIj(id)
    val i = i0 & -size
    val j = j0 & -size
    Array(
      parent(fromFaceIjSame(face, i, j - size, j - size >= 0), lvl),
      parent(fromFaceIjSame(face, i + size, j, i + size < MaxSize), lvl),
      parent(fromFaceIjSame(face, i, j + size, j + size < MaxSize), lvl),
      parent(fromFaceIjSame(face, i - size, j, i - size >= 0), lvl))
  }

  /** Cells within `k` edge-steps (BFS ring union), including the cell. */
  def ringUnion(id: Long, k: Int): Array[Long] = {
    val seen = mutable.LinkedHashSet(id)
    var frontier = List(id)
    var r = 0
    while (r < k) {
      frontier = frontier.flatMap(edgeNeighbors(_)).filterNot(seen.contains)
      frontier.foreach(seen.add)
      r += 1
    }
    seen.toArray
  }

  // ---------------------------------------------------- covering

  /** Conservative LOWER bound of the minimum cell edge length in METERS
    * at a level. Single source of truth for every ring-coverage guarantee
    * (meters-radius join, spherical kNN retirement bound): those proofs
    * need a true under-estimate — an under-estimate only grows the ring,
    * an over-estimate silently drops true neighbors. The 0.5 factor
    * absorbs the quadratic projection's edge-length distortion. */
  def minEdgeMetersLowerBound(level: Int): Double =
    0.5 * (math.Pi / 2) * Measure.EarthRadiusMeters / (1L << level)

  /** Conservative lon/lat bound of a cell from 9 boundary samples, padded
    * by 30% of the span per axis to absorb great-circle edge bulge; cells
    * containing a pole (center cells of faces 2/5) and antimeridian
    * crossers widen to the full lon range. Public so covers can test
    * geometry intersection against it — every cover's soundness
    * ([[coverBox]], [[capCover]], [[coverGeom]]) rests on this bound
    * being a superset of the cell.
    *
    * Pure per cell id and hot in cover descents (every query row's cover
    * re-tests the same coarse cells), so results go through a small
    * per-thread direct-mapped cache. */
  def cellLonLatBound(id: Long): (Double, Double, Double, Double) = {
    // keys live in a parallel long[] — NEVER bit-cast a cell id into a
    // double slot: face-3 ids land in the NaN payload range, and the JVM
    // may canonicalize NaN bits on a double store/load, which could alias
    // a different cell id and silently return wrong bounds (cover
    // soundness rests on this lookup being exact)
    val keys = boundKeyCache.get()
    val cache = boundCache.get()
    val slot = java.lang.Long.hashCode(id) & (BoundCacheSize - 1)
    val v = slot * 4
    if (keys(slot) == id && id != 0L) // slot 0 sentinel: id 0 is not a valid cell
      return (cache(v), cache(v + 1), cache(v + 2), cache(v + 3))
    val r = cellLonLatBoundUncached(id)
    keys(slot) = id
    cache(v) = r._1; cache(v + 1) = r._2
    cache(v + 2) = r._3; cache(v + 3) = r._4
    r
  }

  private val BoundCacheSize = 1 << 12
  private val boundKeyCache = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](BoundCacheSize)
  }
  private val boundCache = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](BoundCacheSize * 4)
  }

  private def cellLonLatBoundUncached(id: Long): (Double, Double, Double, Double) = {
    val (face, i0, j0) = toFaceIj(id)
    val lvl = level(id)
    val size = 1 << (MaxLevel - lvl)
    val i = i0 & -size
    val j = j0 & -size
    var minLon = Double.PositiveInfinity; var maxLon = Double.NegativeInfinity
    var minLat = Double.PositiveInfinity; var maxLat = Double.NegativeInfinity
    var crossesAntimeridian = false
    val samples = Array(0.0, 0.5, 1.0)
    var prevLon = Double.NaN
    for (si <- samples; sj <- samples) {
      val u = stToUv((i + si * size) / MaxSize)
      val v = stToUv((j + sj * size) / MaxSize)
      val (x, y, z) = faceUvToXyz(face, u, v)
      val (lon, lat) = xyzToLonLat(x, y, z)
      if (!prevLon.isNaN && math.abs(lon - prevLon) > 180) crossesAntimeridian = true
      prevLon = lon
      if (lon < minLon) minLon = lon
      if (lon > maxLon) maxLon = lon
      if (lat < minLat) minLat = lat
      if (lat > maxLat) maxLat = lat
    }
    // pole cells: face 2 contains north pole, face 5 south pole
    val containsPole = (face == 2 || face == 5) &&
      i <= MaxSize / 2 && i + size >= MaxSize / 2 &&
      j <= MaxSize / 2 && j + size >= MaxSize / 2
    if (containsPole || crossesAntimeridian) {
      minLon = -180; maxLon = 180
      if (containsPole) { if (face == 2) maxLat = 90 else minLat = -90 }
    }
    val padLat = 0.3 * (maxLat - minLat) + 1e-9
    val padLon = 0.3 * (maxLon - minLon) + 1e-9
    (math.max(-180, minLon - padLon), math.max(-90, minLat - padLat),
      math.min(180, maxLon + padLon), math.min(90, maxLat + padLat))
  }

  /** Cells at `targetLevel` whose (conservative) bound intersects the lon/lat
    * box — a guaranteed superset of the cells containing any point of the
    * box, suitable as a join key cover (over-coverage is refined away by the
    * exact predicate; SURVEY.md §2C). */
  def coverBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
               targetLevel: Int): Array[Long] =
    coverWhere(targetLevel) { (bMinLon, bMinLat, bMaxLon, bMaxLat) =>
      bMinLon <= maxLon && bMaxLon >= minLon && bMinLat <= maxLat && bMaxLat >= minLat
    }

  /** Hierarchical cover: recurse from the 6 face cells, keeping subtrees
    * whose conservative bound satisfies `hit`. Pruning happens at every
    * level, so a diagonal continental polygon never expands the full
    * envelope lattice (the envelope-only cover does). */
  def coverWhere(targetLevel: Int)(
      hit: (Double, Double, Double, Double) => Boolean): Array[Long] = {
    val out = mutable.ArrayBuffer[Long]()
    def recurse(id: Long): Unit = {
      val (a, b, c, d) = cellLonLatBound(id)
      if (!hit(a, b, c, d)) return
      if (level(id) >= targetLevel) { out += id; return }
      children(id).foreach(recurse)
    }
    var face = 0
    while (face < 6) {
      recurse(faceCell(face))
      face += 1
    }
    out.toArray
  }

  /** Cells at `targetLevel` whose bound intersects the spherical CAP of
    * `radiusMeters` around (lonDeg, latDeg) — a guaranteed superset of
    * the cells containing any point within the radius.
    *
    * Unlike ring expansion (`ringUnion`), which counts lattice steps,
    * this is correct across cube-face corners and at any scale: the cap
    * is bounded by latitude `±r/R` (a great circle must traverse that
    * much latitude) and by longitude `±(r/R)/cos(φ*)` where
    * `φ* = |lat| + r/R` bounds the maximum latitude ANY path of length r
    * from the center can reach (the poleward bulge of a connecting arc is
    * covered — a path cannot gain more latitude than its length); near
    * the poles the longitude span saturates to full. The box test then
    * drives the same hierarchical [[coverWhere]] pruning as box covers.
    * Over-coverage is refined away by the caller's exact haversine. */
  def capCover(lonDeg: Double, latDeg: Double, radiusMeters: Double,
               targetLevel: Int): Array[Long] = {
    val rRad = radiusMeters / Measure.EarthRadiusMeters
    val dLatDeg = math.toDegrees(rRad)
    val latLo = latDeg - dLatDeg
    val latHi = latDeg + dLatDeg
    val phiStar = math.toRadians(math.abs(latDeg)) + rRad
    val fullLon = latLo <= -89.9999 || latHi >= 89.9999 ||
      phiStar >= math.Pi / 2 - 1e-9
    val dLonDeg =
      if (fullLon) 180.0
      else math.min(180.0, math.toDegrees(rRad / math.cos(phiStar)))
    // wrap-split longitude intervals
    val lonIntervals: Seq[(Double, Double)] =
      if (dLonDeg >= 180.0) Seq((-180.0, 180.0))
      else {
        val lo = lonDeg - dLonDeg
        val hi = lonDeg + dLonDeg
        if (lo < -180 && hi > 180) Seq((-180.0, 180.0))
        else if (lo < -180) Seq((-180.0, hi), (lo + 360.0, 180.0))
        else if (hi > 180) Seq((lo, 180.0), (-180.0, hi - 360.0))
        else Seq((lo, hi))
      }
    coverWhere(targetLevel) { (bMinLon, bMinLat, bMaxLon, bMaxLat) =>
      bMinLat <= latHi && bMaxLat >= latLo &&
        lonIntervals.exists { case (lo, hi) => bMinLon <= hi && bMaxLon >= lo }
    }
  }

  /** Cell cover of a geometry: envelope-based for points, edge/interior-
    * exact (still conservative) for lines and polygons via
    * [[Pip.boxIntersects]]. */
  def coverGeom(g: Geom, targetLevel: Int): Array[Long] = g.geomType match {
    case GeomTypes.Point =>
      val box = Geom.envelope(g)
      coverBox(box(0), box(1), box(2), box(3), targetLevel)
    case _ =>
      coverWhere(targetLevel)((a, b, c, d) => Pip.boxIntersects(g, a, b, c, d))
  }

  /** Face cell (level 0) id. */
  def faceCell(face: Int): Long = (face.toLong << 61) | (1L << 60)

  /** The (ij,orientation) -> (pos,orientation) Hilbert lookup table, exposed
    * so the DuckDB oracle can be generated from the same 1,024 constants the
    * engine folds with (SparkEntry's cell-index replica). */
  def hilbertLookupPos: Array[Int] = lookupPos.clone()

  /** The inverse (pos,orientation) -> (ij,orientation) table (same purpose,
    * for the oracle's neighbor replica). */
  def hilbertLookupIj: Array[Int] = lookupIj.clone()
}
