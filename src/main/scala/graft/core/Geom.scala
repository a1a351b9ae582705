package graft.core

/** Flat GeoArrow-style geometry value: interleaved coordinates + offset
  * arrays, mirroring the reference's native columnar layouts
  * (`/root/reference/src/geoarrow.c:113-207`, SURVEY.md §1.3) collapsed into
  * a single per-value representation suitable for a Spark SQL struct.
  *
  * Layout by geometry type (stride = 2/3/3/4 for XY/XYZ/XYM/XYZM):
  *  - POINT:            coords has 0 (EMPTY) or `stride` doubles
  *  - LINESTRING:       coords = vertices
  *  - MULTIPOINT:       coords = one vertex per point
  *  - POLYGON:          o0 = ring offsets into coords (nRings+1 entries)
  *  - MULTILINESTRING:  o0 = linestring offsets into coords
  *  - MULTIPOLYGON:     o0 = polygon offsets into rings, o1 = ring offsets
  *                      into coords
  *  - GEOMETRYCOLLECTION: `parts` only (no native flat layout exists in the
  *    reference either — collections stay serialized, SURVEY.md §7)
  *
  * Offsets count *coordinates* (not doubles); coord i spans
  * `coords[i*stride, (i+1)*stride)`.
  */
final class Geom(
    val geomType: Int,
    val dims: Int,
    val srid: Int,
    val coords: Array[Double],
    val o0: Array[Int],
    val o1: Array[Int],
    val parts: Array[Geom]) {

  def stride: Int = Geom.strideOf(dims)
  def numCoords: Int = coords.length / stride

  def isEmpty: Boolean = geomType match {
    case GeomTypes.Collection => parts == null || parts.isEmpty
    case _ => coords.length == 0
  }

  /** Structural equality with raw-bit double comparison (NaN == NaN), the
    * equality the reference's buffer-level tests use (SURVEY.md §5). */
  override def equals(other: Any): Boolean = other match {
    case g: Geom =>
      geomType == g.geomType && dims == g.dims && srid == g.srid &&
        coords.length == g.coords.length &&
        coords.indices.forall(i =>
          java.lang.Double.doubleToRawLongBits(coords(i)) ==
            java.lang.Double.doubleToRawLongBits(g.coords(i))) &&
        java.util.Arrays.equals(o0, g.o0) && java.util.Arrays.equals(o1, g.o1) &&
        ((parts == null && g.parts == null) ||
          (parts != null && g.parts != null && parts.length == g.parts.length &&
            parts.indices.forall(i => parts(i) == g.parts(i))))
    case _ => false
  }

  override def hashCode: Int = {
    var h = geomType * 31 + dims
    coords.foreach(c => h = h * 31 + java.lang.Double.hashCode(c))
    h
  }

  override def toString: String = Wkt.write(this)
}

object GeomTypes {
  val Point = 1
  val LineString = 2
  val Polygon = 3
  val MultiPoint = 4
  val MultiLineString = 5
  val MultiPolygon = 6
  val Collection = 7
  val Box = 990

  def name(t: Int): String = t match {
    case Point => "POINT"
    case LineString => "LINESTRING"
    case Polygon => "POLYGON"
    case MultiPoint => "MULTIPOINT"
    case MultiLineString => "MULTILINESTRING"
    case MultiPolygon => "MULTIPOLYGON"
    case Collection => "GEOMETRYCOLLECTION"
    case _ => throw new IllegalArgumentException(s"unknown geometry type $t")
  }
}

object Dims {
  val XY = 1
  val XYZ = 2
  val XYM = 3
  val XYZM = 4

  /** ISO-WKB dimension code offset: XY->0, XYZ->1000, XYM->2000, XYZM->3000
    * (`/root/reference/src/geoarrow.c:1630-1633`). */
  def isoOffset(d: Int): Int = (d - 1) * 1000

  def tag(d: Int): String = d match {
    case XY => ""
    case XYZ => "Z"
    case XYM => "M"
    case XYZM => "ZM"
  }
}

object Geom {
  val emptyInts: Array[Int] = Array.empty[Int]
  val emptyDoubles: Array[Double] = Array.empty[Double]
  private val zeroOffsets: Array[Int] = Array(0)

  def strideOf(dims: Int): Int = dims match {
    case Dims.XY => 2
    case Dims.XYZ | Dims.XYM => 3
    case Dims.XYZM => 4
    case d => throw new IllegalArgumentException(s"unknown dims $d")
  }

  def apply(geomType: Int, dims: Int, coords: Array[Double],
            o0: Array[Int] = emptyInts, o1: Array[Int] = emptyInts,
            parts: Array[Geom] = null, srid: Int = 0): Geom = {
    // Offset arrays carry n+1 entries; an empty one (the default, for an
    // EMPTY nested geometry) normalizes to [0] so ring/part counts are 0,
    // never -1 — a raw empty array would make the WKB writer under-allocate
    // and emit a negative count.
    import GeomTypes._
    val n0 = if (o0.isEmpty && (geomType == Polygon ||
      geomType == MultiLineString || geomType == MultiPolygon)) zeroOffsets else o0
    val n1 = if (o1.isEmpty && geomType == MultiPolygon) zeroOffsets else o1
    new Geom(geomType, dims, srid, coords, n0, n1, parts)
  }

  def point(x: Double, y: Double): Geom =
    apply(GeomTypes.Point, Dims.XY, Array(x, y))

  /** ISO-WKB type code `isoOffset(dims) + type`, the id space the
    * unique-types kernel reports (`/root/reference/src/geoarrow.c:1630-1633`). */
  def isoTypeId(g: Geom): Int = Dims.isoOffset(g.dims) + g.geomType

  // ---------------------------------------------------------------------
  // Casts — reference native-writer semantics
  // (`/root/reference/src/geoarrow.c:3729-4495`, SURVEY.md §2A W3)
  // ---------------------------------------------------------------------

  /** Change dimensions, NaN-filling ordinates absent in the source
    * (`/root/reference/src/r-sf-compat.c:87-96`; XY+XYZ -> XYZ etc.).
    * M and Z are positional: target ordinate j takes source ordinate j when
    * the source has one, else NaN — matching the reference's coord-view copy. */
  def castDims(g: Geom, toDims: Int): Geom = {
    if (g.dims == toDims) return g
    if (g.geomType == GeomTypes.Collection) {
      return apply(GeomTypes.Collection, toDims,
        emptyDoubles, emptyInts, emptyInts,
        if (g.parts == null) null else g.parts.map(castDims(_, toDims)), g.srid)
    }
    val sFrom = strideOf(g.dims)
    val sTo = strideOf(toDims)
    val n = g.coords.length / sFrom
    val out = new Array[Double](n * sTo)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < sTo) {
        out(i * sTo + j) = copyOrdinate(g.dims, toDims, g.coords, i * sFrom, j)
        j += 1
      }
      i += 1
    }
    new Geom(g.geomType, toDims, g.srid, out, g.o0, g.o1, null)
  }

  /** Ordinate j of the target dim layout, pulled from the right source slot:
    * x,y always map; z maps to z; m maps to m; absent -> NaN. */
  private def copyOrdinate(fromDims: Int, toDims: Int, src: Array[Double],
                           base: Int, j: Int): Double = {
    def slot(dims: Int, ord: Char): Int = (dims, ord) match {
      case (_, 'x') => 0
      case (_, 'y') => 1
      case (Dims.XYZ, 'z') => 2
      case (Dims.XYZM, 'z') => 2
      case (Dims.XYM, 'm') => 2
      case (Dims.XYZM, 'm') => 3
      case _ => -1
    }
    val ords = toDims match {
      case Dims.XY => "xy"
      case Dims.XYZ => "xyz"
      case Dims.XYM => "xym"
      case Dims.XYZM => "xyzm"
    }
    val ord = ords.charAt(j)
    val s = slot(fromDims, ord)
    if (s < 0) Double.NaN else src(base + s)
  }

  /** Geometry-type cast with the reference's promotion/demotion rules:
    * single -> its multi; multi with exactly one part -> single; anything
    * else errors like the native writer
    * (`/root/reference/src/geoarrow.c:3952-4075`). */
  def castType(g: Geom, toType: Int): Geom = {
    import GeomTypes._
    if (g.geomType == toType) return g
    (g.geomType, toType) match {
      case (Point, MultiPoint) =>
        new Geom(MultiPoint, g.dims, g.srid, g.coords, emptyInts, emptyInts, null)
      case (MultiPoint, Point) =>
        if (g.numCoords > 1)
          throw new IllegalArgumentException(
            "Can't convert feature with >1 coordinate to POINT")
        new Geom(Point, g.dims, g.srid, g.coords, emptyInts, emptyInts, null)
      case (LineString, MultiLineString) =>
        new Geom(MultiLineString, g.dims, g.srid, g.coords,
          Array(0, g.numCoords), emptyInts, null)
      case (MultiLineString, LineString) =>
        if (g.o0.length > 2)
          throw new IllegalArgumentException(
            "Can't convert feature with >1 sequence to LINESTRING")
        new Geom(LineString, g.dims, g.srid, g.coords, emptyInts, emptyInts, null)
      case (Polygon, MultiPolygon) =>
        new Geom(MultiPolygon, g.dims, g.srid, g.coords,
          Array(0, g.o0.length - 1), g.o0, null)
      case (MultiPolygon, Polygon) =>
        if (g.o0.length > 2)
          throw new IllegalArgumentException(
            "Can't convert feature with >1 polygon to POLYGON")
        new Geom(Polygon, g.dims, g.srid, g.coords, g.o1, emptyInts, null)
      case _ =>
        throw new IllegalArgumentException(
          s"Can't convert ${GeomTypes.name(g.geomType)} to ${GeomTypes.name(toType)}")
    }
  }

  /** Parts of a multi/collection geometry in storage order (PostGIS
    * ST_Dump semantics): atomic inputs dump as themselves, collections
    * recurse to atomic parts, EMPTY multis dump to zero parts. */
  def dump(g: Geom): Array[Geom] = g.geomType match {
    case GeomTypes.MultiPoint =>
      val s = g.stride
      Array.tabulate(g.numCoords) { i =>
        new Geom(GeomTypes.Point, g.dims, g.srid,
          java.util.Arrays.copyOfRange(g.coords, i * s, (i + 1) * s),
          emptyInts, emptyInts, null)
      }
    case GeomTypes.MultiLineString =>
      val s = g.stride
      Array.tabulate(math.max(0, g.o0.length - 1)) { i =>
        new Geom(GeomTypes.LineString, g.dims, g.srid,
          java.util.Arrays.copyOfRange(g.coords, g.o0(i) * s, g.o0(i + 1) * s),
          emptyInts, emptyInts, null)
      }
    case GeomTypes.MultiPolygon =>
      val s = g.stride
      Array.tabulate(math.max(0, g.o0.length - 1)) { i =>
        val ringLo = g.o0(i); val ringHi = g.o0(i + 1)
        val coordBase = g.o1(ringLo)
        val rings = java.util.Arrays.copyOfRange(g.o1, ringLo, ringHi + 1)
          .map(_ - coordBase)
        new Geom(GeomTypes.Polygon, g.dims, g.srid,
          java.util.Arrays.copyOfRange(g.coords,
            coordBase * s, g.o1(ringHi) * s),
          rings, emptyInts, null)
      }
    case GeomTypes.Collection =>
      if (g.parts == null) Array.empty else g.parts.flatMap(dump)
    case _ => Array(g)
  }

  /** Assemble parts into one geometry, order-preserving: uniform
    * non-empty single-type parts build the flat MULTI; anything else
    * (mixed types/dims, empties, multis as inputs) nests as a
    * GEOMETRYCOLLECTION. No parts → GEOMETRYCOLLECTION EMPTY. */
  def collect(parts: Seq[Geom]): Geom = {
    if (parts.isEmpty)
      return new Geom(GeomTypes.Collection, Dims.XY, 0, emptyDoubles,
        emptyInts, emptyInts, Array.empty)
    val t = parts.head.geomType
    val d = parts.head.dims
    // PostGIS ST_Collect SRID semantics: a uniform SRID carries through;
    // mixed SRIDs fall back to 0 (PostGIS errors — this engine treats the
    // tag as advisory everywhere else, so dropping to 0 is consistent)
    val s0 = parts.head.srid
    val srid = if (parts.forall(_.srid == s0)) s0 else 0
    val uniform = parts.forall(p =>
      p.geomType == t && p.dims == d && !p.isEmpty)
    if (uniform && t == GeomTypes.Point)
      new Geom(GeomTypes.MultiPoint, d, srid,
        parts.iterator.flatMap(_.coords).toArray, emptyInts, emptyInts, null)
    else if (uniform && t == GeomTypes.LineString) {
      val coords = parts.iterator.flatMap(_.coords).toArray
      val offs = parts.scanLeft(0)((acc, p) => acc + p.numCoords).toArray
      new Geom(GeomTypes.MultiLineString, d, srid, coords, offs, emptyInts,
        null)
    } else if (uniform && t == GeomTypes.Polygon) {
      val coords = parts.iterator.flatMap(_.coords).toArray
      val o0 = parts.scanLeft(0)((acc, p) => acc + p.o0.length - 1).toArray
      val o1 = scala.collection.mutable.ArrayBuffer(0)
      var base = 0
      parts.foreach { p =>
        p.o0.drop(1).foreach(r => o1 += base + r)
        base += p.numCoords
      }
      new Geom(GeomTypes.MultiPolygon, d, srid, coords, o0, o1.toArray, null)
    } else
      new Geom(GeomTypes.Collection, d, srid, emptyDoubles, emptyInts,
        emptyInts, parts.toArray)
  }

  /** Reverse vertex order (PostGIS ST_Reverse): per coordinate sequence —
    * linestrings flip end-to-end, polygon rings reverse winding in place,
    * multipoints flip part order, collections recurse. Coordinates are
    * moved verbatim (bit-exact). */
  /** Collapse runs of identical consecutive points — PostGIS
    * `ST_RemoveRepeatedPoints` at tolerance 0, compared on EVERY ordinate
    * (value equality: -0.0 == 0.0 collapses, NaN never collapses so
    * NaN-filled casts pass through). The trajectory / dirty-ring cleanup
    * pass: duplicate pings and double-digitized vertices drop, measures
    * are unchanged (a zero-length segment contributes exactly 0.0 to
    * st_length). Rings stay closed: the closing vertex can only collapse
    * into a trailing run whose first element is kept, and the leading
    * vertex always survives; an all-identical ring collapses to a single
    * point (pathological input is NOT silently repaired, matching the
    * engine's policy elsewhere). Points pass through; collections
    * recurse. */
  def removeRepeated(g: Geom): Geom = {
    if (g.geomType == GeomTypes.Point) return g
    if (g.geomType == GeomTypes.Collection)
      return new Geom(g.geomType, g.dims, g.srid, g.coords, g.o0, g.o1,
        if (g.parts == null) null else g.parts.map(removeRepeated))
    if (g.coords.isEmpty) return g
    val s = g.stride
    val n = g.numCoords
    val keep = new Array[Boolean](n)
    def mark(from: Int, to: Int): Unit = {
      var last = -1
      var i = from
      while (i < to) {
        var same = last >= 0
        var d = 0
        while (same && d < s) {
          same = g.coords(i * s + d) == g.coords(last * s + d)
          d += 1
        }
        if (!same) { keep(i) = true; last = i }
        i += 1
      }
    }
    g.geomType match {
      case GeomTypes.LineString | GeomTypes.MultiPoint => mark(0, n)
      case GeomTypes.Polygon | GeomTypes.MultiLineString =>
        var r = 0
        while (r < g.o0.length - 1) { mark(g.o0(r), g.o0(r + 1)); r += 1 }
      case GeomTypes.MultiPolygon =>
        var r = 0
        while (r < g.o1.length - 1) { mark(g.o1(r), g.o1(r + 1)); r += 1 }
      case _ => return g
    }
    val newIdx = new Array[Int](n + 1)
    var kept = 0
    var i = 0
    while (i < n) { newIdx(i) = kept; if (keep(i)) kept += 1; i += 1 }
    newIdx(n) = kept
    if (kept == n) return g
    val out = new Array[Double](kept * s)
    var w = 0
    i = 0
    while (i < n) {
      if (keep(i)) {
        var d = 0
        while (d < s) { out(w * s + d) = g.coords(i * s + d); d += 1 }
        w += 1
      }
      i += 1
    }
    g.geomType match {
      case GeomTypes.MultiPolygon =>
        // o0 indexes rings (counts unchanged); o1 holds coord offsets
        new Geom(g.geomType, g.dims, g.srid, out, g.o0, g.o1.map(newIdx), null)
      case GeomTypes.Polygon | GeomTypes.MultiLineString =>
        new Geom(g.geomType, g.dims, g.srid, out, g.o0.map(newIdx), g.o1, null)
      case _ =>
        new Geom(g.geomType, g.dims, g.srid, out, g.o0, g.o1, null)
    }
  }

  def reverse(g: Geom): Geom = {
    if (g.geomType == GeomTypes.Collection)
      return new Geom(g.geomType, g.dims, g.srid, g.coords, g.o0, g.o1,
        if (g.parts == null) null else g.parts.map(reverse))
    val s = g.stride
    val out = new Array[Double](g.coords.length)
    def reverseRange(fromCoord: Int, toCoord: Int): Unit = {
      var i = 0
      val n = toCoord - fromCoord
      while (i < n) {
        var d = 0
        while (d < s) {
          out((fromCoord + i) * s + d) = g.coords((toCoord - 1 - i) * s + d)
          d += 1
        }
        i += 1
      }
    }
    g.geomType match {
      case GeomTypes.Point =>
        return g
      case GeomTypes.LineString | GeomTypes.MultiPoint =>
        reverseRange(0, g.numCoords)
      case GeomTypes.Polygon =>
        var r = 0
        while (r < g.o0.length - 1) { reverseRange(g.o0(r), g.o0(r + 1)); r += 1 }
      case GeomTypes.MultiLineString =>
        var p = 0
        while (p < g.o0.length - 1) { reverseRange(g.o0(p), g.o0(p + 1)); p += 1 }
      case GeomTypes.MultiPolygon =>
        var r = 0
        while (r < g.o1.length - 1) { reverseRange(g.o1(r), g.o1(r + 1)); r += 1 }
      case _ => return g
    }
    new Geom(g.geomType, g.dims, g.srid, out, g.o0, g.o1, null)
  }

  /** Planar affine transform `x' = a·x + b·y + xoff, y' = d·x + e·y + yoff`
    * (PostGIS ST_Affine's 2D form; ST_Translate/ST_Scale are the
    * axis-aligned specializations). Evaluation order is fixed —
    * `(a*x + b*y) + off`, left-associated doubles — so the oracle can
    * replicate every transformed ordinate bit-exactly. Z/M preserved. */
  def affine(g: Geom, a: Double, b: Double, d: Double, e: Double,
             xoff: Double, yoff: Double): Geom = {
    if (g.geomType == GeomTypes.Collection)
      return new Geom(g.geomType, g.dims, g.srid, g.coords, g.o0, g.o1,
        if (g.parts == null) null
        else g.parts.map(affine(_, a, b, d, e, xoff, yoff)))
    val s = g.stride
    val out = g.coords.clone()
    var i = 0
    while (i < out.length) {
      val x = g.coords(i); val y = g.coords(i + 1)
      out(i) = a * x + b * y + xoff
      out(i + 1) = d * x + e * y + yoff
      i += s
    }
    new Geom(g.geomType, g.dims, g.srid, out, g.o0, g.o1, null)
  }

  /** Snap coordinates to a precision grid: `round(v*p)/p` with C `round`
    * (half away from zero) semantics (`/root/reference/src/r-sf-compat.c:8-25`). */
  def snapToGrid(g: Geom, precision: Double): Geom = {
    if (precision <= 0 || precision.isNaN) return g
    // exact half-away-from-zero (C round() semantics — no `floor(x+0.5)`
    // which misrounds values one ulp below a half)
    def roundHalfAway(v: Double): Double = {
      val a = Math.abs(v)
      val f = Math.floor(a)
      val r = if (a - f >= 0.5) f + 1.0 else f
      Math.copySign(r, v)
    }
    def snap(v: Double): Double =
      if (v.isNaN || v.isInfinite) v
      else roundHalfAway(v * precision) / precision
    if (g.geomType == GeomTypes.Collection) {
      return new Geom(g.geomType, g.dims, g.srid, g.coords, g.o0, g.o1,
        if (g.parts == null) null else g.parts.map(snapToGrid(_, precision)))
    }
    val out = new Array[Double](g.coords.length)
    var i = 0
    while (i < out.length) { out(i) = snap(g.coords(i)); i += 1 }
    new Geom(g.geomType, g.dims, g.srid, out, g.o0, g.o1, null)
  }

  /** Per-feature 2D bounding box (kernel K7,
    * `/root/reference/src/geoarrow.c:1912-1934`). EMPTY -> inverted box
    * (+inf mins / -inf maxes), like an empty accumulator. */
  def envelope(g: Geom): Array[Double] = {
    val box = Array(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)
    accumulateEnvelope(g, box)
    box
  }

  def accumulateEnvelope(g: Geom, box: Array[Double]): Unit = {
    if (g.geomType == GeomTypes.Collection) {
      if (g.parts != null) g.parts.foreach(accumulateEnvelope(_, box))
    } else {
      val s = g.stride
      var i = 0
      while (i < g.coords.length) {
        val x = g.coords(i); val y = g.coords(i + 1)
        if (x < box(0)) box(0) = x
        if (y < box(1)) box(1) = y
        if (x > box(2)) box(2) = x
        if (y > box(3)) box(3) = y
        i += s
      }
    }
  }
}
