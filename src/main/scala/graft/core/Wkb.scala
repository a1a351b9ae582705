package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** WKB reader/writer.
  *
  * Reader accepts ISO WKB and EWKB in either byte order, mirroring
  * `/root/reference/src/geoarrow.c:4497-4751`:
  *  - per-geometry endianness byte with big-endian swap (`4505-4517`)
  *  - EWKB high-bit flags Z=0x80000000 M=0x40000000 SRID=0x20000000; the
  *    SRID is read and recorded (the reference drops it, `4569-4587`)
  *  - ISO 1000/2000/3000 dimension codes (`4589-4602`)
  *  - recursion capped at 255 (`4642-4670`)
  *
  * Writer always emits native little-endian ISO WKB (`4775-4777`); POINT
  * EMPTY is written as all-NaN coordinates (`4779-4788`).
  */
object Wkb {

  private val EwkbZ = 0x80000000
  private val EwkbM = 0x40000000
  private val EwkbSrid = 0x20000000

  // ------------------------------------------------------------------ read

  def parse(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    val g = readGeom(buf, 0)
    g
  }

  private def readGeom(buf: ByteBuffer, depth: Int): Geom = {
    if (depth > 255)
      throw new IllegalArgumentException("WKB nesting exceeds 255 levels")
    val endian = buf.get()
    buf.order(if (endian == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    var code = buf.getInt
    var srid = 0
    var dims = Dims.XY
    if ((code & (EwkbZ | EwkbM | EwkbSrid)) != 0) {
      val hasZ = (code & EwkbZ) != 0
      val hasM = (code & EwkbM) != 0
      dims =
        if (hasZ && hasM) Dims.XYZM
        else if (hasZ) Dims.XYZ
        else if (hasM) Dims.XYM
        else Dims.XY
      if ((code & EwkbSrid) != 0) srid = buf.getInt
      code = code & 0x0000ffff
    } else {
      dims = (code / 1000) match {
        case 0 => Dims.XY
        case 1 => Dims.XYZ
        case 2 => Dims.XYM
        case 3 => Dims.XYZM
        case _ => throw new IllegalArgumentException(s"invalid WKB type code $code")
      }
      code = code % 1000
    }
    val stride = Geom.strideOf(dims)
    code match {
      case GeomTypes.Point =>
        val coords = new Array[Double](stride)
        var j = 0
        while (j < stride) { coords(j) = buf.getDouble; j += 1 }
        new Geom(GeomTypes.Point, dims, srid, coords, Geom.emptyInts,
          Geom.emptyInts, null)
      case GeomTypes.LineString =>
        val n = buf.getInt
        new Geom(GeomTypes.LineString, dims, srid, readCoords(buf, n, stride),
          Geom.emptyInts, Geom.emptyInts, null)
      case GeomTypes.Polygon =>
        val (coords, offs) = readRings(buf, stride)
        new Geom(GeomTypes.Polygon, dims, srid, coords, offs, Geom.emptyInts, null)
      case GeomTypes.MultiPoint =>
        val n = checkedCount(buf, 5 + 8 * stride)
        val coords = new Array[Double](n * stride)
        var i = 0
        while (i < n) {
          val pt = readGeom(buf, depth + 1)
          if (pt.geomType != GeomTypes.Point)
            throw new IllegalArgumentException("MULTIPOINT child is not a POINT")
          copyAtDims(pt, coords, i * stride, dims)
          i += 1
        }
        new Geom(GeomTypes.MultiPoint, dims, srid, coords, Geom.emptyInts,
          Geom.emptyInts, null)
      case GeomTypes.MultiLineString =>
        val n = checkedCount(buf, 9)
        val coords = new ArrayBuffer[Double]()
        val offs = new Array[Int](n + 1)
        var i = 0
        while (i < n) {
          val ls = readGeom(buf, depth + 1)
          if (ls.geomType != GeomTypes.LineString)
            throw new IllegalArgumentException(
              "MULTILINESTRING child is not a LINESTRING")
          appendAtDims(ls, coords, dims)
          offs(i + 1) = coords.length / stride
          i += 1
        }
        new Geom(GeomTypes.MultiLineString, dims, srid, coords.toArray, offs,
          Geom.emptyInts, null)
      case GeomTypes.MultiPolygon =>
        val n = checkedCount(buf, 9)
        val coords = new ArrayBuffer[Double]()
        val o0 = new Array[Int](n + 1)
        val o1 = new ArrayBuffer[Int](); o1 += 0
        var i = 0
        while (i < n) {
          val pg = readGeom(buf, depth + 1)
          if (pg.geomType != GeomTypes.Polygon)
            throw new IllegalArgumentException("MULTIPOLYGON child is not a POLYGON")
          val base = coords.length / stride
          appendAtDims(pg, coords, dims)
          var r = 1
          while (r < pg.o0.length) { o1 += base + pg.o0(r); r += 1 }
          o0(i + 1) = o1.length - 1
          i += 1
        }
        new Geom(GeomTypes.MultiPolygon, dims, srid, coords.toArray, o0,
          o1.toArray, null)
      case GeomTypes.Collection =>
        val n = checkedCount(buf, 9)
        val parts = new Array[Geom](n)
        var i = 0
        while (i < n) { parts(i) = readGeom(buf, depth + 1); i += 1 }
        new Geom(GeomTypes.Collection, dims, srid, Geom.emptyDoubles,
          Geom.emptyInts, Geom.emptyInts, parts)
      case other =>
        throw new IllegalArgumentException(s"invalid WKB geometry type $other")
    }
  }

  /** Nested WKB children may carry their own dim codes; coerce to the
    * parent's dims, NaN-filling like the reference's coord copy. */
  private def copyAtDims(child: Geom, out: Array[Double], at: Int, dims: Int): Unit = {
    val c = if (child.dims == dims) child else Geom.castDims(child, dims)
    System.arraycopy(c.coords, 0, out, at, Geom.strideOf(dims))
  }

  private def appendAtDims(child: Geom, out: ArrayBuffer[Double], dims: Int): Unit = {
    val c = if (child.dims == dims) child else Geom.castDims(child, dims)
    out ++= c.coords
  }

  /** Element-count header sanity: a count claiming more elements than the
    * remaining bytes could hold (at `minBytes` each) is corrupt — reject
    * before allocating (fuzz-input hardening for `st_trygeomfromwkb`). */
  private def checkedCount(buf: ByteBuffer, minBytes: Int): Int = {
    val n = buf.getInt
    if (n < 0 || n.toLong * minBytes > buf.remaining())
      throw new IllegalArgumentException(s"invalid WKB element count $n")
    n
  }

  private def readCoords(buf: ByteBuffer, n: Int, stride: Int): Array[Double] = {
    if (n < 0 || n.toLong * 8 * stride > buf.remaining())
      throw new IllegalArgumentException(s"invalid WKB coordinate count $n")
    val coords = new Array[Double](n * stride)
    var i = 0
    while (i < coords.length) { coords(i) = buf.getDouble; i += 1 }
    coords
  }

  private def readRings(buf: ByteBuffer, stride: Int): (Array[Double], Array[Int]) = {
    val nRings = buf.getInt
    if (nRings < 0 || nRings.toLong * 4 > buf.remaining())
      throw new IllegalArgumentException(s"invalid WKB ring count $nRings")
    val coords = new ArrayBuffer[Double]()
    val offs = new Array[Int](nRings + 1)
    var r = 0
    while (r < nRings) {
      val n = buf.getInt
      val c = readCoords(buf, n, stride)
      coords ++= c
      offs(r + 1) = coords.length / stride
      r += 1
    }
    (coords.toArray, offs)
  }

  // ----------------------------------------------------------------- write

  def write(g: Geom): Array[Byte] = {
    val size = measure(g)
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    writeGeom(buf, g)
    buf.array()
  }

  private def isoCode(g: Geom): Int = Dims.isoOffset(g.dims) + g.geomType

  // offset arrays are n+1 entries; Geom.apply normalizes empties to [0],
  // but a hand-built `new Geom` can still carry a raw empty array — clamp
  // so counts never go to -1 (which would under-allocate + write putInt(-1))
  private def nOf(offs: Array[Int]): Int = math.max(0, offs.length - 1)

  private def measure(g: Geom): Int = {
    val stride = g.stride
    g.geomType match {
      case GeomTypes.Point => 5 + 8 * stride
      case GeomTypes.LineString => 9 + 8 * g.coords.length
      case GeomTypes.Polygon => 9 + 4 * nOf(g.o0) + 8 * g.coords.length
      case GeomTypes.MultiPoint => 9 + g.numCoords * (5 + 8 * stride)
      case GeomTypes.MultiLineString =>
        9 + nOf(g.o0) * 9 + 8 * g.coords.length
      case GeomTypes.MultiPolygon =>
        9 + nOf(g.o0) * 9 + 4 * nOf(g.o1) + 8 * g.coords.length
      case GeomTypes.Collection =>
        9 + (if (g.parts == null) 0 else g.parts.map(measure).sum)
      case other =>
        throw new IllegalArgumentException(s"cannot write geometry type $other")
    }
  }

  private def writeGeom(buf: ByteBuffer, g: Geom): Unit = {
    buf.put(1.toByte)
    buf.putInt(isoCode(g))
    val stride = g.stride
    g.geomType match {
      case GeomTypes.Point =>
        if (g.coords.isEmpty) {
          // POINT EMPTY -> NaN fill (`/root/reference/src/geoarrow.c:4779-4788`)
          var j = 0
          while (j < stride) { buf.putDouble(Double.NaN); j += 1 }
        } else {
          var j = 0
          while (j < stride) { buf.putDouble(g.coords(j)); j += 1 }
        }
      case GeomTypes.LineString =>
        buf.putInt(g.numCoords)
        putCoords(buf, g.coords, 0, g.coords.length)
      case GeomTypes.Polygon =>
        putRings(buf, g.coords, g.o0, 0, nOf(g.o0), stride)
      case GeomTypes.MultiPoint =>
        val n = g.numCoords
        buf.putInt(n)
        val code = Dims.isoOffset(g.dims) + GeomTypes.Point
        var i = 0
        while (i < n) {
          buf.put(1.toByte); buf.putInt(code)
          putCoords(buf, g.coords, i * stride, stride)
          i += 1
        }
      case GeomTypes.MultiLineString =>
        val n = nOf(g.o0)
        buf.putInt(n)
        val code = Dims.isoOffset(g.dims) + GeomTypes.LineString
        var i = 0
        while (i < n) {
          buf.put(1.toByte); buf.putInt(code)
          buf.putInt(g.o0(i + 1) - g.o0(i))
          putCoords(buf, g.coords, g.o0(i) * stride,
            (g.o0(i + 1) - g.o0(i)) * stride)
          i += 1
        }
      case GeomTypes.MultiPolygon =>
        val n = nOf(g.o0)
        buf.putInt(n)
        val code = Dims.isoOffset(g.dims) + GeomTypes.Polygon
        var i = 0
        while (i < n) {
          buf.put(1.toByte); buf.putInt(code)
          putRings(buf, g.coords, g.o1, g.o0(i), g.o0(i + 1), stride)
          i += 1
        }
      case GeomTypes.Collection =>
        val n = if (g.parts == null) 0 else g.parts.length
        buf.putInt(n)
        var i = 0
        while (i < n) { writeGeom(buf, g.parts(i)); i += 1 }
    }
  }

  private def putRings(buf: ByteBuffer, coords: Array[Double], offs: Array[Int],
                       from: Int, until: Int, stride: Int): Unit = {
    buf.putInt(until - from)
    var r = from
    while (r < until) {
      buf.putInt(offs(r + 1) - offs(r))
      putCoords(buf, coords, offs(r) * stride, (offs(r + 1) - offs(r)) * stride)
      r += 1
    }
  }

  private def putCoords(buf: ByteBuffer, coords: Array[Double], from: Int,
                        len: Int): Unit = {
    var i = from
    val end = from + len
    while (i < end) { buf.putDouble(coords(i)); i += 1 }
  }
}
