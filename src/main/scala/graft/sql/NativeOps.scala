package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

import graft.core.{Dims, Geom, GeomTypes}

/** Native GeoArrow layout interchange: converts between the engine's flat
  * geometry struct and the GeoArrow physical layouts of
  * `/root/reference/src/geoarrow.c:25-43,113-207` expressed as Spark SQL
  * nested types, in BOTH coordinate layouts:
  *
  *  - SEPARATE (struct-of-arrays): coord = `struct<x,y[,z|m][,m]>` — what
  *    sf/GDAL emit by default; in parquet each ordinate lands in its own
  *    column chunk, exactly the separate-buffer layout.
  *  - INTERLEAVED (fixed-size-list): coord = `array<double>` of stride.
  *
  * Nesting mirrors the reference: point = coord; linestring/multipoint =
  * `array<coord>`; polygon/multilinestring = `array<array<coord>>`;
  * multipolygon = `array<array<array<coord>>>`.
  *
  * Cast semantics are kernel K5's (`src/geoarrow.c:1578-1614`): the target
  * (geometry_type, dims, coord_type) is requested explicitly; type/dims
  * promotion uses the native-writer rules (POINT<->MULTIPOINT, NaN dim
  * fill); POINT EMPTY emits NaN ordinates (`src/geoarrow.c:3908-3914`) —
  * the native layout has no EMPTY-point representation. */
object NativeOps {

  import GeoSchema.CoordType

  // ---------------------------------------------------------------- types

  /** Separate-layout coord struct fields named per the reference's child
    * names x/y/z/m (`src/geoarrow.c:25-43`). */
  def coordDataType(dims: Int, coordType: Int): DataType =
    if (coordType == CoordType.Interleaved)
      ArrayType(DoubleType, containsNull = false)
    else {
      val names = dims match {
        case Dims.XY => Seq("x", "y")
        case Dims.XYZ => Seq("x", "y", "z")
        case Dims.XYM => Seq("x", "y", "m")
        case Dims.XYZM => Seq("x", "y", "z", "m")
      }
      StructType(names.map(n => StructField(n, DoubleType, nullable = false)))
    }

  /** Spark type of a native-layout geometry value. */
  def nativeDataType(geometryType: Int, dims: Int, coordType: Int): DataType = {
    val coord = coordDataType(dims, coordType)
    def list(t: DataType) = ArrayType(t, containsNull = false)
    geometryType match {
      case GeomTypes.Point => coord
      case GeomTypes.LineString | GeomTypes.MultiPoint => list(coord)
      case GeomTypes.Polygon | GeomTypes.MultiLineString => list(list(coord))
      case GeomTypes.MultiPolygon => list(list(list(coord)))
      case other => throw new IllegalArgumentException(
        s"no native layout for geometry type $other (collections stay serialized)")
    }
  }

  /** Accepting variant for the read side: parquet round-trips lose
    * non-null/containsNull markers, so `st_fromnative` declares everything
    * nullable and casts cheaply from either variant. */
  def lenientDataType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = lenientDataType(f.dataType), nullable = true)))
    case a: ArrayType =>
      ArrayType(lenientDataType(a.elementType), containsNull = true)
    case other => other
  }

  // ------------------------------------------------------------- to native

  /** Flat struct -> native-layout value (K5 cast incl. promotion). */
  def toNative(gRow: InternalRow, geometryType: Int, dims: Int,
               coordType: Int): AnyRef = {
    var g = GeoStruct.decode(gRow)
    if (g.dims != dims) g = Geom.castDims(g, dims)
    if (g.geomType != geometryType) g = Geom.castType(g, geometryType)
    val stride = g.stride
    geometryType match {
      case GeomTypes.Point =>
        if (g.coords.isEmpty) {
          // EMPTY point -> NaN fill (native writer, geoarrow.c:3908-3914)
          coordOf(Array.fill(stride)(Double.NaN), 0, stride, coordType)
        } else coordOf(g.coords, 0, stride, coordType)
      case GeomTypes.LineString | GeomTypes.MultiPoint =>
        coordSeq(g.coords, 0, g.numCoords, stride, coordType)
      // nOf clamps: data persisted before offset normalization can carry
      // EMPTY geometries with zero-length offset arrays — `length - 1`
      // would go negative (same clamp Wkb.write applies)
      case GeomTypes.Polygon | GeomTypes.MultiLineString =>
        ringSeq(g.coords, g.o0, 0, math.max(0, g.o0.length - 1), stride, coordType)
      case GeomTypes.MultiPolygon =>
        val polys = new Array[Any](math.max(0, g.o0.length - 1))
        var p = 0
        while (p < polys.length) {
          polys(p) = ringSeq(g.coords, g.o1, g.o0(p), g.o0(p + 1), stride, coordType)
          p += 1
        }
        new GenericArrayData(polys)
    }
  }

  private def coordOf(coords: Array[Double], at: Int, stride: Int,
                      coordType: Int): AnyRef =
    if (coordType == CoordType.Interleaved)
      UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOfRange(coords, at, at + stride))
    else {
      val vals = new Array[Any](stride)
      var j = 0
      while (j < stride) { vals(j) = coords(at + j); j += 1 }
      new GenericInternalRow(vals)
    }

  private def coordSeq(coords: Array[Double], from: Int, until: Int,
                       stride: Int, coordType: Int): ArrayData = {
    val out = new Array[Any](until - from)
    var i = from
    while (i < until) { out(i - from) = coordOf(coords, i * stride, stride, coordType); i += 1 }
    new GenericArrayData(out)
  }

  private def ringSeq(coords: Array[Double], offs: Array[Int], from: Int,
                      until: Int, stride: Int, coordType: Int): ArrayData = {
    val out = new Array[Any](until - from)
    var r = from
    while (r < until) {
      out(r - from) = coordSeq(coords, offs(r), offs(r + 1), stride, coordType)
      r += 1
    }
    new GenericArrayData(out)
  }

  // ----------------------------------------------------------- from native

  /** Separate-layout POINT (struct coord) -> flat struct. */
  def fromNativeStruct(v: InternalRow, geometryType: Int, dims: Int,
                       coordType: Int): InternalRow = {
    val stride = Geom.strideOf(dims)
    val coords = new Array[Double](stride)
    var j = 0
    while (j < stride) { coords(j) = v.getDouble(j); j += 1 }
    GeoStruct.encode(Geom(GeomTypes.Point, dims, coords))
  }

  /** Every other native layout (arrays at the top level) -> flat struct. */
  def fromNativeArray(v: ArrayData, geometryType: Int, dims: Int,
                      coordType: Int): InternalRow = {
    val stride = Geom.strideOf(dims)
    geometryType match {
      case GeomTypes.Point => // interleaved point = array<double>
        GeoStruct.encode(Geom(GeomTypes.Point, dims, v.toDoubleArray()))
      case GeomTypes.LineString | GeomTypes.MultiPoint =>
        val coords = readCoordSeq(v, stride, coordType)
        GeoStruct.encode(Geom(geometryType, dims, coords))
      case GeomTypes.Polygon | GeomTypes.MultiLineString =>
        val buf = new java.util.ArrayList[Array[Double]]
        val o0 = readRings(v, stride, coordType, buf)
        GeoStruct.encode(Geom(geometryType, dims, concat(buf), o0))
      case GeomTypes.MultiPolygon =>
        val buf = new java.util.ArrayList[Array[Double]]
        val nPolys = v.numElements()
        val o0 = new Array[Int](nPolys + 1)
        val ringOffs = scala.collection.mutable.ArrayBuffer[Int](0)
        var p = 0
        var ringCount = 0
        while (p < nPolys) {
          val poly = v.getArray(p)
          val polyRings = readRings(poly, stride, coordType, buf)
          var r = 1
          while (r < polyRings.length) {
            ringOffs += ringOffs.last + (polyRings(r) - polyRings(r - 1))
            r += 1
          }
          ringCount += polyRings.length - 1
          o0(p + 1) = ringCount
          p += 1
        }
        GeoStruct.encode(Geom(GeomTypes.MultiPolygon, dims, concat(buf), o0,
          ringOffs.toArray))
      case other => throw new IllegalArgumentException(
        s"no native layout for geometry type $other")
    }
  }

  private def readCoord(v: AnyRef, stride: Int, coordType: Int,
                        out: Array[Double], at: Int): Unit =
    if (coordType == CoordType.Interleaved) {
      val a = v.asInstanceOf[ArrayData]
      var j = 0
      while (j < stride) { out(at + j) = a.getDouble(j); j += 1 }
    } else {
      val r = v.asInstanceOf[InternalRow]
      var j = 0
      while (j < stride) { out(at + j) = r.getDouble(j); j += 1 }
    }

  private def readCoordSeq(v: ArrayData, stride: Int, coordType: Int): Array[Double] = {
    val n = v.numElements()
    val out = new Array[Double](n * stride)
    var i = 0
    while (i < n) {
      val c: AnyRef = if (coordType == CoordType.Interleaved) v.getArray(i)
        else v.getStruct(i, stride)
      readCoord(c, stride, coordType, out, i * stride)
      i += 1
    }
    out
  }

  /** Reads `array<array<coord>>`, appending each ring's coords to `buf`;
    * returns ring offsets (in coordinates, local to this value). */
  private def readRings(v: ArrayData, stride: Int, coordType: Int,
                        buf: java.util.ArrayList[Array[Double]]): Array[Int] = {
    val nRings = v.numElements()
    val offs = new Array[Int](nRings + 1)
    var r = 0
    while (r < nRings) {
      val ring = readCoordSeq(v.getArray(r), stride, coordType)
      buf.add(ring)
      offs(r + 1) = offs(r) + ring.length / stride
      r += 1
    }
    offs
  }

  private def concat(buf: java.util.ArrayList[Array[Double]]): Array[Double] = {
    var total = 0
    var i = 0
    while (i < buf.size) { total += buf.get(i).length; i += 1 }
    val out = new Array[Double](total)
    var at = 0
    i = 0
    while (i < buf.size) {
      val a = buf.get(i)
      System.arraycopy(a, 0, out, at, a.length)
      at += a.length
      i += 1
    }
    out
  }
}
