package graft.sql

import java.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Dims, Geom, GeomTypes}

/** Property tests for the native GeoArrow layout casts: random geometries of
  * every type/dims through toNative/fromNative in BOTH coordinate layouts
  * must round-trip to a raw-bit-identical flat struct (the buffer-level
  * equality the reference's test-array.R fixtures assert). Exercises the
  * nested offset reconstruction (multi-ring polygons, multi-part
  * multipolygons) far beyond the handful of handwritten fixtures. */
class NativeOpsPropSpec extends AnyFunSuite {

  private val r = new Random(20260816L)

  private def randCoords(n: Int, stride: Int): Array[Double] =
    Array.fill(n * stride)(math.floor(r.nextDouble() * 3600.0) / 10.0 - 180.0)

  private def randGeom(geomType: Int, dims: Int): Geom = {
    val stride = Geom.strideOf(dims)
    geomType match {
      case GeomTypes.Point =>
        Geom(GeomTypes.Point, dims, randCoords(1, stride))
      case GeomTypes.LineString =>
        Geom(GeomTypes.LineString, dims, randCoords(2 + r.nextInt(8), stride))
      case GeomTypes.MultiPoint =>
        Geom(GeomTypes.MultiPoint, dims, randCoords(1 + r.nextInt(6), stride))
      case GeomTypes.Polygon | GeomTypes.MultiLineString =>
        val nRings = 1 + r.nextInt(3)
        val sizes = Array.fill(nRings)(4 + r.nextInt(5))
        val offs = sizes.scanLeft(0)(_ + _)
        Geom(geomType, dims, randCoords(sizes.sum, stride), offs)
      case GeomTypes.MultiPolygon =>
        val nPolys = 1 + r.nextInt(3)
        val ringsPerPoly = Array.fill(nPolys)(1 + r.nextInt(3))
        val o0 = ringsPerPoly.scanLeft(0)(_ + _)
        val ringSizes = Array.fill(ringsPerPoly.sum)(4 + r.nextInt(4))
        val o1 = ringSizes.scanLeft(0)(_ + _)
        Geom(GeomTypes.MultiPolygon, dims, randCoords(ringSizes.sum, stride), o0, o1)
    }
  }

  private val allTypes = Seq(GeomTypes.Point, GeomTypes.LineString,
    GeomTypes.Polygon, GeomTypes.MultiPoint, GeomTypes.MultiLineString,
    GeomTypes.MultiPolygon)
  private val allDims = Seq(Dims.XY, Dims.XYZ, Dims.XYM, Dims.XYZM)
  private val layouts = Seq(GeoSchema.CoordType.Separate,
    GeoSchema.CoordType.Interleaved)

  test("random geometries round-trip both native layouts bit-for-bit") {
    for (_ <- 1 to 200; t <- allTypes; d <- allDims; ct <- layouts) {
      val g = randGeom(t, d)
      val native = NativeOps.toNative(GeoStruct.encode(g), t, d, ct)
      val back = native match {
        case row: org.apache.spark.sql.catalyst.InternalRow =>
          NativeOps.fromNativeStruct(row, t, d, ct)
        case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
          NativeOps.fromNativeArray(arr, t, d, ct)
      }
      assert(GeoStruct.decode(back) == g, s"type=$t dims=$d ct=$ct g=$g")
    }
  }

  test("POINT EMPTY emits NaN coords in native form (geoarrow.c:3908-3914)") {
    for (ct <- layouts) {
      val empty = Geom(GeomTypes.Point, Dims.XY, Geom.emptyDoubles)
      val native = NativeOps.toNative(GeoStruct.encode(empty),
        GeomTypes.Point, Dims.XY, ct)
      val back = native match {
        case row: org.apache.spark.sql.catalyst.InternalRow =>
          NativeOps.fromNativeStruct(row, GeomTypes.Point, Dims.XY, ct)
        case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
          NativeOps.fromNativeArray(arr, GeomTypes.Point, Dims.XY, ct)
      }
      val g = GeoStruct.decode(back)
      assert(g.coords.length == 2 && g.coords.forall(_.isNaN))
    }
  }

  test("promotion casts apply on the way to native (K5 semantics)") {
    // POINT requested as MULTIPOINT promotes, like the native writer
    val p = Geom.point(3.5, -7.25)
    val native = NativeOps.toNative(GeoStruct.encode(p),
      GeomTypes.MultiPoint, Dims.XY, GeoSchema.CoordType.Separate)
    val back = NativeOps.fromNativeArray(
      native.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      GeomTypes.MultiPoint, Dims.XY, GeoSchema.CoordType.Separate)
    val g = GeoStruct.decode(back)
    assert(g.geomType == GeomTypes.MultiPoint && g.numCoords == 1)
    assert(g.coords.toSeq == Seq(3.5, -7.25))
  }
}
