package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Dims, Geom, GeomTypes, Wkt}

/** Buffer-level construction fixtures (FIXTURES.md §2, mirroring
  * `/root/reference/tests/testthat/test-array.R:167-327`): the geometry
  * struct built directly from literal buffer parts, asserted field-exact
  * against the codec path. */
class BufferFixtureSpec extends AnyFunSuite {

  private def interleave(x: Array[Double], y: Array[Double]): Array[Double] = {
    val out = new Array[Double](x.length * 2)
    x.indices.foreach { i => out(i * 2) = x(i); out(i * 2 + 1) = y(i) }
    out
  }

  val x = Array(1.0, 2.0, 3.0, 4.0, 5.0)
  val y = Array(6.0, 7.0, 8.0, 9.0, 10.0)

  test("multipoint from interleaved buffers (test-array.R:188-201)") {
    val g = Geom(GeomTypes.MultiPoint, Dims.XY, interleave(x, y))
    assert(g.coords.toSeq == Seq(1, 6, 2, 7, 3, 8, 4, 9, 5, 10))
    assert(Wkt.write(g) == "MULTIPOINT (1 6, 2 7, 3 8, 4 9, 5 10)")
    assert(Wkt.parse(Wkt.write(g)) == g)
  }

  test("linestring from offsets0=[0,5] (test-array.R:216-241)") {
    val g = Geom(GeomTypes.LineString, Dims.XY, interleave(x, y))
    assert(g.numCoords == 5)
    assert(Wkt.write(g) == "LINESTRING (1 6, 2 7, 3 8, 4 9, 5 10)")
  }

  test("multilinestring offsets0=[0,1] offsets1=[0,5] (test-array.R:257-288)") {
    val g = Geom(GeomTypes.MultiLineString, Dims.XY, interleave(x, y), Array(0, 5))
    assert(Wkt.write(g) == "MULTILINESTRING ((1 6, 2 7, 3 8, 4 9, 5 10))")
    assert(Wkt.parse(Wkt.write(g)).o0.toSeq == Seq(0, 5))
  }

  test("multipolygon nested offsets (test-array.R:290-327)") {
    val ring = interleave(Array(0.0, 4.0, 4.0, 0.0, 0.0), Array(0.0, 0.0, 4.0, 4.0, 0.0))
    val g = Geom(GeomTypes.MultiPolygon, Dims.XY, ring, Array(0, 1), Array(0, 5))
    assert(Wkt.write(g) == "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)))")
    val rt = Wkt.parse(Wkt.write(g))
    assert(rt.o0.toSeq == Seq(0, 1) && rt.o1.toSeq == Seq(0, 5))
  }

  test("zero-length buffers -> length-0 geometries (test-array.R:203-214)") {
    val g = Geom(GeomTypes.MultiPoint, Dims.XY, Geom.emptyDoubles)
    assert(g.isEmpty && Wkt.write(g) == "MULTIPOINT EMPTY")
  }

  test("struct codec round-trips buffers exactly") {
    val g = Geom(GeomTypes.MultiPolygon, Dims.XYZ,
      Array(0, 0, 1, 4, 0, 2, 4, 4, 3, 0, 0, 1), Array(0, 1), Array(0, 4))
    val back = GeoStruct.decode(GeoStruct.encode(g))
    assert(back == g)
  }

  test("separate-layout point column round-trips bit-for-bit (test-type.R:33-61)") {
    val spark = SparkTestSession.spark
    Geo.register(spark)
    // sep coord = struct<x,y>: the struct-of-arrays layout sf/GDAL default to
    val rows = spark.sql(
      """SELECT st_tonative(st_point(CAST(1.5 AS DOUBLE), CAST(-2.25 AS DOUBLE)),
        |  'point', 'xy', 'separate') AS p""".stripMargin).collect()
    val p = rows(0).getStruct(0)
    assert(p.schema.fieldNames.toSeq == Seq("x", "y"))
    assert(java.lang.Double.doubleToRawLongBits(p.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(1.5))
    assert(java.lang.Double.doubleToRawLongBits(p.getDouble(1)) ==
      java.lang.Double.doubleToRawLongBits(-2.25))
    // full round trip back to the flat struct
    val back = spark.sql(
      """SELECT st_aswkt(st_fromnative(st_tonative(
        |  st_point(CAST(1.5 AS DOUBLE), CAST(-2.25 AS DOUBLE)),
        |  'point', 'xy', 'separate'), 'point', 'xy', 'separate'))""".stripMargin)
      .collect()(0).getString(0)
    assert(back == "POINT (1.5 -2.25)")
  }

  test("separate XYZM point carries z/m children (test-type.R:63-109)") {
    val spark = SparkTestSession.spark
    Geo.register(spark)
    val row = spark.sql(
      """SELECT st_tonative(st_castdims(st_point(CAST(1 AS DOUBLE),
        |  CAST(2 AS DOUBLE)), 'xyzm'), 'point', 'xyzm', 'separate') AS p"""
        .stripMargin).collect()(0).getStruct(0)
    assert(row.schema.fieldNames.toSeq == Seq("x", "y", "z", "m"))
    assert(row.getDouble(0) == 1.0 && row.getDouble(1) == 2.0)
    assert(row.getDouble(2).isNaN && row.getDouble(3).isNaN) // NaN dim fill
  }

  test("nested native layouts round-trip (sep + interleaved)") {
    val spark = SparkTestSession.spark
    Geo.register(spark)
    val wkts = Seq(
      "LINESTRING (1 6, 2 7, 3 8)" -> "linestring",
      "MULTIPOINT (1 6, 2 7)" -> "multipoint",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 1))" -> "polygon",
      "MULTILINESTRING ((1 6, 2 7), (3 8, 4 9, 5 10))" -> "multilinestring",
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0)), ((9 9, 11 9, 11 11, 9 9), (10 10, 10.5 10, 10 10.5, 10 10)))" -> "multipolygon")
    for ((wkt, t) <- wkts; ct <- Seq("separate", "interleaved")) {
      val back = spark.sql(
        s"""SELECT st_aswkt(st_fromnative(st_tonative(st_geomfromwkt('$wkt'),
           |  '$t', 'xy', '$ct'), '$t', 'xy', '$ct'))""".stripMargin)
        .collect()(0).getString(0)
      assert(back == wkt, s"$t/$ct")
    }
  }

  test("box column reads as 5-point polygon ring; min>max -> POLYGON EMPTY") {
    val spark = SparkTestSession.spark
    Geo.register(spark)
    val ok = spark.sql(
      """SELECT st_aswkt(st_boxgeom(st_makebox(CAST(0 AS DOUBLE),
        |  CAST(1 AS DOUBLE), CAST(2 AS DOUBLE), CAST(3 AS DOUBLE))))"""
        .stripMargin).collect()(0).getString(0)
    assert(ok == "POLYGON ((0 1, 2 1, 2 3, 0 3, 0 1))")
    val empty = spark.sql(
      """SELECT st_aswkt(st_boxgeom(st_makebox(CAST(5 AS DOUBLE),
        |  CAST(1 AS DOUBLE), CAST(2 AS DOUBLE), CAST(3 AS DOUBLE))))"""
        .stripMargin).collect()(0).getString(0)
    assert(empty == "POLYGON EMPTY")
  }

  test("validity: null features stay null through SQL (test-array.R:375-401)") {
    val spark = SparkTestSession.spark
    Geo.register(spark)
    val rows = spark.sql(
      """SELECT st_trygeomfromwkt(w) AS g FROM VALUES
        |('POINT (1 2)'), (CAST(NULL AS STRING)), ('not wkt') AS t(w)"""
        .stripMargin).collect()
    assert(rows(0).getStruct(0) != null)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }
}
