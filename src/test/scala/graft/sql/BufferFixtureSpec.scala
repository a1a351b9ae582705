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
