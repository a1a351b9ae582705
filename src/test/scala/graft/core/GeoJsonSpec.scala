package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeoJsonSpec extends AnyFunSuite {

  private def rt(wkt: String): Unit = {
    val g = Wkt.parse(wkt)
    val json = GeoJson.write(g)
    val back = GeoJson.parse(json)
    assert(back == g, s"$wkt -> $json -> ${Wkt.write(back)}")
  }

  test("every geometry type round-trips through GeoJSON, raw-bit equal") {
    rt("POINT (1.5 2.5)")
    rt("POINT EMPTY")
    rt("LINESTRING (0 0, 1 1, 2 0.5)")
    rt("LINESTRING EMPTY")
    rt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    rt("POLYGON EMPTY")
    rt("MULTIPOINT (1 2, 3 4)")
    rt("MULTIPOINT EMPTY")
    rt("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))")
    rt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.4 5.2, 5.4 5.4, 5.2 5.2)))")
    rt("MULTIPOLYGON EMPTY")
    rt("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    rt("GEOMETRYCOLLECTION EMPTY")
    // 3D (RFC 7946 altitude)
    rt("POINT Z (1 2 3)")
    rt("LINESTRING Z (0 0 1, 1 1 2)")
    rt("MULTIPOLYGON Z (((0 0 1, 1 0 1, 1 1 1, 0 0 1)))")
  }

  test("exact serialized forms (spec shapes, DoubleFormat numbers)") {
    assert(GeoJson.write(Wkt.parse("POINT (1.5 -2.5)")) ==
      """{"type":"Point","coordinates":[1.5,-2.5]}""")
    assert(GeoJson.write(Wkt.parse("POINT EMPTY")) ==
      """{"type":"Point","coordinates":[]}""")
    assert(GeoJson.write(Wkt.parse("POLYGON ((0 0, 1 0, 1 1, 0 0)))".dropRight(1))) ==
      """{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]]}""")
    assert(GeoJson.write(Wkt.parse("GEOMETRYCOLLECTION (POINT (1 2))")) ==
      """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1,2]}]}""")
    // precision cap flows through like WKT's
    assert(GeoJson.write(Wkt.parse("POINT (0.123456789 0)"), 3) ==
      """{"type":"Point","coordinates":[0.123,0]}""")
  }

  test("features: geometry/properties/id in any order, bare geometry, null") {
    val f = GeoJson.parseFeature(
      """{"id": 42, "properties": {"name": "a\"b", "n": 3},
        |"type": "Feature",
        |"geometry": {"type":"Point","coordinates":[1,2]}}""".stripMargin)
    assert(Wkt.write(f.geometry) == "POINT (1 2)")
    assert(f.propertiesJson.contains("\"name\"") && f.propertiesJson.contains("3"))
    assert(f.id.contains("42"))
    // string id, null geometry
    val g = GeoJson.parseFeature(
      """{"type":"Feature","id":"abc","geometry":null,"properties":null}""")
    assert(g.geometry == null && g.id.contains("abc"))
    // bare geometry object counts as an anonymous feature (GeoJSONSeq mixes)
    val h = GeoJson.parseFeature("""{"type":"LineString","coordinates":[[0,0],[1,1]]}""")
    assert(Wkt.write(h.geometry) == "LINESTRING (0 0, 1 1)" &&
      h.propertiesJson == "{}" && h.id.isEmpty)
    intercept[IllegalArgumentException](
      GeoJson.parseFeature("""{"type":"FeatureCollection","features":[]}"""))
  }

  test("precision -1 = shortest round-trip digits (lossless interchange)") {
    // needs 17 significant digits — a 16-cap reparses to a different double
    val hard = Seq(-0.18129999999999313, 0.1, 1.0 / 3.0, 1e-7,
      123456789.12345678, -9.87654321e-5, 4.9e-324, 1.7976931348623157e308)
    for (v <- hard) {
      val s = DoubleFormat.printShortest(v)
      assert(java.lang.Double.parseDouble(s) == v, s"$v -> $s")
      assert(!s.toLowerCase.contains("e"), s"plain notation required: $s")
    }
    val g = Geom(GeomTypes.Point, Dims.XY, Array(-0.18129999999999313, 85.0))
    val lossless = GeoJson.parse(GeoJson.write(g, -1))
    assert(lossless == g)
    // and the 16-cap variant demonstrably is NOT lossless on that value
    val capped = GeoJson.parse(GeoJson.write(g, 16))
    assert(capped != g)
  }

  test("parser: member order, whitespace, foreign members, errors") {
    // any member order + bbox foreign member (RFC 7946 §6.1) + whitespace
    val g = GeoJson.parse(
      """ { "bbox": [0, 0, 2, 2], "coordinates": [ [0,0], [2,2] ],
        |   "extra": {"nested": ["x", 1, true, null]},
        |   "type" : "LineString" } """.stripMargin)
    assert(Wkt.write(g) == "LINESTRING (0 0, 2 2)")
    intercept[IllegalArgumentException](GeoJson.parse("""{"type":"Pointy","coordinates":[1,2]}"""))
    intercept[IllegalArgumentException](GeoJson.parse("""{"coordinates":[1,2]}"""))
    intercept[IllegalArgumentException](GeoJson.parse("""{"type":"Point","coordinates":[1]}"""))
    intercept[IllegalArgumentException](GeoJson.parse("""{"type":"Point","coordinates":[1,2]} junk"""))
    intercept[IllegalArgumentException]( // mixed 2D/3D positions
      GeoJson.parse("""{"type":"LineString","coordinates":[[0,0],[1,1,1]]}"""))
    // FeatureCollection: file order, foreign members, mixed feature forms
    val fc = GeoJson.parseFeatureCollection(
      """{"bbox":[0,0,3,4],"type":"FeatureCollection","features":[
        | {"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},
        |  "properties":{"a":1},"id":"f1"},
        | {"type":"Point","coordinates":[3,4]},
        | {"type":"Feature","geometry":null,"properties":null}]}""".stripMargin)
    assert(fc.length == 3)
    assert(Wkt.write(fc(0).geometry) == "POINT (1 2)" && fc(0).id.contains("f1"))
    assert(Wkt.write(fc(1).geometry) == "POINT (3 4)")
    assert(fc(2).geometry == null)
    // bare Feature / bare geometry = singleton collection; empty features ok
    assert(GeoJson.parseFeatureCollection(
      """{"type":"Point","coordinates":[5,6]}""").length == 1)
    assert(GeoJson.parseFeatureCollection(
      """{"type":"FeatureCollection","features":[]}""").isEmpty)
    intercept[IllegalArgumentException](GeoJson.parseFeatureCollection(
      """{"type":"FeatureCollection"}"""))
    // a COMMITTED FeatureCollection (type seen, or a features key) whose
    // Nth feature is broken must surface the REAL positioned error — not
    // fall back to singleton re-parse and report a useless "expected a
    // Feature" at offset 0 that masks which feature broke
    val masked = intercept[IllegalArgumentException](
      GeoJson.parseFeatureCollection(
        """{"type":"FeatureCollection","features":[
          | {"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":null},
          | {"type":"Feature","geometry":{"type":"Point","coordinates":[1e+,2]},"properties":null}]}"""
          .stripMargin))
    assert(masked.getMessage.contains("GeoJSON parse error"), masked.getMessage)
    // position points inside the SECOND feature, not at the document start
    assert("error at (\\d+)".r.findFirstMatchIn(masked.getMessage)
      .exists(_.group(1).toInt > 60), masked.getMessage)
    // malformed numbers must raise the parser's POSITIONED error, not a
    // bare NumberFormatException (the try-variants and parseFeature's
    // geometry fallback catch IllegalArgumentException only)
    for (bad <- Seq("1e+", "1.2.3", "--5", "."))
      assert(intercept[IllegalArgumentException](GeoJson.parse(
        s"""{"type":"Point","coordinates":[$bad,2]}"""))
        .getMessage.contains("GeoJSON parse error"), bad)
    // M ordinates have no GeoJSON representation
    intercept[IllegalArgumentException](
      GeoJson.write(Wkt.parse("POINT M (1 2 3)")))
    // JSON has no NaN/Infinity tokens — refuse, don't emit invalid lines
    intercept[IllegalArgumentException](
      GeoJson.write(Wkt.parse("POINT (nan 1)")))
    intercept[IllegalArgumentException](
      GeoJson.write(Wkt.parse("POINT (inf 1)")))
    // …but the ALL-NaN position is the WKB spelling of POINT EMPTY and
    // must serialize as the empty form, not throw
    val viaWkb = Wkb.parse(Wkb.write(Wkt.parse("POINT EMPTY")))
    assert(GeoJson.write(viaWkb) == """{"type":"Point","coordinates":[]}""")
  }
}
