package graft.core

import java.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Cross-codec consistency on random geometries (every type × dims):
  * WKB and WKT round-trips must reproduce the exact flat value. Coordinates
  * come from a 1/16-degree binary-fraction lattice, whose doubles are
  * exactly representable and print exactly within precision 16 — so the
  * WKT leg is bit-exact too (see NOTES.md fact 6 for why arbitrary doubles
  * would not be; even 0.1-step lattices fail, their doubles can need 17
  * significant digits). Also fuzzes the WKT parser:
  * adversarial text must parse or throw, never hang or return garbage. */
class CodecPropSpec extends AnyFunSuite {

  private val r = new Random(77L)

  private def randCoords(n: Int, stride: Int): Array[Double] =
    Array.fill(n * stride)((r.nextInt(5760) - 2880) / 16.0)

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
        val sizes = Array.fill(1 + r.nextInt(3))(4 + r.nextInt(5))
        Geom(geomType, dims, randCoords(sizes.sum, stride), sizes.scanLeft(0)(_ + _))
      case GeomTypes.MultiPolygon =>
        val ringsPerPoly = Array.fill(1 + r.nextInt(3))(1 + r.nextInt(3))
        val ringSizes = Array.fill(ringsPerPoly.sum)(4 + r.nextInt(4))
        Geom(GeomTypes.MultiPolygon, dims, randCoords(ringSizes.sum, stride),
          ringsPerPoly.scanLeft(0)(_ + _), ringSizes.scanLeft(0)(_ + _))
    }
  }

  private val allTypes = Seq(GeomTypes.Point, GeomTypes.LineString,
    GeomTypes.Polygon, GeomTypes.MultiPoint, GeomTypes.MultiLineString,
    GeomTypes.MultiPolygon)
  private val allDims = Seq(Dims.XY, Dims.XYZ, Dims.XYM, Dims.XYZM)

  test("dump ∘ collect reconstructs every random multi-geometry bit-for-bit") {
    // collect(dump(m)) must rebuild the exact flat value for uniform
    // multis — offsets, ring structure and every coordinate — as long as
    // the parts go back in storage order (the canonical sort lives in the
    // SQL layer; core collect is order-preserving by contract)
    val multiTypes = Seq(GeomTypes.MultiPoint, GeomTypes.MultiLineString,
      GeomTypes.MultiPolygon)
    for (_ <- 1 to 300; t <- multiTypes; d <- allDims) {
      val g = randGeom(t, d)
      val parts = Geom.dump(g)
      assert(parts.nonEmpty)
      val back = Geom.collect(parts.toSeq)
      assert(back == g, s"type=$t dims=$d wkt=${Wkt.write(g)}")
      // and every part is the atomic element type
      val expectedPart = t match {
        case GeomTypes.MultiPoint => GeomTypes.Point
        case GeomTypes.MultiLineString => GeomTypes.LineString
        case GeomTypes.MultiPolygon => GeomTypes.Polygon
      }
      assert(parts.forall(_.geomType == expectedPart))
    }
  }

  test("random geometries round-trip WKB bit-for-bit") {
    for (_ <- 1 to 300; t <- allTypes; d <- allDims) {
      val g = randGeom(t, d)
      assert(Wkb.parse(Wkb.write(g)) == g, s"type=$t dims=$d")
    }
  }

  test("random lattice geometries round-trip WKT bit-for-bit") {
    for (_ <- 1 to 300; t <- allTypes; d <- allDims) {
      val g = randGeom(t, d)
      val rt = Wkt.parse(Wkt.write(g))
      // flat multipoint output reparses without nesting — same value
      assert(rt == g, s"type=$t dims=$d wkt=${Wkt.write(g)}")
    }
  }

  test("WKT parser on adversarial text: parse or throw, never hang") {
    val pieces = Array("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
      "GEOMETRYCOLLECTION", "Z", "M", "ZM", "EMPTY", "(", ")", ",", " ",
      "1.5", "-", "nan", "inf", "1e309", "..", "POINTT", "\u0000", "\t")
    val rr = new Random(13)
    var parsed = 0
    (1 to 50000).foreach { _ =>
      val sb = new StringBuilder
      (0 until 1 + rr.nextInt(12)).foreach(_ => sb.append(pieces(rr.nextInt(pieces.length))))
      try { Wkt.parse(sb.toString); parsed += 1 }
      catch { case _: Exception => () }
    }
    assert(parsed >= 0) // terminating quickly is the property
  }

  test("mutated valid WKT never crashes") {
    val rr = new Random(21)
    val base = "MULTIPOLYGON Z (((30 20 1, 45 40 2, 10 40 3, 30 20 1)), ((15 5 0, 40 10 1, 10 20 2, 15 5 0)))"
    (1 to 20000).foreach { _ =>
      val chars = base.toCharArray
      (0 until 1 + rr.nextInt(3)).foreach { _ =>
        chars(rr.nextInt(chars.length)) = (32 + rr.nextInt(95)).toChar
      }
      try Wkt.parse(new String(chars))
      catch { case _: Exception => () }
    }
  }
}
