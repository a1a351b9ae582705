package graft.core

/** GeoJSON (RFC 7946) geometry codec — the third interchange text format
  * the reference ecosystem speaks (sf/GDAL read and write GeoJSON
  * natively alongside WKT/WKB; the reference round-trips geometries
  * through sf, `/root/reference/R/pkg-sf.R`).
  *
  * Numbers print through [[DoubleFormat]] (ryu-shortest, fixed precision
  * cap) — the same writer the WKT leg uses — so GeoJSON output is
  * bit-reproducible and DuckDB-oracle-able by string construction.
  *
  * Dims: RFC 7946 positions are `[x, y]` or `[x, y, z]`; XYM/XYZM have no
  * spec representation and are rejected (cast to xy/xyz first). Empty
  * geometries serialize as empty `coordinates` arrays; an empty
  * GeometryCollection as empty `geometries`. */
object GeoJson {

  // --------------------------------------------------------------- write

  def write(g: Geom): String = write(g, DoubleFormat.DefaultPrecision)

  /** `precision < 0` = shortest-ROUND-TRIP digits (lossless interchange,
    * [[DoubleFormat.printShortest]]); otherwise the WKT-style fraction cap. */
  def write(g: Geom, precision: Int): String = {
    val sb = new java.lang.StringBuilder(64)
    writeGeom(sb, g, precision)
    sb.toString
  }

  private def typeName(t: Int): String = t match {
    case GeomTypes.Point => "Point"
    case GeomTypes.LineString => "LineString"
    case GeomTypes.Polygon => "Polygon"
    case GeomTypes.MultiPoint => "MultiPoint"
    case GeomTypes.MultiLineString => "MultiLineString"
    case GeomTypes.MultiPolygon => "MultiPolygon"
    case GeomTypes.Collection => "GeometryCollection"
    case other => throw new IllegalArgumentException(
      s"no GeoJSON representation for geometry type $other")
  }

  private def writeGeom(sb: java.lang.StringBuilder, g: Geom,
                        precision: Int): Unit = {
    if (g.dims == Dims.XYM || g.dims == Dims.XYZM)
      throw new IllegalArgumentException(
        "GeoJSON positions are [x, y] or [x, y, z]: M ordinates have no " +
          "RFC 7946 representation (st_castdims to xy first — casting to " +
          "xyz NaN-fills z, and JSON has no NaN)")
    sb.append("{\"type\":\"").append(typeName(g.geomType)).append("\",")
    if (g.geomType == GeomTypes.Collection) {
      sb.append("\"geometries\":[")
      val parts = if (g.parts == null) Array.empty[Geom] else g.parts
      var i = 0
      while (i < parts.length) {
        if (i > 0) sb.append(',')
        writeGeom(sb, parts(i), precision)
        i += 1
      }
      sb.append("]}")
      return
    }
    sb.append("\"coordinates\":")
    val s = g.stride
    def pos(i: Int): Unit = {
      sb.append('[')
      var j = 0
      while (j < s) {
        if (j > 0) sb.append(',')
        val v = g.coords(i * s + j)
        // JSON has no NaN/Infinity tokens: emitting the WKT spellings
        // would produce a line our own parser (and jq/GDAL) rejects —
        // refuse loudly, like the XYM guard
        if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
          throw new IllegalArgumentException(
            "GeoJSON numbers must be finite (RFC 7946): got " + v)
        sb.append(
          if (precision < 0) DoubleFormat.printShortest(v)
          else DoubleFormat.print(v, precision))
        j += 1
      }
      sb.append(']')
    }
    def seq(from: Int, until: Int): Unit = {
      sb.append('[')
      var i = from
      while (i < until) {
        if (i > from) sb.append(',')
        pos(i)
        i += 1
      }
      sb.append(']')
    }
    def rings(o: Array[Int], from: Int, until: Int): Unit = {
      sb.append('[')
      var r = from
      while (r < until) {
        if (r > from) sb.append(',')
        seq(o(r), o(r + 1))
        r += 1
      }
      sb.append(']')
    }
    g.geomType match {
      case GeomTypes.Point =>
        // an all-NaN position is the WKB/native spelling of POINT EMPTY
        // (Wkb writes NaN coords; castDims NaN-fills) — map it to the
        // GeoJSON empty form instead of tripping the finite-number guard
        val allNaN = !g.isEmpty &&
          (0 until s).forall(j => java.lang.Double.isNaN(g.coords(j)))
        if (g.isEmpty || allNaN) sb.append("[]") else pos(0)
      case GeomTypes.LineString | GeomTypes.MultiPoint =>
        seq(0, g.numCoords)
      case GeomTypes.Polygon | GeomTypes.MultiLineString =>
        rings(g.o0, 0, g.o0.length - 1)
      case GeomTypes.MultiPolygon =>
        sb.append('[')
        var p = 0
        while (p < g.o0.length - 1) {
          if (p > 0) sb.append(',')
          rings(g.o1, g.o0(p), g.o0(p + 1))
          p += 1
        }
        sb.append(']')
    }
    sb.append('}')
  }

  // --------------------------------------------------------------- parse

  def parse(s: String): Geom = {
    val p = new Parser(s)
    p.skipWs()
    val g = p.parseGeometry()
    p.skipWs()
    if (p.pos < s.length)
      throw new IllegalArgumentException(
        s"trailing characters after GeoJSON geometry at ${p.pos}")
    g
  }

  /** One RFC 7946 Feature: (geometry, properties-as-raw-JSON, id). A bare
    * geometry object is accepted as a feature with no properties (GeoJSONSeq
    * files mix both). `geometry: null` yields a null geometry. */
  def parseFeature(s: String): Feature = {
    val p = new Parser(s)
    p.skipWs()
    val f = p.parseFeature()
    p.skipWs()
    if (p.pos < s.length)
      throw new IllegalArgumentException(
        s"trailing characters after GeoJSON feature at ${p.pos}")
    f
  }

  final case class Feature(geometry: Geom, propertiesJson: String,
                           id: Option[String])

  /** One RFC 7946 FeatureCollection document -> its features, in file
    * order. A bare Feature or geometry object is accepted as a singleton
    * collection (tools emit all three at the top level). NOTE a
    * FeatureCollection is ONE JSON document — whole-file parse by
    * construction; GeoJSONSeq is the splittable/scalable spelling. */
  def parseFeatureCollection(s: String): Array[Feature] = {
    val p = new Parser(s)
    p.skipWs()
    val fs = p.parseFeatureCollection()
    p.skipWs()
    if (p.pos < s.length)
      throw new IllegalArgumentException(
        s"trailing characters after GeoJSON document at ${p.pos}")
    fs
  }

  /** Minimal recursive-descent JSON reader specialized to RFC 7946
    * geometry objects: accepts any member order, skips foreign members
    * (`bbox`, …) per spec §6.1. */
  private final class Parser(s: String) {
    var pos = 0

    def skipWs(): Unit =
      while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"GeoJSON parse error at $pos: $msg")

    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    private def peek(): Char = {
      skipWs()
      if (pos >= s.length) fail("unexpected end")
      s.charAt(pos)
    }

    private def parseString(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (pos >= s.length) fail("bad escape")
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (pos + 4 >= s.length) fail("bad \\u escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => fail(s"bad escape '\\$other'")
          }
        } else sb.append(c)
        pos += 1
      }
      if (pos >= s.length) fail("unterminated string")
      pos += 1
      sb.toString
    }

    private def parseNumber(): Double = {
      skipWs()
      val start = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0)
        pos += 1
      if (pos == start) fail("expected number")
      val tok = s.substring(start, pos)
      // parseDouble throws NumberFormatException on malformed tokens like
      // '1e+' or '1.2.3' — surface it as a POSITIONED parse error so the
      // try-variants and parseFeature's geometry fallback (which catch
      // IllegalArgumentException only) treat it like every syntax error
      try java.lang.Double.parseDouble(tok)
      catch { case _: NumberFormatException => fail(s"malformed number '$tok'") }
    }

    /** Skips any JSON value (foreign members). */
    private def skipValue(): Unit = peek() match {
      case '"' => parseString()
      case '{' =>
        expect('{')
        if (peek() != '}') {
          var more = true
          while (more) {
            parseString(); expect(':'); skipValue()
            if (peek() == ',') { pos += 1 } else more = false
          }
        }
        expect('}')
      case '[' =>
        expect('[')
        if (peek() != ']') {
          var more = true
          while (more) {
            skipValue()
            if (peek() == ',') { pos += 1 } else more = false
          }
        }
        expect(']')
      case c if c == 't' || c == 'f' || c == 'n' =>
        while (pos < s.length && Character.isLetter(s.charAt(pos))) pos += 1
      case _ => parseNumber()
    }

    /** Raw nested coordinate arrays, depth discovered while reading. */
    private sealed trait Node
    private case class Num(v: Double) extends Node
    private case class Arr(items: List[Node]) extends Node

    private def parseNode(): Node = {
      if (peek() == '[') {
        expect('[')
        val items = scala.collection.mutable.ListBuffer.empty[Node]
        if (peek() != ']') {
          var more = true
          while (more) {
            items += parseNode()
            if (peek() == ',') { pos += 1 } else more = false
          }
        }
        expect(']')
        Arr(items.toList)
      } else Num(parseNumber())
    }

    /** Feature or bare geometry object (GeoJSONSeq files mix both). */
    def parseFeature(): GeoJson.Feature = {
      val save = pos
      try GeoJson.Feature(parseGeometry(), "{}", None)
      catch {
        case _: IllegalArgumentException =>
          pos = save
          parseFeatureObject()
      }
    }

    private def parseFeatureObject(): GeoJson.Feature = {
      expect('{')
      var typ: String = null
      var geom: Geom = null
      var props = "{}"
      var id: Option[String] = None
      if (peek() != '}') {
        var more = true
        while (more) {
          val key = parseString()
          expect(':')
          key match {
            case "type" => typ = parseString()
            case "geometry" =>
              if (peek() == 'n') { skipValue(); geom = null }
              else geom = parseGeometry()
            case "properties" =>
              // raw JSON substring, handed through verbatim (schema-free)
              skipWs()
              val st = pos
              skipValue()
              props = s.substring(st, pos)
            case "id" =>
              if (peek() == '"') id = Some(parseString())
              else {
                skipWs()
                val st = pos
                skipValue()
                id = Some(s.substring(st, pos).trim)
              }
            case _ => skipValue() // foreign member
          }
          if (peek() == ',') { pos += 1 } else more = false
        }
      }
      expect('}')
      if (typ != "Feature") fail("expected a Feature or geometry object")
      GeoJson.Feature(geom, props, id)
    }

    /** FeatureCollection, or Feature / bare geometry as a singleton. */
    def parseFeatureCollection(): Array[GeoJson.Feature] = {
      val save = pos
      committedToCollection = false
      try parseCollectionObject()
      catch {
        // fall back to singleton ONLY while the document could still be a
        // bare Feature/geometry. Once the parse has seen
        // "type":"FeatureCollection" or a "features" key, the document IS
        // a collection and its error (with position) must surface — a
        // blind fallback would re-parse from the start and report a
        // useless "expected a Feature" at offset 0, masking which feature
        // actually broke.
        case _: IllegalArgumentException if !committedToCollection =>
          pos = save
          Array(parseFeature())
      }
    }

    private var committedToCollection = false

    private def parseCollectionObject(): Array[GeoJson.Feature] = {
      expect('{')
      var typ: String = null
      var feats: Array[GeoJson.Feature] = null
      if (peek() != '}') {
        var more = true
        while (more) {
          val key = parseString()
          expect(':')
          key match {
            case "type" =>
              typ = parseString()
              if (typ == "FeatureCollection") committedToCollection = true
            case "features" =>
              committedToCollection = true
              expect('[')
              val buf = scala.collection.mutable.ArrayBuffer.empty[GeoJson.Feature]
              if (peek() != ']') {
                var m2 = true
                while (m2) {
                  buf += parseFeature()
                  if (peek() == ',') { pos += 1 } else m2 = false
                }
              }
              expect(']')
              feats = buf.toArray
            case _ => skipValue() // bbox and other foreign members
          }
          if (peek() == ',') { pos += 1 } else more = false
        }
      }
      expect('}')
      if (typ != "FeatureCollection") fail("expected a FeatureCollection")
      if (feats == null) fail("FeatureCollection missing \"features\"")
      feats
    }

    def parseGeometry(): Geom = {
      expect('{')
      var typ: String = null
      var coords: Node = null
      var geoms: List[Geom] = null
      if (peek() != '}') {
        var more = true
        while (more) {
          val key = parseString()
          expect(':')
          key match {
            case "type" => typ = parseString()
            case "coordinates" => coords = parseNode()
            case "geometries" =>
              expect('[')
              val parts = scala.collection.mutable.ListBuffer.empty[Geom]
              if (peek() != ']') {
                var m2 = true
                while (m2) {
                  parts += parseGeometry()
                  if (peek() == ',') { pos += 1 } else m2 = false
                }
              }
              expect(']')
              geoms = parts.toList
            case _ => skipValue() // foreign member (bbox, …): legal, skipped
          }
          if (peek() == ',') { pos += 1 } else more = false
        }
      }
      expect('}')
      if (typ == null) fail("missing \"type\"")
      build(typ, coords, geoms)
    }

    // ---- nested-array -> flat Geom buffers

    private def posOf(n: Node): Array[Double] = n match {
      case Arr(items) if items.nonEmpty && items.forall(_.isInstanceOf[Num]) =>
        if (items.length < 2 || items.length > 3)
          fail(s"position must have 2 or 3 elements, got ${items.length}")
        items.map(_.asInstanceOf[Num].v).toArray
      case _ => fail("expected a [x, y(, z)] position")
    }

    private def seqOf(n: Node): Array[Array[Double]] = n match {
      case Arr(items) => items.map(posOf).toArray
      case _ => fail("expected an array of positions")
    }

    private def dimsOf(positions: Iterator[Array[Double]]): Int = {
      var dims = 0
      positions.foreach { p =>
        val d = if (p.length == 3) Dims.XYZ else Dims.XY
        if (dims == 0) dims = d
        else if (dims != d) fail("mixed 2D/3D positions")
      }
      if (dims == 0) Dims.XY else dims
    }

    private def flat(seqs: Array[Array[Array[Double]]]): (Array[Double], Array[Int], Int) = {
      val dims = dimsOf(seqs.iterator.flatten)
      val stride = Geom.strideOf(dims)
      val total = seqs.map(_.length).sum
      val coords = new Array[Double](total * stride)
      val offs = new Array[Int](seqs.length + 1)
      var ci = 0
      var r = 0
      while (r < seqs.length) {
        offs(r + 1) = offs(r) + seqs(r).length
        seqs(r).foreach { p =>
          System.arraycopy(p, 0, coords, ci, stride)
          ci += stride
        }
        r += 1
      }
      (coords, offs, dims)
    }

    private def build(typ: String, coords: Node, geoms: List[Geom]): Geom =
      typ match {
        case "Point" =>
          coords match {
            case Arr(Nil) => Geom(GeomTypes.Point, Dims.XY, Geom.emptyDoubles)
            case n =>
              val p = posOf(n)
              Geom(GeomTypes.Point,
                if (p.length == 3) Dims.XYZ else Dims.XY, p)
          }
        case "LineString" | "MultiPoint" =>
          val t = if (typ == "LineString") GeomTypes.LineString
            else GeomTypes.MultiPoint
          val ps = seqOf(coords)
          val dims = dimsOf(ps.iterator)
          Geom(t, dims, ps.flatten.toArray)
        case "Polygon" | "MultiLineString" =>
          val t = if (typ == "Polygon") GeomTypes.Polygon
            else GeomTypes.MultiLineString
          val rs = coords match {
            case Arr(items) => items.map(seqOf).toArray
            case _ => fail("expected nested coordinate arrays")
          }
          val (cs, offs, dims) = flat(rs)
          Geom(t, dims, cs, offs)
        case "MultiPolygon" =>
          val polys = coords match {
            case Arr(items) => items.map {
              case a @ Arr(rings) => rings.map(seqOf).toArray
              case _ => fail("expected polygon ring arrays")
            }.toArray
            case _ => fail("expected nested coordinate arrays")
          }
          val (cs, ringOffs, dims) = flat(polys.flatten)
          val polyOffs = new Array[Int](polys.length + 1)
          var p = 0
          while (p < polys.length) {
            polyOffs(p + 1) = polyOffs(p) + polys(p).length
            p += 1
          }
          Geom(GeomTypes.MultiPolygon, dims, cs, polyOffs, ringOffs)
        case "GeometryCollection" =>
          val parts = if (geoms == null) Nil else geoms
          val dims = parts.headOption.map(_.dims).getOrElse(Dims.XY)
          if (parts.exists(_.dims != dims)) fail("mixed dims in collection")
          Geom(GeomTypes.Collection, dims, Geom.emptyDoubles,
            Geom.emptyInts, Geom.emptyInts, parts.toArray)
        case other => fail(s"unknown geometry type \"$other\"")
      }
  }
}
