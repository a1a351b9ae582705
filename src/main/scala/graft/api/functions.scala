package graft.api

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Column DSL over the engine's SQL functions — `import graft.api.functions._`
  * and write `df.select(st_aswkt(st_geomfromwkt($"wkt")))`. Requires
  * [[register]] (idempotent) on the session, which `SparkEntry`/`Verify`/
  * `Bench` and every operator entry point already call. */
object functions {

  def register(spark: SparkSession): Unit = graft.sql.Geo.register(spark)

  private def f(name: String)(cols: Column*): Column = call_function(name, cols: _*)

  // codecs
  def st_geomfromwkt(c: Column): Column = f("st_geomfromwkt")(c)
  def st_trygeomfromwkt(c: Column): Column = f("st_trygeomfromwkt")(c)
  def st_geomfromwkb(c: Column): Column = f("st_geomfromwkb")(c)
  def st_trygeomfromwkb(c: Column): Column = f("st_trygeomfromwkb")(c)
  def st_aswkt(c: Column): Column = f("st_aswkt")(c)
  def st_aswkb(c: Column): Column = f("st_aswkb")(c)
  def st_format(g: Column, precision: Column): Column = f("st_format")(g, precision)
  def st_format(g: Column, precision: Column, maxBytes: Column): Column =
    f("st_format")(g, precision, maxBytes)
  def st_isvalidwkt(c: Column): Column = f("st_isvalidwkt")(c)
  def st_isvalidwkb(c: Column): Column = f("st_isvalidwkb")(c)
  def st_asgeojson(g: Column): Column = f("st_asgeojson")(g)
  def st_asgeojson(g: Column, precision: Column): Column =
    f("st_asgeojson")(g, precision)
  def st_geomfromgeojson(c: Column): Column = f("st_geomfromgeojson")(c)
  def st_trygeomfromgeojson(c: Column): Column = f("st_trygeomfromgeojson")(c)
  def st_geojson_feature(c: Column): Column = f("st_geojson_feature")(c)
  def st_trygeojson_feature(c: Column): Column = f("st_trygeojson_feature")(c)

  // kernels / accessors
  def st_envelope(g: Column): Column = f("st_envelope")(g)
  def st_typeid(g: Column): Column = f("st_typeid")(g)
  def st_geometrytype(g: Column): Column = f("st_geometrytype")(g)
  def st_numgeometries(g: Column): Column = f("st_numgeometries")(g)
  def st_numcoords(g: Column): Column = f("st_numcoords")(g)
  def st_isempty(g: Column): Column = f("st_isempty")(g)
  def st_castdims(g: Column, dims: Column): Column = f("st_castdims")(g, dims)
  def st_casttype(g: Column, t: Column): Column = f("st_casttype")(g, t)
  def st_snaptogrid(g: Column, p: Column): Column = f("st_snaptogrid")(g, p)
  def st_point(x: Column, y: Column): Column = f("st_point")(x, y)
  def st_x(g: Column): Column = f("st_x")(g)
  def st_y(g: Column): Column = f("st_y")(g)
  def st_srid(g: Column): Column = f("st_srid")(g)
  def st_setsrid(g: Column, srid: Column): Column = f("st_setsrid")(g, srid)

  // box + native GeoArrow layout interchange
  def st_boxgeom(box: Column): Column = f("st_boxgeom")(box)
  def st_makebox(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    f("st_makebox")(xmin, ymin, xmax, ymax)
  def st_tonative(g: Column, geometryType: Column, dims: Column,
                  coordType: Column): Column =
    f("st_tonative")(g, geometryType, dims, coordType)
  def st_fromnative(v: Column, geometryType: Column, dims: Column,
                    coordType: Column): Column =
    f("st_fromnative")(v, geometryType, dims, coordType)

  // predicates
  def st_contains(poly: Column, pt: Column): Column = f("st_contains")(poly, pt)
  def st_containsxy(poly: Column, x: Column, y: Column): Column =
    f("st_containsxy")(poly, x, y)
  def st_distancesq(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    f("st_distancesq")(x1, y1, x2, y2)

  // cell index
  def st_cellid(lon: Column, lat: Column, level: Column): Column =
    f("st_cellid")(lon, lat, level)
  def st_cellidofgeom(g: Column, level: Column): Column = f("st_cellidofgeom")(g, level)
  def st_celllevel(id: Column): Column = f("st_celllevel")(id)
  def st_cellparent(id: Column, level: Column): Column = f("st_cellparent")(id, level)
  def st_cellcontains(p: Column, c: Column): Column = f("st_cellcontains")(p, c)
  def st_cellchildren(id: Column): Column = f("st_cellchildren")(id)
  def st_cellneighbors(id: Column): Column = f("st_cellneighbors")(id)
  def st_cellringunion(id: Column, k: Column): Column = f("st_cellringunion")(id, k)
  def st_cellcover(g: Column, level: Column): Column = f("st_cellcover")(g, level)

  // tiles
  def st_tilezxy(lon: Column, lat: Column, z: Column): Column =
    f("st_tilezxy")(lon, lat, z)
  def st_tilez(id: Column): Column = f("st_tilez")(id)
  def st_tilex(id: Column): Column = f("st_tilex")(id)
  def st_tiley(id: Column): Column = f("st_tiley")(id)
  def st_tileparent(id: Column, zoom: Column): Column = f("st_tileparent")(id, zoom)
  def st_tilechildren(id: Column): Column = f("st_tilechildren")(id)
  def st_tileenvelope(id: Column): Column = f("st_tileenvelope")(id)
  def st_tilecover(g: Column, z: Column): Column = f("st_tilecover")(g, z)

  // grid
  def st_gridcell(lon: Column, lat: Column, res: Column): Column =
    f("st_gridcell")(lon, lat, res)
  def st_gridring(cell: Column, r: Column): Column = f("st_gridring")(cell, r)

  // aggregates
  def st_box_agg(g: Column): Column = f("st_box_agg")(g)
  def st_uniquetypes_agg(g: Column): Column = f("st_uniquetypes_agg")(g)
  def st_dump(g: Column): Column = f("st_dump")(g)
  def st_lineinterpolate(g: Column, frac: Column): Column =
    f("st_lineinterpolate")(g, frac)
  def st_pointn(g: Column, n: Column): Column = f("st_pointn")(g, n)
  def st_startpoint(g: Column): Column = f("st_startpoint")(g)
  def st_endpoint(g: Column): Column = f("st_endpoint")(g)
  def st_exteriorring(g: Column): Column = f("st_exteriorring")(g)
  def st_interiorringn(g: Column, n: Column): Column =
    f("st_interiorringn")(g, n)
  def st_numinteriorrings(g: Column): Column = f("st_numinteriorrings")(g)
  def st_makecollection(parts: Column): Column = f("st_makecollection")(parts)
  def st_intersection(a: Column, b: Column): Column = f("st_intersection")(a, b)
  def st_union(a: Column, b: Column): Column = f("st_union")(a, b)
  def st_difference(a: Column, b: Column): Column = f("st_difference")(a, b)
  def st_symdifference(a: Column, b: Column): Column = f("st_symdifference")(a, b)
  def st_collect_agg(g: Column): Column = f("st_collect_agg")(g)
  def st_union_agg(g: Column): Column = f("st_union_agg")(g)
  def st_hexcellofgeom(g: Column, size: Column): Column =
    f("st_hexcellofgeom")(g, size)
  def st_affine(g: Column, a: Column, b: Column, d: Column, e: Column,
                xoff: Column, yoff: Column): Column =
    f("st_affine")(g, a, b, d, e, xoff, yoff)
  def st_translate(g: Column, dx: Column, dy: Column): Column =
    f("st_translate")(g, dx, dy)
  def st_scale(g: Column, sx: Column, sy: Column): Column =
    f("st_scale")(g, sx, sy)

  // text / vector kernels
  def token_count(c: Column): Column = f("token_count")(c)
  def token_count_ws(c: Column): Column = f("token_count_ws")(c)
  def token_count_bpe(c: Column): Column = f("token_count_bpe")(c)
  def quality_stats(c: Column): Column = f("quality_stats")(c)
  def quality_score(c: Column): Column = f("quality_score")(c)
  def lang_id(c: Column): Column = f("lang_id")(c)
  def minhash(c: Column, shingle: Column, k: Column): Column =
    f("minhash")(c, shingle, k)
  def lsh_bands(sig: Column, rows: Column): Column = f("lsh_bands")(sig, rows)
  def simhash(c: Column): Column = f("simhash")(c)
  def hamming64(a: Column, b: Column): Column = f("hamming64")(a, b)
  def ngram_jaccard(a: Column, b: Column, n: Column): Column =
    f("ngram_jaccard")(a, b, n)
  def doc_fingerprint(c: Column, k: Column, w: Column): Column =
    f("doc_fingerprint")(c, k, w)
  def vec_dot(a: Column, b: Column): Column = f("vec_dot")(a, b)
  def vec_norm(a: Column): Column = f("vec_norm")(a)
  def vec_cosine(a: Column, b: Column): Column = f("vec_cosine")(a, b)
  def vec_l2sq(a: Column, b: Column): Column = f("vec_l2sq")(a, b)
  def vec_lshbucket(a: Column, bits: Column, seed: Column): Column =
    f("vec_lshbucket")(a, bits, seed)
  def vec_argmax_centroid(v: Column, codebook: Column): Column =
    f("vec_argmax_centroid")(v, codebook)
  def vec_argmin_l2(v: Column, codebook: Column): Column =
    f("vec_argmin_l2")(v, codebook)
  def vec_fixed(v: Column, scaleBits: Column): Column =
    f("vec_fixed")(v, scaleBits)
  def vec_topcentroids(v: Column, codebook: Column, nprobe: Column): Column =
    f("vec_topcentroids")(v, codebook, nprobe)
  def img_meta(bytes: Column): Column = f("img_meta")(bytes)
  def img_mse(a: Column, b: Column): Column = f("img_mse")(a, b)
  def img_psnr(a: Column, b: Column): Column = f("img_psnr")(a, b)
  def img_resize(bytes: Column, w: Column, h: Column): Column =
    f("img_resize")(bytes, w, h)
  def img_channel_sum(bytes: Column, channel: Column): Column =
    f("img_channel_sum")(bytes, channel)
  def img_nonzero(bytes: Column): Column = f("img_nonzero")(bytes)
  def img_histogram(bytes: Column, channel: Column): Column =
    f("img_histogram")(bytes, channel)
  def img_entropy(bytes: Column, channel: Column): Column =
    f("img_entropy")(bytes, channel)
  def st_tilepixel(lon: Column, lat: Column, z: Column, size: Column): Column =
    f("st_tilepixel")(lon, lat, z, size)
  def st_worldpixelx(lon: Column, z: Column, size: Column): Column =
    f("st_worldpixelx")(lon, z, size)
  def st_worldpixely(lat: Column, z: Column, size: Column): Column =
    f("st_worldpixely")(lat, z, size)
  def st_tilerasterize(tileId: Column, size: Column, g: Column): Column =
    f("st_tilerasterize")(tileId, size, g)
  def st_tilecoverraster(g: Column, zoom: Column, size: Column): Column =
    f("st_tilecoverraster")(g, zoom, size)
  def st_makeline(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    f("st_makeline")(x1, y1, x2, y2)
  def tile_pixel_values(png: Column): Column = f("tile_pixel_values")(png)
  def img_flip(bytes: Column, mode: Column): Column = f("img_flip")(bytes, mode)
  def img_rot90(bytes: Column, k: Column): Column = f("img_rot90")(bytes, k)
  def img_crop(bytes: Column, x: Column, y: Column, w: Column, h: Column): Column =
    f("img_crop")(bytes, x, y, w, h)
  def img_jpeg(bytes: Column, quality: Column): Column = f("img_jpeg")(bytes, quality)
  def tile_render(size: Column, packedCells: Column): Column =
    f("tile_render")(size, packedCells)
  def tile_render_rgb(size: Column, packedCells: Column): Column =
    f("tile_render_rgb")(size, packedCells)
  def splitmix64(c: Column): Column = f("splitmix64")(c)
}

/** Case-class mirror of the geometry struct (field-for-field with
  * `GeoStruct.dataType`), so `Dataset[T]` with geometry members encodes to
  * the exact same physical layout the SQL functions operate on:
  *
  * {{{
  * case class Feature(id: Long, geom: GeomValue)
  * val ds: Dataset[Feature] = df.as[Feature]   // struct column <-> case class
  * }}}
  */
case class GeomValue(gtype: Int, dims: Int, srid: Int, coords: Array[Double],
                     o0: Array[Int], o1: Array[Int], gc: Array[Byte]) {
  def toGeom: graft.core.Geom =
    if (gtype == graft.core.GeomTypes.Collection) graft.core.Wkb.parse(gc)
    else new graft.core.Geom(gtype, dims, srid, coords, o0, o1, null)
}

object GeomValue {
  def apply(g: graft.core.Geom): GeomValue =
    if (g.geomType == graft.core.GeomTypes.Collection)
      GeomValue(g.geomType, g.dims, g.srid, Array.empty, Array.empty,
        Array.empty, graft.core.Wkb.write(g))
    else GeomValue(g.geomType, g.dims, g.srid, g.coords, g.o0, g.o1, null)
}
