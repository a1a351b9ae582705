package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sql.Geo

/** Distributed map-tile rasterization: points → z/x/y grayscale PNG tiles
  * (the geospatial×image bridge — what a slippy-map / heatmap pipeline
  * runs over the whole corpus). Shape for 100 TB:
  *
  *   1. one narrow projection computes the WORLD pixel per point — two
  *      codegen'd `StaticInvoke` kernels (one mercator projection total;
  *      tile and in-tile pixel are integer decompositions of it),
  *      pipelined with the scan;
  *   2. `groupBy(tile, pixel)` — map-side partial aggregation collapses
  *      each input partition to ≤ size² rows per tile BEFORE the only
  *      data-sized shuffle, so shuffle volume is bounded by tiles×pixels,
  *      not by input rows;
  *   3. `groupBy(tile)` packs (pixel, clamped count) into one long each and
  *      renders the PNG per tile — per-group state is ≤ size² longs (≈512
  *      KiB at 256²), a hard bound, so no tile can OOM an executor however
  *      skewed the points are (the count clamp at 255 happens BEFORE the
  *      pack, keeping the render kernel integer-exact).
  *
  * Rows with null coordinates are dropped up front (they belong to no
  * tile). The output is one row per non-empty tile; empty tiles are simply
  * absent (a serving layer treats missing as fully transparent).
  */
object TileRender {

  /** Render every non-empty `zoom`-level tile of `points` as a
    * `size`×`size` grayscale PNG whose intensity is min(255, point count)
    * per pixel — or, with `weightCol`, min(255, Σ weight) per pixel
    * (weights cast to long; render any integral measure, not just
    * density). Returns (tile_id, z, x, y, png). */
  def renderTiles(points: DataFrame, lonCol: String, latCol: String,
                  zoom: Int, size: Int = 256,
                  weightCol: Option[String] = None): DataFrame = {
    require(zoom >= 0 && zoom <= 29, s"zoom out of [0,29]: $zoom")
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    Geo.register(points.sparkSession)
    val counts = worldPixels(points, lonCol, latCol, zoom, size, weightCol)
      .groupBy("wx", "wy")
      .agg(weightCol.fold(count(lit(1)))(_ => sum(col("w"))).as("n"))
    renderCells(cellsFromWorldPixels(counts, lit(zoom), size), size)
  }

  /** Render a full tile pyramid, zoom `maxZoom` down to `minZoom`, in ONE
    * pass over the points: each point's finest-level world pixel is
    * computed once and aggregated FIRST (the only input-sized stage — one
    * hash-agg probe per point, map-side combine before the one data-sized
    * exchange), then the aggregated pixels — already collapsed to the
    * occupied-pixel count — explode into every coarser level by exact
    * integer halving (`size` must be a power of two — then every scaling
    * in the pixel math is an exact power-of-two multiplication, so
    * `worldPixel(z) >> 1 == worldPixel(z-1)` holds bit-for-bit and the
    * pyramid is the standard overzoom reduction, not a re-render) and
    * re-aggregate through a second, occupied-pixels-sized shuffle. An
    * earlier cut exploded BEFORE aggregating — levels × input rows through
    * the hot partial agg — and measured 0.73 N→4N efficiency where this
    * shape matches the single-level renderer. No caching, no per-level
    * job chain. Returns (tile_id, z, x, y, png) for every non-empty tile
    * at every level. */
  def renderPyramid(points: DataFrame, lonCol: String, latCol: String,
                    minZoom: Int, maxZoom: Int, size: Int = 256,
                    weightCol: Option[String] = None): DataFrame = {
    require(0 <= minZoom && minZoom <= maxZoom && maxZoom <= 29,
      s"bad zoom range [$minZoom,$maxZoom]")
    require(size > 0 && size <= 4096 && (size & (size - 1)) == 0,
      s"pyramid tile size must be a power of two in (0,4096]: $size")
    Geo.register(points.sparkSession)
    val base = worldPixels(points, lonCol, latCol, maxZoom, size, weightCol)
      .groupBy("wx", "wy")
      .agg(weightCol.fold(count(lit(1)))(_ => sum(col("w"))).as("n"))
    val lvls = (minZoom to maxZoom).map { z =>
      val k = maxZoom - z
      struct(lit(z).as("z"),
        shiftrightunsigned(col("wx"), k).as("wx"),
        shiftrightunsigned(col("wy"), k).as("wy"))
    }
    val counts = base
      .select(explode(array(lvls: _*)).as("lvl"), col("n"))
      .select(col("lvl.z").as("z"), col("lvl.wx").as("wx"),
        col("lvl.wy").as("wy"), col("n"))
      .groupBy("z", "wx", "wy")
      .agg(sum(col("n")).as("n"))
    renderCells(cellsFromWorldPixels(counts, col("z"), size), size)
  }

  /** Categorical / multi-measure overlay: three weight columns render into
    * the R, G and B channels independently (each pixel's channel =
    * min(255, Σ weight)). The canonical use is one-hot category weights —
    * e.g. three event classes — so a pixel's color shows the local mix.
    * Same scale shape as [[renderTiles]]: one projection per point, one
    * input-sized partial agg (three sums instead of one), pixel-bounded
    * shuffles, per-tile state ≤ size² longs. */
  def renderTilesRgb(points: DataFrame, lonCol: String, latCol: String,
                     zoom: Int, rCol: String, gCol: String, bCol: String,
                     size: Int = 256): DataFrame = {
    require(zoom >= 0 && zoom <= 29, s"zoom out of [0,29]: $zoom")
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    Geo.register(points.sparkSession)
    val lon = col(lonCol).cast("double")
    val lat = col(latCol).cast("double")
    def clamp(c: Column): Column = least(greatest(c, lit(0L)), lit(255L))
    val counts = points
      .where(lon.isNotNull && lat.isNotNull)
      .select(
        call_function("st_worldpixelx", lon, lit(zoom), lit(size)).as("wx"),
        call_function("st_worldpixely", lat, lit(zoom), lit(size)).as("wy"),
        col(rCol).cast("long").as("r"), col(gCol).cast("long").as("g"),
        col(bCol).cast("long").as("b"))
      .groupBy("wx", "wy")
      .agg(sum(col("r")).as("r"), sum(col("g")).as("g"), sum(col("b")).as("b"))
    val cells = counts.select(
      call_function("st_tilepack", lit(zoom),
        expr(s"CAST(wx DIV $size AS INT)"),
        expr(s"CAST(wy DIV $size AS INT)")).as("tile_id"),
      ((col("wy") % size) * size + col("wx") % size).cast("int").as("pixel"),
      (shiftleft(clamp(col("r")), 16) + shiftleft(clamp(col("g")), 8) +
        clamp(col("b"))).as("rgb"))
    cells
      .select(col("tile_id"),
        (shiftleft(col("pixel").cast("long"), 32) + col("rgb")).as("packed"))
      .groupBy("tile_id")
      .agg(collect_list(col("packed")).as("cells"))
      .select(
        col("tile_id"),
        call_function("st_tilez", col("tile_id")).as("z"),
        call_function("st_tilex", col("tile_id")).as("x"),
        call_function("st_tiley", col("tile_id")).as("y"),
        call_function("tile_render_rgb", lit(size), col("cells")).as("png"))
  }

  /** Rasterize GEOMETRIES into `zoom`-level tiles: each pixel's intensity
    * is min(255, Σ weight of the geometries that rasterize onto it) —
    * weight defaults to 1, i.e. an overlap-count raster. Polygon
    * INTERIORS fill (pixel-center, even-odd, half-open — so zone rasters
    * partition the grid with no seams or double-lit shared edges);
    * LINESTRINGs stroke as width-1 supercover (trajectories/roads —
    * `strokeWidthPx` for thicker round-capped capsules); points light
    * nothing (use
    * [[renderTiles]] for density). Semantics live in
    * [[graft.core.Raster]]. Returns (tile_id, z, x, y, png).
    *
    * Scale shape: per-polygon work is proportional to its COVERED pixels,
    * not to the input size — the PROJECTED-space tile cover
    * (`st_tilecoverraster`, a guaranteed superset of the fill, unlike the
    * geographic `st_tilecover` whose straight lon/lat edges can prune
    * slanted projected interiors) explodes each
    * polygon to only the tiles it touches, the scanline kernel emits only
    * lit pixels, and the one data-sized shuffle is the (tile, pixel)
    * aggregation, hard-bounded by tiles × size² exactly like the point
    * renderer. A world-spanning polygon at high zoom is bounded by its
    * cover (≤ 4^zoom tiles) — pick zoom accordingly. */
  def renderPolygonTiles(polys: DataFrame, geomCol: String, zoom: Int,
                         size: Int = 256,
                         weightCol: Option[String] = None,
                         strokeWidthPx: Double = 0.0): DataFrame = {
    require(zoom >= 0 && zoom <= 29, s"zoom out of [0,29]: $zoom")
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    require(strokeWidthPx >= 0.0 && strokeWidthPx <= size,
      s"stroke width out of [0,size]: $strokeWidthPx")
    Geo.register(polys.sparkSession)
    val w = weightCol.fold(lit(1L))(c => col(c).cast("long"))
    val cover =
      if (strokeWidthPx > 0.0)
        call_function("st_tilecoverraster", col("__g"), lit(zoom), lit(size),
          lit(strokeWidthPx / 2.0))
      else
        call_function("st_tilecoverraster", col("__g"), lit(zoom), lit(size))
    val raster =
      if (strokeWidthPx > 0.0)
        call_function("st_tilerasterize", col("tile_id"), lit(size),
          col("__g"), lit(strokeWidthPx))
      else
        call_function("st_tilerasterize", col("tile_id"), lit(size), col("__g"))
    val cells = polys
      .select(col(geomCol).as("__g"), w.as("__w"))
      .select(col("__g"), col("__w"), explode(cover).as("tile_id"))
      .select(col("tile_id"), explode(raster).as("pixel"), col("__w"))
      .groupBy("tile_id", "pixel")
      .agg(sum(col("__w")).as("n"))
    renderCells(cells, size)
  }

  /** Zonal statistics — the raster→vector direction: aggregate a rendered
    * tile store (tile_id, png) by polygon zone. A pixel belongs to the
    * zone whose interior covers its center (same fill rule as
    * [[renderPolygonTiles]], so zones that partition space partition the
    * pixels). Returns (zone_id, px_sum, px_count): the sum of rendered
    * gray values and the number of lit pixels in each zone.
    *
    * Scale shape: the ZONE side is the small one — its (tile, pixel,
    * zone) rows broadcast (bounded by zones × covered pixels; callers with
    * lake-sized zone sets should tile-partition instead). The tile store —
    * the 100-TB side — only flows through a codegen'd PNG-decode explode,
    * the broadcast hash join, and a partial aggregation on zone_id: no
    * raster-side shuffle at all. */
  def zonalStats(tiles: DataFrame, zones: DataFrame, zoneIdCol: String,
                 geomCol: String, zoom: Int, size: Int = 256): DataFrame = {
    require(zoom >= 0 && zoom <= 29, s"zoom out of [0,29]: $zoom")
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    Geo.register(tiles.sparkSession)
    val zonePix = zones
      .select(col(zoneIdCol).as("zone_id"), col(geomCol).as("__g"))
      .select(col("zone_id"), col("__g"),
        explode(call_function("st_tilecoverraster", col("__g"), lit(zoom),
          lit(size))).as("tile_id"))
      .select(col("zone_id"), col("tile_id"),
        explode(call_function("st_tilerasterize",
          col("tile_id"), lit(size), col("__g"))).as("pixel"))
    val pix = tiles
      .select(col("tile_id"),
        explode(call_function("tile_pixel_values", col("png"))).as("pv"))
      .select(col("tile_id"),
        shiftrightunsigned(col("pv"), 32).cast("int").as("pixel"),
        (col("pv").bitwiseAND(lit(0xffffffffL))).as("v"))
    pix.join(broadcast(zonePix), Seq("tile_id", "pixel"))
      .groupBy("zone_id")
      .agg(sum(col("v")).as("px_sum"), count(lit(1)).as("px_count"))
  }

  /** Integer-kernel convolution (correlation orientation: out(x,y) =
    * Σ k[r][c]·in(x+c-cx, y+r-cy), then floor-divide by `divisor`) over a
    * RENDERED tile store (tile_id, png) — raster algebra's stencil step:
    * Gaussian blur ([[GaussianKernel]]/16) for heatmap smoothing, edge
    * detection, dilation-ish spreads. Zero padding at the world boundary;
    * results clamp to [0, 255] on render. Output values are exact integer
    * arithmetic end-to-end (decode → multiply → sum → floor-div), so a
    * closed-form SQL oracle can replay them (q138).
    *
    * 100-TB shape — the distributed-stencil HALO EXCHANGE, with no
    * neighbor-tile join at all: each lit pixel SCATTERS its ≤ k² weighted
    * contributions onto WORLD pixel coordinates, and the single
    * (z, world-pixel) aggregation (map-side partial combine first)
    * reassembles every output pixel — including one that straddles a tile
    * boundary and needs three neighbor tiles' pixels — exactly like the
    * point renderer's own shuffle. Shuffle volume is bounded by
    * k² × lit pixels (k² ≤ 25), per-tile state stays ≤ size² longs, and
    * tiles that were absent but receive bleed-over from a lit neighbor
    * appear in the output (absent = all-zero, the render convention).
    * Multi-zoom stores convolve per level (z rides the key). */
  def convolve(tiles: DataFrame, kernel: Seq[Seq[Long]], divisor: Long,
               size: Int = 256): DataFrame = {
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    require(divisor > 0, s"divisor must be positive: $divisor")
    val k = kernel.length
    require(k > 0 && k % 2 == 1 && k <= 5 && kernel.forall(_.length == k),
      s"kernel must be square with odd side <= 5: ${k}x?")
    Geo.register(tiles.sparkSession)
    val c = k / 2
    // scatter form of the correlation: input pixel p contributes
    // k[r][col]·v to out(p.x - (col-c), p.y - (r-c))
    val taps = for {
      r <- 0 until k; cc <- 0 until k if kernel(r)(cc) != 0L
    } yield struct(lit(c - cc).as("dx"), lit(c - r).as("dy"),
      lit(kernel(r)(cc)).as("w"))
    val px = tiles.select(
        call_function("st_tilez", col("tile_id")).as("z"),
        (call_function("st_tilex", col("tile_id")).cast("long") * size)
          .as("tx0"),
        (call_function("st_tiley", col("tile_id")).cast("long") * size)
          .as("ty0"),
        explode(call_function("tile_pixel_values", col("png"))).as("pv"))
      .select(col("z"),
        (col("tx0") + shiftrightunsigned(col("pv"), 32) % size).as("wx"),
        (col("ty0") + expr(s"shiftrightunsigned(pv, 32) DIV $size")).as("wy"),
        col("pv").bitwiseAND(lit(0xffffffffL)).as("v"))
    val world = expr(s"shiftleft(CAST(1 AS BIGINT), z) * $size")
    val counts = px
      .select(col("z"), explode(array(taps: _*)).as("t"), col("wx"),
        col("wy"), col("v"))
      .select(col("z"), (col("wx") + col("t.dx")).as("wx"),
        (col("wy") + col("t.dy")).as("wy"), (col("v") * col("t.w")).as("c"))
      .where(col("wx") >= 0L && col("wy") >= 0L &&
        col("wx") < world && col("wy") < world)
      .groupBy("z", "wx", "wy")
      .agg(expr(s"sum(c) DIV ${divisor}L").as("n"))
    renderCells(cellsFromWorldPixels(counts, col("z"), size), size)
  }

  /** The separable binomial 3×3 kernel [1,2,1]⊗[1,2,1]; divide by 16. */
  val GaussianKernel: Seq[Seq[Long]] =
    Seq(Seq(1L, 2L, 1L), Seq(2L, 4L, 2L), Seq(1L, 2L, 1L))

  /** Per-tile decoded-pixel MSE between two rendered tile stores
    * (tile_id, png) — render regression checking: the north rule's
    * decoded-pixel invariant applied store-to-store (two pipeline runs,
    * a re-render after a code change, streaming vs batch output).
    * FULL OUTER on tile_id: a tile present in only one store yields a
    * null `mse` (img_mse of a null payload) — flagged, not dropped.
    * Pure tile-keyed equi-join + codegen'd kernel: no data-sized
    * shuffle beyond the (tiny, tile-count-bounded) join itself. */
  def tileDiff(a: DataFrame, b: DataFrame): DataFrame = {
    Geo.register(a.sparkSession)
    a.select(col("tile_id"), col("png").as("__a"))
      .join(b.select(col("tile_id"), col("png").as("__b")),
        Seq("tile_id"), "full_outer")
      .select(col("tile_id"),
        call_function("st_tilez", col("tile_id")).as("z"),
        call_function("st_tilex", col("tile_id")).as("x"),
        call_function("st_tiley", col("tile_id")).as("y"),
        call_function("img_mse", col("__a"), col("__b")).as("mse"),
        call_function("img_psnr", col("__a"), col("__b")).as("psnr"))
  }

  /** Null-safe world-pixel projection: one mercator evaluation per point,
    * null coordinates dropped (they belong to no tile). */
  private def worldPixels(points: DataFrame, lonCol: String, latCol: String,
                          zoom: Int, size: Int,
                          weightCol: Option[String]): DataFrame = {
    val lon = col(lonCol).cast("double")
    val lat = col(latCol).cast("double")
    points
      .where(lon.isNotNull && lat.isNotNull)
      .select(Seq(
        call_function("st_worldpixelx", lon, lit(zoom), lit(size)).as("wx"),
        call_function("st_worldpixely", lat, lit(zoom), lit(size)).as("wy")) ++
        weightCol.map(w => col(w).cast("long").as("w")): _*)
  }

  /** (z?, wx, wy, n) → (tile_id, pixel, n): tile ordinates and the in-tile
    * pixel are integer decompositions of the world pixel (`wx DIV size ==
    * tileX` exactly — spec-asserted invariant). */
  private def cellsFromWorldPixels(counts: DataFrame, z: Column,
                                   size: Int): DataFrame =
    counts.select(
      call_function("st_tilepack", z,
        expr(s"CAST(wx DIV $size AS INT)"),
        expr(s"CAST(wy DIV $size AS INT)")).as("tile_id"),
      ((col("wy") % size) * size + col("wx") % size).cast("int").as("pixel"),
      col("n"))

  /** Shared render tail: (tile_id, pixel, n) counts → one PNG row per
    * (extraGroupCols..., tile). The pack clamps the count to the render
    * range BEFORE the per-tile collect, so per-group state is
    * hard-bounded at size² longs regardless of skew. Extra group columns
    * (e.g. a streaming event-time window) ride along unchanged. */
  private[graft] def renderCells(counts: DataFrame, size: Int,
                                 extraGroupCols: Seq[String] = Nil): DataFrame = {
    val keys = extraGroupCols :+ "tile_id"
    counts
      .select(keys.map(col) :+
        // clamp to [0, 255] BEFORE the pack: a negative weighted sum would
        // otherwise borrow into the pixel bits of the packed long
        ((shiftleft(col("pixel").cast("long"), 32) +
          least(greatest(col("n"), lit(0L)), lit(255L))).as("packed")): _*)
      .groupBy(keys.map(col): _*)
      .agg(collect_list(col("packed")).as("cells"))
      .select(keys.map(col) ++ Seq(
        call_function("st_tilez", col("tile_id")).as("z"),
        call_function("st_tilex", col("tile_id")).as("x"),
        call_function("st_tiley", col("tile_id")).as("y"),
        call_function("tile_render", lit(size), col("cells")).as("png")): _*)
  }
}
