package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sql.Geo

/** Distributed map-tile rasterization: points → z/x/y grayscale PNG tiles
  * (the geospatial×image bridge — what a slippy-map / heatmap pipeline
  * runs over the whole corpus). Shape for 100 TB:
  *
  *   1. one narrow projection computes (tile_id, pixel) per point —
  *      codegen'd `StaticInvoke` kernels, pipelined with the scan;
  *   2. `groupBy(tile, pixel).count()` — map-side partial aggregation
  *      collapses each input partition to ≤ size² rows per tile BEFORE the
  *      only shuffle, so shuffle volume is bounded by tiles×pixels, not by
  *      input rows;
  *   3. `groupBy(tile)` packs (pixel, clamped count) into one long each and
  *      renders the PNG per tile — per-group state is ≤ size² longs (≈512
  *      KiB at 256²), a hard bound, so no tile can OOM an executor however
  *      skewed the points are (the count clamp at 255 happens BEFORE the
  *      pack, keeping the render kernel integer-exact).
  *
  * The output is one row per non-empty tile; empty tiles are simply absent
  * (a serving layer treats missing as fully transparent).
  */
object TileRender {

  /** Render every non-empty `zoom`-level tile of `points` as a
    * `size`×`size` grayscale PNG whose intensity is min(255, point count)
    * per pixel. Returns (tile_id, z, x, y, png). */
  def renderTiles(points: DataFrame, lonCol: String, latCol: String,
                  zoom: Int, size: Int = 256): DataFrame = {
    require(zoom >= 0 && zoom <= 29, s"zoom out of [0,29]: $zoom")
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    Geo.register(points.sparkSession)
    val lon = col(lonCol).cast("double")
    val lat = col(latCol).cast("double")
    points
      .select(
        call_function("st_tilezxy", lon, lat, lit(zoom)).as("tile_id"),
        call_function("st_tilepixel", lon, lat, lit(zoom), lit(size)).as("pixel"))
      .groupBy("tile_id", "pixel").agg(count(lit(1)).as("n"))
      .select(col("tile_id"),
        (shiftleft(col("pixel").cast("long"), 32) +
          least(col("n"), lit(255L))).as("packed"))
      .groupBy("tile_id")
      .agg(collect_list(col("packed")).as("cells"))
      .select(
        col("tile_id"),
        call_function("st_tilez", col("tile_id")).as("z"),
        call_function("st_tilex", col("tile_id")).as("x"),
        call_function("st_tiley", col("tile_id")).as("y"),
        call_function("tile_render", lit(size), col("cells")).as("png"))
  }
}
