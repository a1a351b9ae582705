package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dissolve (merge-by-attribute): union every geometry sharing a key into
  * one polygon — the classic `GROUP BY key → ST_Union(geom)` operator
  * (admin boundaries from parcels, coverage footprints from per-image
  * tiles, etc.).
  *
  * Scale shape. `st_union_agg` buffers a group's geometries before the
  * canonical cascaded union — a deliberate collect-then-fold, because the
  * merge tree must be a pure function of the group VALUE for the result
  * to be partition/retry-invariant, so no schedule-ordered streaming
  * partial union is admissible. Group state is therefore bounded by the
  * largest single group, like `collect_list`. For keys with very large
  * geometry counts, pass `cellSize`: each key's group is split by the hex
  * bucket of each geometry's first vertex (`st_hexcellofgeom` — a pure
  * function of the value, never of the schedule), partial unions run per
  * (key, bucket), and a second pass unions the per-bucket partials. Per-
  * task state is then bounded by the densest BUCKET, not the whole key,
  * and because hex buckets are spatially coherent, nearby polygons weld
  * into compact partials before crossing the second (tiny) shuffle.
  *
  * Two-level vs direct: identical VALUES whenever the overlay arithmetic
  * is exact for the inputs (axis-aligned/grid geometries — DissolveSpec
  * asserts bit-equality); for general inputs the two shapes may differ in
  * sub-ulp FP residue on derived intersection vertices, exactly like any
  * re-association of a floating-point reduction. Each shape is itself
  * deterministic for a fixed `cellSize`.
  */
object Dissolve {

  /** Union all geometries of `geomCol` per `keyCols` group.
    *
    * @param cellSize hex-bucket circumradius (input-frame units) for the
    *                 two-level shape; None = direct single aggregation.
    */
  def dissolve(df: DataFrame, keyCols: Seq[String], geomCol: String,
               cellSize: Option[Double] = None): DataFrame = {
    require(keyCols.nonEmpty, "dissolve needs at least one key column")
    val keys = keyCols.map(col)
    cellSize match {
      case None =>
        df.groupBy(keys: _*)
          .agg(expr(s"st_union_agg($geomCol)").as(geomCol))
      case Some(size) =>
        require(size > 0.0, s"dissolve cellSize must be > 0: $size")
        df.withColumn("__dissolve_bucket",
            expr(s"st_hexcellofgeom($geomCol, ${size}d)"))
          .groupBy((keys :+ col("__dissolve_bucket")): _*)
          .agg(expr(s"st_union_agg($geomCol)").as(geomCol))
          .groupBy(keys: _*)
          .agg(expr(s"st_union_agg($geomCol)").as(geomCol))
    }
  }
}
