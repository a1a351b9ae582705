package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sql.Geo

/** Skew handling for hot cells (SURVEY.md §2C): two-pass adaptive cell
  * split — count by cell, then re-key rows of cells above `threshold` to a
  * finer level, so no single join/agg key exceeds the threshold by more
  * than the child fan-out allows. Complements AQE's skew-join splitting
  * (which salvages sort-merge joins) by fixing the key distribution itself,
  * which also helps aggregations and writes. */
object AdaptiveCells {

  /** Adds `cell`: the level-`baseLevel` cell id, refined to `fineLevel`
    * for cells whose row count exceeds `threshold`. The hot-cell set is
    * collected (it is tiny by construction) and broadcast as a literal
    * filter — no extra shuffle of the big side beyond the counting pass. */
  def splitHotCells(df: DataFrame, lonCol: String, latCol: String,
                    baseLevel: Int, fineLevel: Int, threshold: Long): DataFrame = {
    require(fineLevel > baseLevel, "fineLevel must be finer than baseLevel")
    Geo.register(df.sparkSession)
    val base = df.withColumn("__base_cell", call_function("st_cellid",
      col(lonCol).cast("double"), col(latCol).cast("double"), lit(baseLevel)))
    val hot = base.groupBy(col("__base_cell"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
      .select("__base_cell")
      .collect()
      .map(_.getLong(0))
    if (hot.isEmpty) {
      base.withColumnRenamed("__base_cell", "cell")
    } else {
      base.withColumn("cell",
          when(col("__base_cell").isin(hot.toSeq: _*),
            call_function("st_cellid", col(lonCol).cast("double"),
              col(latCol).cast("double"), lit(fineLevel)))
            .otherwise(col("__base_cell")))
        .drop("__base_cell")
    }
  }
}
