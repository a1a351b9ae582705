package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sql.Geo

/** Exact kNN via cell-ring expansion (SURVEY.md §2C).
  *
  * [[knnJoin]] is the engine path: queries stay a DataFrame of any
  * cardinality; each round explodes ring-r candidate cells per *incomplete*
  * query, equi-joins against the points' grid cell (Catalyst/AQE picks
  * broadcast vs shuffle from stats), takes windowed top-k, and retires
  * queries whose k-th distance is inside the guaranteed radius: a query is
  * done when its k-th best distance is <= ((r-1)*res)^2, because every point
  * within that distance lies inside Chebyshev ring r of the query cell.
  * Rounds are O(log) in the distance to the k-th neighbor. No driver-side
  * data loops — the only per-round driver actions are an `isEmpty` gate on
  * the shrinking query set and cache bookkeeping. Results are exact and
  * deterministic (ties broken by the caller's tie columns).
  */
object Knn {

  /** Convenience wrapper for a driver-side query list.
    *
    * @param points   df with lonCol/latCol + payload columns
    * @param queries  small query set: (qid, qlon, qlat)
    * @param k        neighbors per query
    * @param res      grid resolution in degrees
    * @param tieCols  deterministic tie-break columns on the point side
    * @return columns: qid, rank, dist2 + point payload columns
    */
  def knn(points: DataFrame, queries: Seq[(Long, Double, Double)], k: Int,
          res: Double, tieCols: Seq[String]): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    knnJoin(points, queries.toDF("qid", "qlon", "qlat"), k, res, tieCols)
  }

  /** The distributed kNN join. @param queries df with qid, qlon, qlat. */
  def knnJoin(points: DataFrame, queries: DataFrame, k: Int, res: Double,
              tieCols: Seq[String]): DataFrame = {
    val spark = points.sparkSession
    Geo.register(spark)
    import spark.implicits._

    val pts = points.withColumn("__cell", call_function("st_gridcell",
      col("lon").cast("double"), col("lat").cast("double"), lit(res)))

    // one round's plan: (topk, doneIds, finished part)
    def round(remaining: DataFrame, r: Int): (DataFrame, DataFrame, DataFrame) = {
      val cand = remaining.withColumn("__ccell",
        explode(call_function("st_gridring", col("__qcell"), lit(r))))
      val joined = pts.join(cand, $"__cell" === $"__ccell")
        .withColumn("__dist2",
          ($"lon" - $"qlon") * ($"lon" - $"qlon") +
            ($"lat" - $"qlat") * ($"lat" - $"qlat"))
      val w = Window.partitionBy($"qid")
        .orderBy($"__dist2" +: tieCols.map(col): _*)
      val topk = joined
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= k)
      val bound = (r - 1).toDouble * res
      val doneIds = topk.groupBy($"qid")
        .agg(count(lit(1)).as("__n"), max($"__dist2").as("__kth"))
        .filter($"__n" >= k && $"__kth" <= bound * bound)
        .select($"qid")
      val part = topk.join(broadcast(doneIds), Seq("qid"), "left_semi")
        .withColumnRenamed("__dist2", "dist2")
        .drop("__cell", "__ccell", "__qcell", "qlon", "qlat")
      (topk, doneIds, part)
    }

    var remaining = queries.select(col("qid"),
        col("qlon").cast("double").as("qlon"),
        col("qlat").cast("double").as("qlat"))
      .withColumn("__qcell", call_function("st_gridcell",
        col("qlon"), col("qlat"), lit(res)))
      .cache()
    var r = 2
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val maxR = math.ceil(360.0 / res).toInt + 1

    while (!remaining.isEmpty && r <= maxR * 2) {
      val (topk, doneIds, part) = round(remaining, r)
      val topkCached = topk.cache()
      // finished rows: materialize + truncate lineage so this round's join
      // never re-executes when the final union is consumed
      parts += part.localCheckpoint(eager = true)
      val next = remaining
        .join(broadcast(doneIds), Seq("qid"), "left_anti").cache()
      next.count()
      // release the prior round's storage — executor memory stays O(1
      // round), not O(#rounds) (rounds grow ~log(distance to k-th))
      topkCached.unpersist(blocking = false)
      remaining.unpersist(blocking = false)
      remaining = next
      r *= 2
    }
    val converged = remaining.isEmpty
    remaining.unpersist(blocking = false)
    require(converged, "kNN join did not converge")
    if (parts.isEmpty) round(remaining, 2)._3.limit(0)
    else parts.reduce(_ unionByName _)
  }
}
