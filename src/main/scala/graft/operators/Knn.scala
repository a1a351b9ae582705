package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sql.{Geo, GeoOps}

/** Exact kNN via cell-ring expansion (SURVEY.md §2C).
  *
  * Queries are a small broadcastable set; points are the big side. Each
  * round builds the ring-r candidate cell set per query (driver-side ring
  * arithmetic over a few thousand cells, broadcast-joined against the
  * points' grid cell — the big side shuffles at most its candidate subset),
  * takes top-k per query by a window, and checks the completeness radius:
  * a query is done when its k-th best distance is <= ((r-1)*res)^2, because
  * every point within that distance lies inside Chebyshev ring r of the
  * query cell. Incomplete queries double r. Results are exact and
  * deterministic (ties broken by the caller's tie columns).
  */
object Knn {

  /** @param points   df with lonCol/latCol + payload columns
    * @param queries  collected small query set: (qid, qlon, qlat)
    * @param k        neighbors per query
    * @param res      grid resolution in degrees
    * @param tieCols  deterministic tie-break columns on the point side
    * @return columns: qid, rank, dist2 + point payload columns
    */
  def knn(points: DataFrame, queries: Seq[(Long, Double, Double)], k: Int,
          res: Double, tieCols: Seq[String]): DataFrame = {
    val spark = points.sparkSession
    Geo.register(spark)
    import spark.implicits._

    // contract: the point side exposes its coordinates as `lon`/`lat`
    val pts = points
      .withColumn("__cell", call_function("st_gridcell",
        col("lon").cast("double"), col("lat").cast("double"), lit(res)))

    var r = 2
    var remaining = queries
    var acc: DataFrame = null
    val maxR = math.ceil(360.0 / res).toInt + 1

    while (remaining.nonEmpty && r <= maxR * 2) {
      val candCells = remaining.flatMap { case (qid, qlon, qlat) =>
        val qcell = GeoOps.gridCell(qlon, qlat, res)
        ringCells(qcell, r).map(c => (qid, qlon, qlat, c))
      }.toDF("__qid", "__qlon", "__qlat", "__ccell")

      val joined = pts.join(broadcast(candCells), $"__cell" === $"__ccell")
        .withColumn("__dist2",
          ($"lon" - $"__qlon") * ($"lon" - $"__qlon") +
            ($"lat" - $"__qlat") * ($"lat" - $"__qlat"))

      val w = Window.partitionBy($"__qid")
        .orderBy($"__dist2" +: tieCols.map(col): _*)
      val topk = joined
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= k)
        .drop("__cell", "__ccell")
        .cache()

      val complete = topk.groupBy($"__qid")
        .agg(count(lit(1)).as("n"), max($"__dist2").as("kth"))
        .collect()
        .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2)))
        .toMap2

      val bound = (r - 1).toDouble * res
      val done = remaining.filter { case (qid, _, _) =>
        complete.get(qid).exists { case (n, kth) =>
          n >= k && kth <= bound * bound
        }
      }
      val doneIds = done.map(_._1).toSet
      if (done.nonEmpty) {
        val part = topk.filter($"__qid".isin(doneIds.toSeq: _*))
          .withColumnRenamed("__qid", "qid")
          .withColumnRenamed("__dist2", "dist2")
          .drop("__qlon", "__qlat")
        acc = if (acc == null) part else acc.unionByName(part)
      }
      remaining = remaining.filterNot(q => doneIds.contains(q._1))
      r *= 2
    }
    require(remaining.isEmpty, s"kNN did not converge for ${remaining.size} queries")
    acc
  }

  /** Fully distributed variant: queries stay a DataFrame (any cardinality).
    * Each round explodes ring-r candidate cells per *incomplete* query,
    * equi-joins against the points' grid cell (Catalyst/AQE picks broadcast
    * vs shuffle from stats), takes windowed top-k, and retires queries whose
    * k-th distance is inside the guaranteed radius. Rounds are O(log) in
    * the distance to the k-th neighbor; no driver-side data loops — the
    * only per-round action is an `isEmpty` on the shrinking query set.
    *
    * @param queries df with columns qid, qlon, qlat */
  def knnJoin(points: DataFrame, queries: DataFrame, k: Int, res: Double,
              tieCols: Seq[String]): DataFrame = {
    val spark = points.sparkSession
    Geo.register(spark)
    import spark.implicits._

    val pts = points.withColumn("__cell", call_function("st_gridcell",
      col("lon").cast("double"), col("lat").cast("double"), lit(res)))
    var remaining = queries.select(col("qid"),
        col("qlon").cast("double").as("qlon"),
        col("qlat").cast("double").as("qlat"))
      .withColumn("__qcell", call_function("st_gridcell",
        col("qlon"), col("qlat"), lit(res)))
      .cache()
    var r = 2
    var acc: DataFrame = null
    val maxR = math.ceil(360.0 / res).toInt + 1

    while (!remaining.isEmpty && r <= maxR * 2) {
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
        .cache()
      val bound = (r - 1).toDouble * res
      val doneIds = topk.groupBy($"qid")
        .agg(count(lit(1)).as("__n"), max($"__dist2").as("__kth"))
        .filter($"__n" >= k && $"__kth" <= bound * bound)
        .select($"qid")
      val part = topk.join(broadcast(doneIds), Seq("qid"), "left_semi")
        .withColumnRenamed("__dist2", "dist2")
        .drop("__cell", "__ccell", "__qcell", "qlon", "qlat")
      acc = if (acc == null) part else acc.unionByName(part)
      // materialize this round's results before mutating `remaining`
      acc = acc.cache()
      acc.count()
      remaining = remaining.join(broadcast(doneIds), Seq("qid"), "left_anti").cache()
      r *= 2
    }
    require(remaining.isEmpty, "kNN join did not converge")
    acc
  }

  private def ringCells(cell: Long, r: Int): Seq[Long] = {
    val gx = cell >> 32
    val gy = (cell << 32) >> 32
    for (dx <- -r to r; dy <- -r to r)
      yield ((gx + dx) << 32) | ((gy + dy) & 0xffffffffL)
  }

  private implicit class Tuple3Map(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Double)] =
      rows.map { case (a, b, c) => a -> ((b, c)) }.toMap
  }
}
