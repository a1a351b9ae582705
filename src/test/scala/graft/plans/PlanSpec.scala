package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpatialJoins
import graft.sources.ImagesTable
import graft.sql.Geo

/** Plan-shape regression tests: the properties that make the operators
  * scale (broadcast dim sides, pruned scans, no spurious shuffles) asserted
  * against the optimized plans, so a refactor that silently degrades the
  * plan fails CI — the `.explain`-and-iterate loop, pinned. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark

  private def writtenImages(n: Long): String = {
    val dir = s"target/planspec_images_$n"
    if (!new java.io.File(dir).exists())
      ImagesTable.generate(spark, n).write.mode("overwrite").parquet(dir)
    dir
  }

  test("flagship PIP join broadcasts the polygon side; big side never shuffles pre-agg") {
    Geo.register(spark)
    val images = spark.read.parquet(writtenImages(2000))
    val polys = ImagesTable.polygonLayer(spark)
    val plan = SpatialJoins.pipJoin(images, polys, "poly", "lon", "lat", zoom = 6)
      .groupBy(col("poly_id")).count()
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // exactly one Exchange: the post-join aggregation; the scan side feeds
    // the broadcast join without shuffling
    assert(plan.split("Exchange").length - plan.split("BroadcastExchange").length + 1 <= 2, plan)
  }

  test("large polygon sets take the sort-merge path on the cell key") {
    Geo.register(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val images = spark.read.parquet(writtenImages(2000))
      val polys = ImagesTable.polygonLayer(spark)
      val plan = SpatialJoins.pipJoin(images, polys, "poly", "lon", "lat",
        zoom = 6, broadcastPolys = false)
        .groupBy(col("poly_id")).count()
        .queryExecution.executedPlan.toString
      // the equi-join on the tile key hash-partitions both sides — the
      // plan Catalyst picks when the dim side outgrows broadcast; the
      // st_containsxy refine rides as the join condition, never a
      // nested-loop
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("scan prunes payload columns out of the flagship plan") {
    Geo.register(spark)
    val images = spark.read.parquet(writtenImages(2000))
    val polys = ImagesTable.polygonLayer(spark)
    val qe = SpatialJoins.assignTiles(
      SpatialJoins.pipJoin(images, polys, "poly", "lon", "lat", zoom = 6),
      "lon", "lat", zoom = 8)
      .groupBy(col("poly_id"), col("tile_id")).count()
      .queryExecution
    val readSchema = "ReadSchema.*".r.findFirstIn(
      qe.explainString(org.apache.spark.sql.execution.FormattedMode)).getOrElse("")
    assert(readSchema.contains("lon") && readSchema.contains("lat"), readSchema)
    assert(!readSchema.contains("bytes") && !readSchema.contains("caption"),
      s"payload columns must be pruned: $readSchema")
  }

  test("tile assignment is a pure projection (no exchange)") {
    Geo.register(spark)
    val images = spark.read.parquet(writtenImages(2000))
    val plan = SpatialJoins.assignTiles(images, "lon", "lat", zoom = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("predicate pushdown reaches the parquet scan") {
    Geo.register(spark)
    val images = spark.read.parquet(writtenImages(2000))
    val formatted = images.filter(col("phash") > 1000L).select("image_id")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: [IsNotNull(phash), GreaterThan(phash,1000)]"),
      formatted)
  }
}
