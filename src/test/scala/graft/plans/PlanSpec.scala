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

  test("hausdorffJoin broadcasts the right side; no nested loop either mode") {
    Geo.register(spark)
    import spark.implicits._
    val l = Seq((1L, "LINESTRING (0 0, 1 1)"), (2L, "LINESTRING (30 30, 31 31)"))
      .toDF("id", "w").selectExpr("id", "st_geomfromwkt(w) AS g")
    val r = l.selectExpr("id AS id2", "g AS g2")
    val bPlan = SpatialJoins.hausdorffJoin(l, r, "g", "g2", maxDist = 2.0)
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"), bPlan)
    assert(!bPlan.contains("BroadcastNestedLoopJoin") &&
      !bPlan.contains("CartesianProduct"), bPlan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sPlan = SpatialJoins.hausdorffJoin(l, r, "g", "g2", maxDist = 2.0,
          broadcastRight = false)
        .queryExecution.executedPlan.toString
      assert(sPlan.contains("SortMergeJoin") || sPlan.contains("ShuffledHashJoin"), sPlan)
      assert(!sPlan.contains("BroadcastNestedLoopJoin") &&
        !sPlan.contains("CartesianProduct"), sPlan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("editNearDups: hash equi-join on deletion keys, never a nested loop") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (i.toLong, s"caption $i")).toDF("id", "text")
    for (mb <- Seq(0, 64)) {
      val plan = graft.operators.Dedup.editNearDups(rows, "text", "id", maxBand = mb)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"maxBand=$mb:\n$plan")
    }
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
    // r06: IsNotNull(phash) no longer appears — it was injected by
    // InferFiltersFromConstraints, which the engine excludes because its
    // inferred filters duplicate kernel evaluation in the cover-join
    // plans (Geo.register). The USER predicate still reaches the scan,
    // which is what this test protects.
    assert(formatted.contains("PushedFilters: [GreaterThan(phash,1000)]"),
      formatted)
  }

  // Every `WindowExec: No Partition Defined` warning the Verify run emits
  // maps to one of the rank-filtered windows asserted here: the rank<=k
  // filter inserts a PARTIAL WindowGroupLimit below the exchange, so each
  // upstream partition forwards at most k rows (per group) — the single
  // reducer receives O(partitions * k), never the corpus. The warning is
  // therefore benign by construction; these asserts keep it that way.
  private def assertGroupLimited(plan: String, what: String): Unit = {
    assert(plan.contains("WindowGroupLimit"),
      s"$what: expected map-side top-k pruning (WindowGroupLimit):\n$plan")
    assert(plan.contains("Partial"),
      s"$what: expected a PARTIAL (pre-exchange) group limit:\n$plan")
  }

  test("Vocab.topTokens global rank window prunes map-side") {
    import spark.implicits._
    val docs = (0 until 200).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 13} tok${i % 3}"))
      .toDF("doc_id", "text").repartition(4)
    val plan = graft.operators.Vocab.topTokens(docs, "text", "doc_id", k = 10)
      .queryExecution.executedPlan.toString
    // the global (partition-less) rank window gets rewritten even more
    // aggressively than WindowGroupLimit: LimitPushDownThroughWindow turns
    // rank<=k over a total order into TakeOrderedAndProject(limit=k) — a
    // distributed top-k where every partition forwards at most k rows and
    // no global-window exchange of the token counts exists at all
    assert(plan.contains("TakeOrderedAndProject(limit=10") ||
      plan.contains("WindowGroupLimit"),
      s"Vocab.topTokens: expected a bounded global top-k:\n$plan")
  }

  test("ANN sq8 + projected rerank windows prune map-side") {
    import spark.implicits._
    import graft.sql.GeoOps
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(j =>
        ((GeoOps.splitmix64(i * 8L + j) % 1000L) / 500.0 - 1.0).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(4)
    val queries = vecs.take(3).toDF("qid", "qvec")
    val sq8 = graft.operators.Ann.sq8TopK(df, queries, "embedding",
      "vec_id", "qid", "qvec", k = 5).queryExecution.executedPlan.toString
    assertGroupLimited(sq8, "Ann.sq8TopK")
    // both windows (candidate scan + exact rerank) must be group-limited
    assert(sq8.linesIterator.count(_.contains("WindowGroupLimit")) >= 2, sq8)
    val proj = graft.operators.Ann.projectedTopK(df, queries, "embedding",
      "vec_id", "qid", "qvec", k = 5, projDim = 4, rerank = 2)
      .queryExecution.executedPlan.toString
    assertGroupLimited(proj, "Ann.projectedTopK")
    assert(proj.linesIterator.count(_.contains("WindowGroupLimit")) >= 2, proj)
  }
}
