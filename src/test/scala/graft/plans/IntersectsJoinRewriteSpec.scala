package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpatialJoins
import graft.sources.ImagesTable
import graft.sql.Geo

class IntersectsJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  private def boxes(n: Int, seed: Long) = {
    Geo.register(spark)
    (0 until n).map { i =>
      val h = graft.sql.GeoOps.splitmix64(seed + i)
      (i.toLong,
        java.lang.Long.remainderUnsigned(h, 3400000L) / 10000.0 - 170.0,
        java.lang.Long.remainderUnsigned(
          java.lang.Long.divideUnsigned(h, 3400000L), 1500000L) / 10000.0 - 75.0)
    }.toDF("bid", "lon", "lat")
      .selectExpr("bid",
        "st_boxtopolygon(lon - 2.0, lat - 1.5, lon + 2.0, lat + 1.5) AS bg")
  }

  test("naive st_intersects join is rewritten to a hash-joinable equi-join, exactly once") {
    val left = boxes(1500, 91L)
    val polys = ImagesTable.polygonLayer(spark).selectExpr("poly_id", "poly AS pg")

    // the naive formulation a user would write: no join keys at all
    val naive = left.join(polys,
      call_function("st_intersects", col("bg"), col("pg")))
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin"),
      s"rewrite should eliminate the nested-loop join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)

    // results identical to the hand-built operator — and each pair once
    // (the min-shared-cover-tile claim rides the rewritten condition)
    val got = naive.select("bid", "poly_id").as[(Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, "rewrite must not duplicate pairs")
    val expected = SpatialJoins.intersectsJoin(left, polys, "bg", "pg",
        zoom = 6)
      .select("bid", "poly_id").as[(Long, Long)].collect().toSet
    assert(got.toSet == expected && expected.nonEmpty)
  }

  test("joins that already have an equality key are left alone") {
    val a = boxes(50, 13L).withColumn("k", col("bid") % 5)
    // same positions slightly shifted — guaranteed overlaps per key
    val b = boxes(50, 13L).withColumn("k", col("bid") % 5)
      .selectExpr("k",
        "st_translate(bg, CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE)) AS bg2")
    val keyed = a.join(b, a("k") === b("k") &&
      call_function("st_intersects", col("bg"), col("bg2")))
    val analyzed = keyed.queryExecution.optimizedPlan.toString
    assert(!analyzed.contains("__ltile"),
      s"hash-joinable joins must not be rewritten:\n$analyzed")
    assert(keyed.count() > 0)
  }
}
