package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpatialJoins
import graft.sources.ImagesTable
import graft.sql.Geo

class ContainsJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  test("naive st_contains join is rewritten to a hash-joinable equi-join") {
    Geo.register(spark)
    val pts = (0 until 2000).map { i =>
      val h = graft.sql.GeoOps.splitmix64(55L + i)
      (i.toLong,
        java.lang.Long.remainderUnsigned(h, 3600000L) / 10000.0 - 180.0,
        java.lang.Long.remainderUnsigned(
          java.lang.Long.divideUnsigned(h, 3600000L), 1700000L) / 10000.0 - 85.0)
    }.toDF("pid", "lon", "lat")
    val polys = ImagesTable.polygonLayer(spark)

    // the naive formulation a user would write: no join keys, just the
    // spatial predicate
    val naive = pts.join(polys,
      call_function("st_containsxy", col("poly"), col("lon"), col("lat")))
    val plan = naive.queryExecution.executedPlan.toString

    assert(!plan.contains("NestedLoopJoin"),
      s"rewrite should eliminate the nested-loop join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a keyed join in:\n$plan")

    // results identical to the hand-built cover join
    val got = naive.select("pid", "poly_id").as[(Long, Long)].collect().toSet
    val expected = SpatialJoins.pipJoin(pts, polys, "poly", "lon", "lat", zoom = 6)
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("st_contains (geometry-geometry) joins rewrite too") {
    Geo.register(spark)
    val pts = (0 until 500).map { i =>
      val h = graft.sql.GeoOps.splitmix64(77L + i)
      (i.toLong,
        java.lang.Long.remainderUnsigned(h, 3600000L) / 10000.0 - 180.0,
        java.lang.Long.remainderUnsigned(
          java.lang.Long.divideUnsigned(h, 3600000L), 1700000L) / 10000.0 - 85.0)
    }.toDF("pid", "lon", "lat")
      .withColumn("pt", call_function("st_point", col("lon"), col("lat")))
    val polys = ImagesTable.polygonLayer(spark)
    val naive = polys.join(pts, call_function("st_contains", col("poly"), col("pt")))
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin"), plan)
    val got = naive.select("pid", "poly_id").as[(Long, Long)].collect().toSet
    val expected = SpatialJoins.pipJoin(pts, polys, "poly", "lon", "lat", zoom = 6)
      .select("pid", "poly_id").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("joins that already have an equality are left alone") {
    Geo.register(spark)
    val a = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val b = Seq((1L, "x"), (3L, "y")).toDF("k2", "w")
    val joined = a.join(b, col("k") === col("k2"))
    assert(joined.count() == 1)
  }
}
