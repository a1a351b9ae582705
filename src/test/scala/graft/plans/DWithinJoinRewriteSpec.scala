package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Geo

class DWithinJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  private def points(seed: Long, n: Int) = (0 until n).map { i =>
    val h = graft.sql.GeoOps.splitmix64(seed + i)
    (i.toLong,
      java.lang.Long.remainderUnsigned(h, 600000L) / 10000.0,
      java.lang.Long.remainderUnsigned(
        java.lang.Long.divideUnsigned(h, 600000L), 400000L) / 10000.0)
  }

  test("naive st_dwithinxy join is rewritten to a grid equi-join") {
    Geo.register(spark)
    val a = points(11L, 3000).toDF("aid", "ax", "ay")
    val b = points(99L, 60).toDF("bid", "bx", "by")

    val naive = a.join(b, call_function("st_dwithinxy",
      col("ax"), col("ay"), col("bx"), col("by"), lit(0.5)))
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rewrite should eliminate the nested-loop join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a keyed join in:\n$plan")

    // results identical to the brute-force distance filter
    val got = naive.select("aid", "bid").as[(Long, Long)].collect().toSet
    val expected = a.crossJoin(b)
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <= 0.25)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("non-literal radius is left alone (no silent wrong cover)") {
    Geo.register(spark)
    val a = points(5L, 50).toDF("aid", "ax", "ay")
    val b = points(6L, 50).toDF("bid", "bx", "by")
    // radius comes from a column — cell res can't be chosen at plan time
    val naive = a.crossJoin(b).filter(call_function("st_dwithinxy",
      col("ax"), col("ay"), col("bx"), col("by"), col("ax") * 0 + 0.3))
    val expected = a.crossJoin(b)
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <= 0.09)
      .count()
    assert(naive.count() == expected)
  }
}
