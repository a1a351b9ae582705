package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GeoOps

class KnnJoinSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  test("distributed knnJoin matches brute force at 200 queries") {
    val pts = (0 until 4000).map { i =>
      val h = GeoOps.splitmix64(100L + i)
      val lon = java.lang.Long.remainderUnsigned(h, 3600000L) / 10000.0 - 180.0
      val lat = java.lang.Long.remainderUnsigned(
        java.lang.Long.divideUnsigned(h, 3600000L), 1700000L) / 10000.0 - 85.0
      (i.toLong, lon, lat)
    }
    val queries = (0 until 200).map { i =>
      val h = GeoOps.splitmix64(9999L + i)
      val lon = java.lang.Long.remainderUnsigned(h, 3400000L) / 10000.0 - 170.0
      val lat = java.lang.Long.remainderUnsigned(
        java.lang.Long.divideUnsigned(h, 3400000L), 1500000L) / 10000.0 - 75.0
      (i.toLong, lon, lat)
    }
    val got = Knn.knnJoin(
      pts.toDF("pid", "lon", "lat"),
      queries.toDF("qid", "qlon", "qlat"),
      k = 3, res = 6.0, tieCols = Seq("pid"))
      .select("qid", "rank", "pid").as[(Long, Int, Long)].collect()
      .map(t => (t._1, t._2.toLong, t._3)).toSet

    val expected = queries.flatMap { case (qid, qlon, qlat) =>
      pts.map { case (pid, lon, lat) =>
        (pid, (lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat))
      }.sortBy { case (pid, d2) => (d2, pid) }
        .take(3).zipWithIndex.map { case ((pid, _), i) => (qid, (i + 1).toLong, pid) }
    }.toSet
    assert(got == expected)
  }
}
