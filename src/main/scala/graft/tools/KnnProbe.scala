package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Knn
import graft.sql.Geo

/** Optimization-round probe (guide §1): q94/q88 round-by-round timing. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("knn-probe")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Geo.register(spark)
    Seq("lineitem", "nation").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    spark.table("lineitem").repartition(cpus)
      .createOrReplaceTempView("lineitem_par")

    val pts = spark.sql(
      """SELECT l_orderkey, l_linenumber,
        |  CAST((l_orderkey * 131 + l_partkey * 7 + l_linenumber) % 3600000 AS DOUBLE) / 10000.0 - 180.0 AS lon,
        |  CAST((l_orderkey * 37 + l_suppkey * 11 + l_linenumber) % 1700000 AS DOUBLE) / 10000.0 - 85.0 AS lat
        |FROM lineitem_par""".stripMargin)
    val qs = spark.sql(
      """SELECT n_nationkey AS qid,
        |  CAST(n_nationkey AS DOUBLE) * 14.0 - 179.9500001 + 7.0 AS qlon,
        |  (CAST(n_nationkey AS DOUBLE) * 41.0) % 160.0 - 79.9500001 + 12.5 AS qlat
        |FROM nation""".stripMargin)

    (0 until 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      var last = System.nanoTime()
      val t0 = last
      val out = Knn.knnMetersJoinAdaptive(pts, qs, k = 5,
        tieCols = Seq("l_orderkey", "l_linenumber"),
        onRound = (r, l, n) => {
          val now = System.nanoTime()
          println(f"[probe] round $r level $l retired $n: ${(now - last) / 1e9}%.3f s")
          last = now
        })
      val c = out.count()
      println(f"[probe] total (n=$c): ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
