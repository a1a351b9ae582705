package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sql.Geo

/** Scaling diagnosis: a pure-compute job (range -> cell/tile kernels ->
  * agg; no IO, no join, no broadcast) at several thread counts, to separate
  * machine-level scaling limits (co-tenant steal, bandwidth) from job-level
  * ones (scan, broadcast, shuffle). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val n = 400000000L
    Seq(2, 4, 8, 16, 32).foreach { cores =>
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", 64)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      Geo.register(s)
      def job(): Long = s.range(0, n, 1, 256)
        .withColumn("lon", (col("id") % 3600000).cast("double") / 10000.0 - 180.0)
        .withColumn("lat", (col("id") % 1700000).cast("double") / 10000.0 - 85.0)
        .select(
          call_function("st_cellid", col("lon"), col("lat"), lit(12)).as("c"),
          call_function("st_tilezxy", col("lon"), col("lat"), lit(12)).as("t"))
        .agg(sum(col("c") % 97 + col("t") % 89)).collect()(0).getLong(0)
      job() // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
      }
      println(f"cores=$cores%2d times=${times.map(t => f"$t%.2f").mkString(",")} " +
        f"best=${times.min}%.2f rows/s=${(n / times.min).toLong}")
      s.stop()
    }
  }
}
