package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline
import graft.sql.Geo

/** Scratch profiler for the merge/compaction query path (q111/q112):
  * times each Pipeline step separately so the optimization round knows
  * where the seconds actually go. Not part of the driver contract. */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Geo.register(s)
    s.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("lineitem")
    s.table("lineitem").repartition(cpus).createOrReplaceTempView("lineitem_par")

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // sub-step split of writeSnapshot itself
    for (round <- 1 to 2) {
      println(s"[probe] ---- writeSnapshot internals, round $round")
      val dir = java.nio.file.Files.createTempDirectory("graft_probe_ws").toString
      val pts0 = s.sql(
        """SELECT l_orderkey, l_linenumber,
          |  CAST((l_orderkey * 131 + l_partkey * 7 + l_linenumber) % 3600000 AS DOUBLE) / 10000.0 - 180.0 AS lon,
          |  CAST((l_orderkey * 37 + l_suppkey * 11 + l_linenumber) % 1700000 AS DOUBLE) / 10000.0 - 85.0 AS lat
          |FROM lineitem_par""".stripMargin)
        .withColumn("key", concat(lit("k"), col("l_orderkey"), lit("_"),
          col("l_linenumber")))
      val data = Pipeline.withBucket(pts0, "lon", "lat", 3)
        .withColumn("snapshot_id", lit(1L))
      t("  write partitioned") {
        data.repartition(col("bucket"))
          .write.mode("append").partitionBy("snapshot_id", "bucket")
          .parquet(s"$dir/data")
      }
      // (committer-v2 and uncompressed variants were probed here: warm
      // 1.16 vs 1.14 vs 1.09 s — the write cost is input compute +
      // shuffle, not commit or codec, so Pipeline keeps the defaults)
      val written = t("  read-back open") {
        s.read.parquet(s"$dir/data/snapshot_id=1")
          .withColumn("bucket", col("bucket").cast("long"))
      }
      val manifest = t("  manifest agg+write") {
        val m = written.groupBy(col("bucket"))
          .agg(count(lit(1)).as("rows"),
            lit(null).cast("long").as("bytes"),
            min(col("key").cast("string")).as("min_key"),
            max(col("key").cast("string")).as("max_key"))
          .withColumn("snapshot_id", lit(1L))
        m.write.mode("append").parquet(s"$dir/manifests")
        m
      }
      manifest.count()
    }

    for (round <- 1 to 2) {
      println(s"[probe] ---- round $round")
      val dir = java.nio.file.Files.createTempDirectory("graft_probe").toString
      val pts = s.sql(
        """SELECT l_orderkey, l_linenumber,
          |  CAST((l_orderkey * 131 + l_partkey * 7 + l_linenumber) % 3600000 AS DOUBLE) / 10000.0 - 180.0 AS lon,
          |  CAST((l_orderkey * 37 + l_suppkey * 11 + l_linenumber) % 1700000 AS DOUBLE) / 10000.0 - 85.0 AS lat
          |FROM lineitem_par""".stripMargin)
        .withColumn("key", concat(lit("k"), col("l_orderkey"), lit("_"),
          col("l_linenumber")))
      val b = Pipeline.withBucket(pts, "lon", "lat", 3)
      t("writeSnapshot 1") {
        Pipeline.writeSnapshot(b.withColumn("ver", lit("v1")), dir, 1L,
          keyCol = "key", bytesCol = "__none")
      }
      val upd = b.filter(col("l_orderkey") % 5 === 0)
        .withColumn("ver", lit("v2"))
      val fresh = b.filter(col("l_orderkey") % 97 === 0)
        .withColumn("key", concat(col("key"), lit("_new")))
        .withColumn("ver", lit("v1new"))
      t("mergeSnapshot 2") {
        Pipeline.mergeSnapshot(upd.unionByName(fresh), dir, 2L,
          mergeKeyCol = "key", bytesCol = "__none")
      }
      t("deleteWhere 3") {
        Pipeline.deleteWhere(s, dir, col("l_linenumber") === 4, 3L,
          keyCol = "key")
      }
      t("readCurrent count") {
        Pipeline.readCurrent(s, dir, keyCol = "key").count()
      }
      t("compactSnapshots") {
        Pipeline.compactSnapshots(s, dir, 3L, keyCol = "key",
          bytesCol = "__none")
      }
      t("post requires") {
        val dels = s.read.parquet(s"$dir/deletes").count()
        val raw = s.read.parquet(s"$dir/data").count()
        val cur = Pipeline.readCurrent(s, dir, keyCol = "key").count()
        Pipeline.dataFileCount(dir)
        (dels, raw, cur)
      }
      t("readCurrent final orderBy") {
        Pipeline.readCurrent(s, dir, keyCol = "key")
          .select(col("key"), col("ver"),
            col("snapshot_id").cast("long").as("snap"))
          .orderBy("key").count()
      }
    }
    s.stop()
  }
}
