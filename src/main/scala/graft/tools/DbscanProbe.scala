package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sql.Geo

/** Optimization-round probe (guide §1): phase timing for q132's DBSCAN
  * composition — sample build, pair join, core set, label-propagation
  * rounds — so the fixed-cost profile of many tiny jobs is visible. */
object DbscanProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("dbscan-probe")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Geo.register(spark)
    spark.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("lineitem")

    val sample = spark.sql(
      """WITH ids AS (
        |  SELECT DISTINCT l_orderkey * 10 + l_linenumber AS id FROM lineitem),
        |samp AS (
        |  SELECT id FROM ids ORDER BY md5(CAST(id AS STRING)), id LIMIT 400)
        |SELECT id,
        |  CAST((r * 7919) % 60000 AS DOUBLE) / 1000.0 AS lon,
        |  CAST((r * 104729) % 30000 AS DOUBLE) / 1000.0 AS lat
        |FROM (SELECT id, row_number() OVER
        |    (ORDER BY md5(CAST(id AS STRING)), id) AS r FROM samp)""".stripMargin)

    (0 until 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      t("sample.count")(sample.count())
      val p = sample.select(col("id"), col("lon"), col("lat"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("p.count")(p.count())
      val eps = 2.0
      val cells = p.withColumn("__cell", call_function("st_gridcell",
        col("lon"), col("lat"), lit(eps)))
      val probe = cells
        .withColumn("__ccell", explode(call_function("st_gridring",
          col("__cell"), lit(1))))
        .select(col("id").as("ida"), col("lon").as("alon"),
          col("lat").as("alat"), col("__ccell"))
      val pairs = probe.join(
          cells.select(col("id").as("idb"), col("lon").as("blon"),
            col("lat").as("blat"), col("__cell")),
          col("__ccell") === col("__cell") && col("ida") =!= col("idb"))
        .filter((col("alon") - col("blon")) * (col("alon") - col("blon")) +
          (col("alat") - col("blat")) * (col("alat") - col("blat"))
          <= lit(eps * eps))
        .select(col("ida"), col("idb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("pairs.count")(pairs.count())
      val cores = pairs.groupBy(col("ida").as("id"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") + 1 >= 5)
        .select("id")
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("cores.count")(cores.count())
      val coreEdges = pairs
        .join(cores.withColumnRenamed("id", "ida"), Seq("ida"))
        .join(cores.withColumnRenamed("id", "idb"), Seq("idb"))
        .filter(col("ida") < col("idb"))
        .select("ida", "idb")
      // inline dupClusters with per-round timing
      val edges = coreEdges.select(col("ida").as("src"), col("idb").as("dst"))
        .union(coreEdges.select(col("idb").as("src"), col("ida").as("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("edges.count")(edges.count())
      var labels = t("labels.init")(edges.select(col("src").as("id")).distinct()
        .withColumn("cluster", col("id"))
        .localCheckpoint(eager = true))
      val clusterType = labels.schema("cluster").dataType
      var it = 0
      var converged = false
      while (!converged && it < 50) {
        t(s"round $it") {
          val msgs = edges.join(labels, edges("src") === labels("id"))
            .select(col("dst").as("id"), col("cluster"))
          val jump = labels.as("x").join(labels.as("y"),
              col("x.cluster") === col("y.id"))
            .select(col("x.id").as("id"), col("y.cluster").as("cluster"))
          val next = labels.withColumn("__old", col("cluster"))
            .unionByName(msgs.withColumn("__old", lit(null).cast(clusterType)))
            .unionByName(jump.withColumn("__old", lit(null).cast(clusterType)))
            .groupBy(col("id")).agg(min(col("cluster")).as("cluster"),
              min(col("__old")).as("__old"))
            .localCheckpoint(eager = true)
          converged = t(s"round $it converge-probe")(
            next.filter(col("cluster") =!= col("__old")).isEmpty)
          labels = next.drop("__old")
        }
        it += 1
      }
      println(s"[probe] rounds: $it")
      Seq(p, pairs, cores, edges).foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
