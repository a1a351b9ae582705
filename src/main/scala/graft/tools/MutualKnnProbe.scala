package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup}
import graft.sql.Geo

/** Optimization-round probe (guide §1): phase timing for q151's
  * mutual-kNN clustering — sample window, brute-force kNN graph, mutual
  * filter, CC rounds. */
object MutualKnnProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("mutualknn-probe")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Geo.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("embeddings")

    (0 until 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      val sample = spark.sql(
        """SELECT vec_id, embedding FROM (
          |  SELECT vec_id, embedding, row_number() OVER
          |    (ORDER BY md5(CAST(vec_id AS STRING)), vec_id) AS r
          |  FROM embeddings) WHERE r <= 240""".stripMargin)
      t("sample.count")(sample.count())
      val queries = sample.select(col("vec_id").as("__qid"),
        col("embedding").as("__qvec"))
      val knn = Ann.bruteForceTopK(sample, queries, "embedding", "vec_id",
          "__qid", "__qvec", 4)
        .select(col("__qid").as("a"), col("vec_id").as("b"))
        .localCheckpoint(eager = false)
      t("knn graph")(knn.count())
      val mutual = knn.as("x").join(knn.as("y"),
          col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
            col("x.a") < col("x.b"))
        .select(col("x.a").as("id_a"), col("x.b").as("id_b"))
      t("mutual")(mutual.count())
      val clusters = t("dupClusters total")(
        Dedup.dupClusters(mutual, maxIter = 50))
      t("final join")(sample.select(col("vec_id").as("id"))
        .join(clusters, Seq("id"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("id")))
        .count())
    }
    spark.stop()
  }
}
