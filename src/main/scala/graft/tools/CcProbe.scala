package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Ann
import graft.sql.Geo

/** Optimization-round probe (guide §1): compare dupClusters variants on
  * the real q55/q151 graph shapes — rounds, per-round wall time. */
object CcProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  /** Variant runner: `jump` = pointer-jump depth (0/1/2); identical
    * fixpoint. */
  def cc(pairs: DataFrame, jump: Int, maxIter: Int = 50): (DataFrame, Int) = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(eager = true)
    val clusterType = labels.schema("cluster").dataType
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val msgs = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster"))
      val base = labels.withColumn("__old", col("cluster"))
        .unionByName(msgs.withColumn("__old", lit(null).cast(clusterType)))
      val withJump =
        if (jump == 0 || it == 0) base
        else {
          val j1 = labels.as("x").join(labels.as("y"),
              col("x.cluster") === col("y.id"))
            .select(col("x.id").as("id"), col("y.cluster").as("cluster"))
          val j = if (jump == 1) j1
            else j1.as("x").join(labels.as("z"),
                col("x.cluster") === col("z.id"))
              .select(col("x.id").as("id"), col("z.cluster").as("cluster"))
          base.unionByName(j.withColumn("__old", lit(null).cast(clusterType)))
        }
      val next = withJump
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"),
          min(col("__old")).as("__old"))
        .localCheckpoint(eager = true)
      converged = next.filter(col("cluster") =!= col("__old")).isEmpty
      labels = next.drop("__old")
      it += 1
    }
    edges.unpersist(blocking = false)
    require(converged)
    (labels, it)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("cc-probe")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Geo.register(spark)
    Seq("documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }

    val q55edges = spark.sql(
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 5 != 4
        |UNION ALL
        |SELECT a.doc_id, b.doc_id
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id - 7
        |WHERE a.doc_id % 97 = 0""".stripMargin)
      .localCheckpoint(eager = true)

    val sample = spark.sql(
      """SELECT vec_id, embedding FROM (
        |  SELECT vec_id, embedding, row_number() OVER
        |    (ORDER BY md5(CAST(vec_id AS STRING)), vec_id) AS r
        |  FROM embeddings) WHERE r <= 240""".stripMargin)
    val queries = sample.select(col("vec_id").as("__qid"),
      col("embedding").as("__qvec"))
    val knn = Ann.bruteForceTopK(sample, queries, "embedding", "vec_id",
        "__qid", "__qvec", 4)
      .select(col("__qid").as("a"), col("vec_id").as("b"))
      .localCheckpoint(eager = true)
    val mutual = knn.as("x").join(knn.as("y"),
        col("x.a") === col("y.b") && col("x.b") === col("y.a") &&
          col("x.a") < col("x.b"))
      .select(col("x.a").as("id_a"), col("x.b").as("id_b"))
      .localCheckpoint(eager = true)

    (0 until 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      for ((name, g) <- Seq("q55" -> q55edges, "q151" -> mutual);
           j <- Seq(2, 1, 0)) {
        val ((res, rounds), _) = (t(s"$name jump=$j") { cc(g, j) }, ())
        println(s"[probe] $name jump=$j rounds=$rounds n=${res.count()}")
      }
    }
    spark.stop()
  }
}
