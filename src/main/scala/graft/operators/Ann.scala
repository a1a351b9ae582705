package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sql.Geo

/** Approximate-nearest-neighbor over embedding columns.
  *
  * - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline. The
  *   query side broadcasts; the corpus streams through one codegen'd
  *   projection + window, no corpus shuffle beyond the per-query top-k.
  * - [[lshTopK]]: random-hyperplane LSH bucketing — the 100-TB scale path:
  *   corpus hashed once, probed per bucket, exact rerank inside buckets.
  */
object Ann {

  /** Exact top-k by cosine for each query row. Output: qid, rank, id, cos. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    Geo.register(corpus.sparkSession)
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("cos", call_function("vec_cosine", col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("cos").desc, col(idCol))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cos"))
  }

  /** LSH-bucketed approximate top-k: candidates share the query's bucket
    * (optionally 1-bit multiprobe), exact cosine rerank within bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, qidCol: String, qvecCol: String, k: Int,
              bits: Int = 10, seed: Long = 42L,
              multiprobe: Boolean = true): DataFrame = {
    Geo.register(corpus.sparkSession)
    val c = corpus.withColumn("__bucket",
      call_function("vec_lshbucket", col(vecCol), lit(bits), lit(seed)))
    val qBase = queries.withColumn("__qbucket",
      call_function("vec_lshbucket", col(qvecCol), lit(bits), lit(seed)))
    val q =
      if (!multiprobe) qBase.withColumn("__probe", col("__qbucket"))
      else qBase.withColumn("__probe", explode(array(
        col("__qbucket") +: (0 until bits).map(b =>
          col("__qbucket").bitwiseXOR(lit(1L << b))): _*)))
    val joined = c.join(broadcast(q), col("__bucket") === col("__probe"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("cos", call_function("vec_cosine", col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("cos").desc, col(idCol))
    joined
      .select(col(qidCol), col(idCol), col("cos")).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("cos"))
  }
}
