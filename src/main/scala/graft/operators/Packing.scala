package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sql.Geo

/** Training-sequence packing: assign each document to a fixed-budget
  * training sequence (the standard pre-tokenization packing pass).
  *
  * Documents are sharded (`idCol % shards`) and packed in deterministic id
  * order within each shard: a document goes to pack floor(tokens-before /
  * budget). Fixed-boundary packing — deterministic, one window pass, no
  * driver state. The shard dimension is what makes it scale: the running
  * sum is per-shard, so no single reducer ever sees the whole corpus
  * (shards ≈ executor count keeps windows parallel and pack sizes exact
  * within each shard). */
object Packing {

  /** Adds `tokens` (whitespace token count of `textCol`), `pack_id`
    * (globally unique: shard * 2^40 + bin), and `pack_offset` (token
    * offset of this document inside its pack). */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
                    budget: Long, shards: Int = 64): DataFrame = {
    require(budget > 0 && shards > 0)
    Geo.register(df.sparkSession)
    val w = Window.partitionBy(col("__shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df
      .withColumn("tokens", call_function("token_count", col(textCol)).cast("long"))
      .withColumn("__shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("__before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("pack_id",
        col("__shard") * lit(1L << 40) + floor(col("__before") / lit(budget)).cast("long"))
      .withColumn("pack_offset", pmod(col("__before"), lit(budget)))
      .drop("__shard", "__before")
  }
}
