package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary building (tokenizer-training primitive): token and
  * document frequencies with a deterministic top-k cut. All built-ins —
  * explode + two-level aggregation — so the 100-TB shape is the one Spark
  * already optimizes: partial (map-side) counts collapse each partition's
  * token stream to its distinct tokens before the single shuffle on the
  * token key, and the final top-k window prunes map-side
  * (`WindowGroupLimit`). Tie-break is (count desc, token asc) — total
  * order, so the cut is reproducible and oracle-checkable (q65). */
object Vocab {

  /** Top-`k` whitespace tokens with term count and document frequency. */
  def topTokens(df: DataFrame, textCol: String, idCol: String,
                k: Int): DataFrame = {
    val tokens = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val counts = tokens.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"),
        count_distinct(col(idCol)).as("df"))
    val w = Window.orderBy(col("tf").desc, col("token"))
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
