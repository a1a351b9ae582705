package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term weighting (BM25 / TF-IDF): the standard retrieval /
  * data-curation signal — rank each document's terms by how specific they
  * are to it relative to the corpus.
  *
  * 100-TB shape: two inherent shuffles, both fed by partial aggregation —
  * (doc, term) counts collapse map-side before the term-keyed exchange
  * that attaches document frequencies, and the final per-doc top-k window
  * prunes map-side (`WindowGroupLimit`, asserted in `TextRankSpec`). The
  * corpus-level scalars (N, total token count) are ONE row cross-joined
  * in (broadcast), never a skew key. Nothing here collects to the driver.
  *
  * Determinism: every score is a fixed IEEE expression tree over exact
  * integer counts (tf, df, dl, N are longs; constants appear as decimal
  * literals, never computed), so results are partition/retry-invariant
  * bit-for-bit. With `logIdf = false` the idf factor is the exact
  * rational (N+1)/(df+1) instead of the BM25 logarithm
  * ln(1 + (N-df+0.5)/(df+0.5)): Spark's `log` evaluates via
  * `StrictMath.log` while DuckDB's `ln` is libm — last-ulp divergence —
  * so the rational form is what q133's DuckDB oracle replicates
  * bit-exactly; the log form is the default for users and is
  * spec-tested against an independent in-memory reference. The idf factor
  * is monotone decreasing in df under both forms, so term rankings agree
  * whenever per-term (tf, dl) are equal; the two variants are otherwise
  * honestly different scores. */
object TextRank {

  /** Top-`k` BM25-scored terms per document.
    *
    * @param docs    corpus; one row per document
    * @param textCol whitespace-tokenized text column
    * @param idCol   unique document id
    * @param k       terms kept per document
    * @param logIdf  true → BM25 idf ln(1+(N-df+0.5)/(df+0.5)); false →
    *                exact rational (N+1)/(df+1) (cross-engine bit-exact)
    * @return (doc_id, rank, term, tf, score), rank 1..k by
    *         (score desc, term asc) */
  def bm25TopTerms(docs: DataFrame, textCol: String, idCol: String, k: Int,
                   k1: Double = 1.2, b: Double = 0.75,
                   logIdf: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // one-row corpus stats; docs with zero tokens still count toward N
    // and contribute dl = 0 to the average
    val stats = docs.select(col(idCol).as("doc_id"))
      .join(dl, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dl"), lit(0L))).as("total_dl"))

    val tfD = col("tf").cast("double")
    val idf =
      if (logIdf)
        log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double")
          + lit(0.5)) / (col("df").cast("double") + lit(0.5)))
      else (col("n_docs") + lit(1L)).cast("double") /
        (col("df") + lit(1L)).cast("double")
    val avgdl = col("total_dl").cast("double") / col("n_docs").cast("double")
    val score = idf * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))

    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dl, "doc_id")
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("score"))
  }
}
