package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 vs an independent in-memory reference, determinism, plan shape. */
class TextRankSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  /** Literal-definition BM25 over a token-list corpus, scalar arithmetic
    * written with the same IEEE expression tree the operator documents. */
  private def referenceBm25(docs: Seq[(Long, String)], k1: Double, b: Double,
                            logIdf: Boolean): Map[(Long, String), Double] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val n = docs.size.toLong
    val tf = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (w, g) => (id, w) -> g.size.toLong } }
      .toMap
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val dfreq = tf.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val avgdl = dl.values.sum.toDouble / n.toDouble
    tf.map { case ((id, w), f) =>
      val idf =
        // StrictMath: Spark's Log expression evaluates via StrictMath.log,
        // which can differ from Math.log intrinsics by 1 ulp
        if (logIdf) StrictMath.log(1.0 +
          (n.toDouble - dfreq(w).toDouble + 0.5) / (dfreq(w).toDouble + 0.5))
        else (n + 1L).toDouble / (dfreq(w) + 1L).toDouble
      val score = idf * (f.toDouble * (k1 + 1.0)) /
        (f.toDouble + k1 * ((1.0 - b) + b * (dl(id).toDouble / avgdl)))
      (id, w) -> score
    }
  }

  private val corpus = Seq(
    1L -> "spark scan table scan scan filter",
    2L -> "spark join join shuffle filter",
    3L -> "table vector vector vector spark",
    4L -> "filter spark table join scan broadcast",
    5L -> "unique singular spark")

  private def run(k: Int, logIdf: Boolean, parts: Int = 4) =
    TextRank.bm25TopTerms(
        spark.createDataset(corpus).toDF("doc_id", "text").repartition(parts),
        "text", "doc_id", k, logIdf = logIdf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))

  test("log-idf scores match the literal reference bit-for-bit") {
    for (logIdf <- Seq(true, false)) {
      val want = referenceBm25(corpus, 1.2, 0.75, logIdf)
      val got = run(k = 100, logIdf = logIdf)
      assert(got.nonEmpty)
      got.foreach { case (id, _, term, _, score) =>
        assert(score === want((id, term)), s"doc=$id term=$term logIdf=$logIdf")
      }
      // ranks are (score desc, term asc) dense per doc starting at 1
      got.groupBy(_._1).foreach { case (id, rows) =>
        val sorted = rows.sortBy(_._2)
        assert(sorted.map(_._2).toSeq === (1L to rows.length).toSeq, s"doc=$id")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._5 > b._5 || (a._5 == b._5 && a._3 < b._3))
          case _ =>
        }
      }
    }
  }

  test("corpus-wide terms score below document-specific terms") {
    // 'spark' is in every doc; 'unique' only in doc 5 with the same tf=1 —
    // within doc 5 the rarer term must outrank the ubiquitous one
    val got = run(k = 100, logIdf = true).filter(_._1 == 5L)
    val byTerm = got.map(r => r._3 -> r._2).toMap
    assert(byTerm("unique") < byTerm("spark"))
  }

  test("partition-count invariance: 1 vs 13 partitions bit-identical") {
    assert(run(3, logIdf = true, parts = 1).sortBy(r => (r._1, r._2)).toSeq ===
      run(3, logIdf = true, parts = 13).sortBy(r => (r._1, r._2)).toSeq)
  }

  test("top-k window prunes map-side (WindowGroupLimit) and stats broadcast") {
    val df = TextRank.bm25TopTerms(
      spark.createDataset(corpus).toDF("doc_id", "text"),
      "text", "doc_id", k = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side top-k pruning:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"expected the one-row stats to broadcast:\n$plan")
  }

  test("empty documents count toward N and the dl average") {
    val withEmpty = corpus :+ (6L -> "")
    val want = {
      // reference over the 5 token-bearing docs but with n = 6 and avgdl
      // divided by 6 (empty doc contributes dl = 0)
      val toks = withEmpty.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }
      val n = 6L
      val dlSum = toks.map(_._2.size.toLong).sum
      val avgdl = dlSum.toDouble / n.toDouble
      avgdl
    }
    val got = TextRank.bm25TopTerms(
        spark.createDataset(withEmpty).toDF("doc_id", "text"),
        "text", "doc_id", k = 1)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(!got.contains(6L), "empty doc emits no terms")
    // spot-check one score against a 6-doc reference
    val ref = referenceBm25(withEmpty, 1.2, 0.75, logIdf = true)
      .map { case ((id, w), s) => (id, w) -> s }
    val row = TextRank.bm25TopTerms(
        spark.createDataset(withEmpty).toDF("doc_id", "text"),
        "text", "doc_id", k = 100)
      .filter(col("doc_id") === 1L && col("term") === "scan")
      .select("score").as[Double].head()
    assert(row === ref((1L, "scan")))
    assert(want > 0) // avgdl sanity
  }
}
