package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sql.Geo

/** Deterministic, reproducible corpus sampling — the training-data
  * requirement `df.sample()` cannot meet: membership must be a pure
  * function of the row id (stable across runs, partitionings, engines,
  * and cluster sizes), so a pipeline re-run or a resume sees the same
  * subset, and an independent engine can audit it (q46's DuckDB oracle
  * replicates splitmix64 bit-for-bit via 128-bit wraparound arithmetic). */
object Sampling {

  private def bucket(idCol: Column, seed: Long, denominator: Long): Column =
    pmod(call_function("splitmix64",
      idCol.cast("long").bitwiseXOR(lit(seed))), lit(denominator))

  /** Keep rows with pmod(splitmix64(id ^ seed), denominator) < numerator —
    * an exact numerator/denominator fraction in expectation, map-side only. */
  def deterministicSample(df: DataFrame, idCol: String, numerator: Int,
                          denominator: Int, seed: Long): DataFrame = {
    require(numerator >= 0 && denominator > 0 && numerator <= denominator)
    Geo.register(df.sparkSession)
    df.filter(bucket(col(idCol), seed, denominator.toLong) < numerator)
  }

  /** Stratified (per-key) deterministic sample: the k rows per key whose
    * md5(id) sorts lowest — a uniform, reproducible, engine-auditable
    * choice (md5 is identical everywhere, so the q63 DuckDB oracle
    * reproduces the exact subset). One shuffle on the key; the per-key
    * top-k window prunes map-side (`WindowGroupLimit`) so only ~k rows per
    * key per partition reach the exchange — balanced class subsets
    * (per-language, per-source) at 100 TB without a full sort. */
  def perKeySample(df: DataFrame, keyCol: String, idCol: String,
                   k: Int): DataFrame = {
    require(k > 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Adds a `split` label (train/val/test style) by hash bucket: weights
    * are integer parts of `denominator = weights.sum`; a row's label is
    * the bucket its hash falls in. Disjoint, exhaustive, reproducible. */
  def withSplit(df: DataFrame, idCol: String, seed: Long,
                weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    Geo.register(df.sparkSession)
    val denom = weights.map(_._2).sum.toLong
    val b = bucket(col(idCol), seed, denom)
    val cumulative = weights.scanLeft(0)(_ + _._2).tail
    val labeled = weights.map(_._1).zip(cumulative)
    val expr = labeled.init.foldRight(lit(labeled.last._1): Column) {
      case ((label, upto), rest) => when(b < upto, label).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Source balancing (training-data MIXTURE reweighting): down-samples
    * each source so the surviving mix matches `targetShares` (e.g. web
    * 0.6 / books 0.2 / code 0.2) as closely as down-sampling-only allows.
    *
    * Per-source keep-rates derive from actual counts (one bounded
    * aggregation: rows per source — O(#sources) driver state): the
    * bottleneck source is the one whose target-to-actual ratio is
    * largest; it keeps everything and every other source keeps
    * `actual_bottleneck * (share_s / share_bottleneck)` rows. Rates
    * quantize to parts-per-`denominator` and membership is the same
    * splitmix64 bucket test as [[deterministicSample]] — a pure function
    * of (id, seed), so the subset is stable across runs/partitionings and
    * engine-auditable (q85 oracle recomputes rates AND membership).
    *
    * @param targetShares source -> desired fraction (need not sum to 1 —
    *        normalized internally); sources absent from the map are DROPPED
    * @return rows surviving the balance, unchanged schema */
  def balanceSources(df: DataFrame, srcCol: String, idCol: String,
                     targetShares: Map[String, Double], seed: Long,
                     denominator: Int = 1000000): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0))
    Geo.register(df.sparkSession)
    // every fold below runs in sorted-key order: Map iteration order must
    // never influence a double sum or a tie-break (determinism contract)
    val sortedShares = targetShares.toSeq.sortBy(_._1)
    val shareSum = sortedShares.map(_._2).sum
    val shares = sortedShares.map { case (k, v) => k -> v / shareSum }
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = shares.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "no target source present in the data")
    // bottleneck source: smallest actual/share — it keeps everything
    val bottleneck = present.minBy { case (s, share) => (counts(s) / share, s) }
    val budgetPerShare = counts(bottleneck._1) / bottleneck._2
    val numerators: Seq[(String, Int)] = present.map { case (s, share) =>
      val keep = math.min(1.0, share * budgetPerShare / counts(s))
      s -> math.round(keep * denominator).toInt
    }
    val numeratorExpr = numerators.foldLeft(lit(0): Column) {
      case (acc, (s, num)) => when(col(srcCol) === s, num).otherwise(acc)
    }
    df.filter(bucket(col(idCol), seed, denominator.toLong) < numeratorExpr)
  }
}
