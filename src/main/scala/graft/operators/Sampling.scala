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

  /** Weighted deterministic Bernoulli sample: keep each row with
    * probability `weightCol` — the quality-score-weighted corpus
    * selection pass (keep better documents with higher probability,
    * deterministically). The keep test is `u < w` with
    * `u = (splitmix64(id ^ seed) >>> 11) / 2^53`, an exactly-representable
    * dyadic in [0, 1) — membership is a pure function of (id, seed), so
    * re-runs, repartitionings, retries and an auditing engine all see the
    * IDENTICAL subset (q148's DuckDB oracle recomputes it bit-for-bit).
    * NULL and NaN weights drop the row (explicitly — Spark orders NaN
    * greater than every value, so `u < NaN` alone would KEEP it);
    * `w <= 0` never keeps, `w >= 1` always keeps. Map-side only: no
    * shuffle, no state. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     seed: Long): DataFrame = {
    Geo.register(df.sparkSession)
    val u = shiftrightunsigned(call_function("splitmix64",
        col(idCol).cast("long").bitwiseXOR(lit(seed))), 11)
      .cast("double") / lit(9007199254740992.0)
    val w = col(weightCol).cast("double")
    df.filter(!isnan(w) && u < w)
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

  /** Deterministic approximate quantiles from a hash-minimum sample: the
    * `k` rows with the smallest (md5(id), id) form the sample — a fixed
    * pseudo-random subset, NOT data-dependent on the value column, so the
    * estimate is unbiased and (unlike reservoir/TDigest sampling)
    * invariant to partitioning, task order and retries. Each requested
    * quantile linearly interpolates the sorted sample with a PINNED
    * arithmetic order (`rank = q·(n-1)`; `lo + (hi-lo)·frac`), so an
    * oracle replicates every estimate bit-for-bit.
    *
    * 100-TB shape: the sample rides `TakeOrderedAndProject` (per-partition
    * partial top-k, no full shuffle); driver state is the k sample values
    * — model, not data. Error is the standard order-statistic bound
    * (~1/sqrt(k) quantile deviation).
    *
    * Returns (q, est) rows. */
  def approxQuantiles(df: DataFrame, valueCol: String, idCol: String,
                      qs: Seq[Double], k: Int = 1024): DataFrame = {
    require(k > 1 && qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))
    val spark = df.sparkSession
    val sample = df
      .select(col(valueCol).cast("double").as("__v"), col(idCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(k)
      .select("__v").collect().map(_.getDouble(0))
    java.util.Arrays.sort(sample)
    val n = sample.length
    require(n > 0, "approxQuantiles needs at least one row")
    val ests = qs.map { q =>
      val rank = q * (n - 1).toDouble
      val lo = math.floor(rank).toInt
      val hi = math.min(lo + 1, n - 1)
      val frac = rank - lo.toDouble
      (q, sample(lo) + (sample(hi) - sample(lo)) * frac)
    }
    import spark.implicits._
    ests.toDF("q", "est")
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
