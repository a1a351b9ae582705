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
}
