package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demonstrates the AQE leg of the skew story (SURVEY.md §2C "skew
  * handling"): a hot-cell shuffle join re-planned at runtime with skewed
  * partitions split (`skew=true` in the final adaptive plan). Thresholds
  * are lowered so the effect is visible at test scale; production keeps
  * the defaults and additionally pre-splits keys with
  * `AdaptiveCells.splitHotCells` / salting. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  test("AQE splits the hot-cell partition in a skewed shuffle join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one scorching cell (90% of rows) + a long tail
      val left = spark.range(200000)
        .select(when($"id" % 10 < 9, 1L).otherwise($"id" % 1000).as("cell"),
          concat(lit("payload-payload-payload-"), $"id").as("v"))
      val right = spark.range(1000)
        .select(($"id" % 1000).as("cell"), lit("dim").as("w"))
      val joined = left.join(right, "cell")
      // run THIS QueryExecution (count() would plan a separate one and the
      // adaptive plan under inspection would never finalize)
      assert(joined.queryExecution.toRdd.count() > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew split in final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
