package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (gap-based): a session breaks when the time since
  * the previous event of the same key exceeds `gapSeconds`. All built-ins —
  * one `lag` + one running `sum` over the same (key, time) window, so the
  * plan pays exactly one shuffle+sort on the key and both Window operators
  * share it (100-TB shape: the shuffle is inherent to the semantics; the
  * session ordinal never leaves the partition). Gap arithmetic is integer
  * microseconds (`unix_micros`), so session boundaries are exact and the
  * DuckDB oracle replicates them (q64). */
object Sessions {

  /** Funnel analysis: how deep each user gets through an ORDERED step
    * sequence, earliest-completion semantics — t_1 = min ts of a step-1
    * event, t_i = min ts of a step-i event with ts STRICTLY after
    * t_{i-1} (the standard product-analytics funnel; strict `>` pins
    * simultaneous events to at most one advance, so the result is
    * deterministic under ts ties). One shuffle: events group by user and
    * a higher-order `aggregate` folds the (ts, step)-sorted event array —
    * greedy earliest-advance over the sorted array IS the sequential-min
    * recurrence, which is what the q153 oracle replays as chained
    * filtered-min joins. Events-per-user must fit in memory (the
    * sessionize contract). Returns (userCol, steps_completed,
    * completed_ts of the deepest step — null at depth 0). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             stepCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepsArr = array(steps.map(lit): _*)
    events
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(col(tsCol).as("ts"),
        col(stepCol).as("step")))).as("__evs"))
      .withColumn("__fold", aggregate(
        col("__evs"),
        struct(lit(0).as("idx"),
          lit(null).cast(events.schema(tsCol).dataType).as("last")),
        (st, ev) => {
          val advance = st("idx") < steps.size &&
            ev("step") === element_at(stepsArr, st("idx") + 1) &&
            (st("idx") === 0 || ev("ts") > st("last"))
          struct(
            when(advance, st("idx") + 1).otherwise(st("idx")).as("idx"),
            when(advance, ev("ts")).otherwise(st("last")).as("last"))
        }))
      .select(col(userCol),
        col("__fold.idx").as("steps_completed"),
        col("__fold.last").as("completed_ts"))
  }

  /** Adds `session_id`: the per-key session ordinal (1-based, time order).
    * `tieCol` breaks timestamp ties deterministically. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NTZ-safe: gap arithmetic needs integer micros; the UTC session makes
    // the NTZ->TZ cast wall-clock-identical
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val gap = us - lag(us, 1).over(w)
    val isNew = when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_id", sum(isNew).over(run))
  }

  /** Per-session rollup: event count, time bounds, first event id. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"),
        min(col(tieCol)).as("first_event"))
}
