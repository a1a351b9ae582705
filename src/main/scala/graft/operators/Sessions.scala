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
