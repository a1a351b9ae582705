package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trajectory analytics over ping streams `(entity, ts, tie, lon, lat)` —
  * the GPS-trace workload a 100-TB movement corpus runs before any model
  * training: per-ping kinematics (speed/jitter filtering), per-entity track
  * assembly into LINESTRING geometries, and cell-indexed origin-destination
  * flow matrices.
  *
  * Determinism contract shared by all three operators: pings totally order
  * by `(ts, tie, lon, lat)` — `tie` is the caller's tiebreak column, and
  * the coordinates close the order even when `tie` is not unique (dirty
  * lakes have duplicate keys; two pings that still compare equal are
  * byte-identical, so their order cannot matter). Every output is a pure
  * function of the group VALUE, invariant to partitioning and retries. All
  * arithmetic is order-fixed (left-to-right folds, single divisions), so
  * the DuckDB oracles (q135–q137) replicate every double bit-for-bit.
  *
  * 100-TB shape: [[withKinematics]] pays exactly one shuffle+sort on the
  * entity key (all lag windows share it); [[buildTracks]] is one partial-
  * aggregated groupBy whose per-group state is the entity's own ping list
  * (bounded by the longest single track, the operator's inherent working
  * set — same bound PostGIS's `ST_MakeLine ORDER BY` carries); [[odMatrix]]
  * reduces each entity to two structs via partial-friendly min/max before
  * the tiny flow-cell aggregation, so the ping table is never re-shuffled.
  */
object Trajectory {

  private def us(tsCol: String): Column =
    unix_micros(col(tsCol).cast("timestamp"))

  /** Per-ping kinematics: planar step distance from the previous ping of
    * the same entity (time order), elapsed seconds, and speed. The first
    * ping of an entity and zero-elapsed steps (duplicate timestamps) get
    * NULL speed — a 0/0 would otherwise smuggle NaN into downstream
    * filters. `speed > vmax` is the standard GPS-jitter flag; filtering is
    * left to the caller so the flag stays auditable. */
  def withKinematics(df: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, lonCol: String, latCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol), col(lonCol), col(latCol))
    val dx = col(lonCol) - lag(col(lonCol), 1).over(w)
    val dy = col(latCol) - lag(col(latCol), 1).over(w)
    val dtUs = us(tsCol) - lag(us(tsCol), 1).over(w)
    df.withColumn("step_dist", sqrt(dx * dx + dy * dy))
      .withColumn("step_s", dtUs.cast("double") / lit(1000000.0))
      .withColumn("speed",
        when(dtUs > 0L, col("step_dist") / col("step_s")))
  }

  /** One LINESTRING track per entity, vertices in `(ts, tie)` order, with
    * exact stats: ping count, time bounds, and planar length (`st_length`
    * over the assembled line — the same left-to-right `sqrt(dx·dx+dy·dy)`
    * fold the oracle replays). Single-ping entities yield a 1-vertex
    * LINESTRING of length 0 rather than being dropped. */
  def buildTracks(df: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, lonCol: String, latCol: String): DataFrame = {
    // sort key = the full ping struct (ts, tie, x, y)
    val ping = struct(col(tsCol).cast("timestamp").as("ts"),
      col(tieCol).as("tie"), col(lonCol).cast("double").as("x"),
      col(latCol).cast("double").as("y"))
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(ping)).as("pings"),
        count(lit(1)).as("n_pings"),
        min(col(tsCol)).as("t0"), max(col(tsCol)).as("t1"))
      .withColumn("track", call_function("st_linefromxy",
        flatten(transform(col("pings"), p => array(p("x"), p("y"))))))
      .drop("pings")
      .withColumn("track_len", call_function("st_length", col("track")))
  }

  /** Origin→destination flow matrix at Web-Mercator zoom `z`: each entity
    * contributes one flow from its first ping's tile to its last ping's
    * tile; flows aggregate to `(o_tx, o_ty, d_tx, d_ty, n_entities,
    * n_pings)`. First/last resolve as lexicographic min/max of
    * `(ts, tie, lon, lat)` structs — partial-aggregation-friendly (no
    * window, no second shuffle over the pings). */
  def odMatrix(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               lonCol: String, latCol: String, z: Int): DataFrame = {
    val ping = struct(col(tsCol).cast("timestamp").as("ts"),
      col(tieCol).as("tie"), col(lonCol).cast("double").as("x"),
      col(latCol).cast("double").as("y"))
    def tile(p: Column, axis: String): Column =
      call_function(s"st_tile$axis",
        call_function("st_tilezxy", p("x"), p("y"), lit(z)))
    val ends = df.groupBy(col(keyCol))
      .agg(min(ping).as("o"), max(ping).as("d"), count(lit(1)).as("np"))
    ends.groupBy(
        tile(col("o"), "x").as("o_tx"), tile(col("o"), "y").as("o_ty"),
        tile(col("d"), "x").as("d_tx"), tile(col("d"), "y").as("d_ty"))
      .agg(count(lit(1)).as("n_entities"), sum(col("np")).as("n_pings"))
  }
}
