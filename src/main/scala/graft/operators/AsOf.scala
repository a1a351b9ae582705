package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark lacks natively: each
  * left row picks up the latest right row with `right.ts <= left.ts` on
  * the same key (the quote-for-trade / last-config-before-event lookup).
  *
  * Built as the union-window composition, NOT a range join: both sides
  * union into one relation tagged by side, a running `last(_, ignoreNulls)`
  * window ordered by (ts, side) carries the most recent right payload
  * forward, and left rows are filtered back out. The plan pays exactly ONE
  * shuffle+sort on the key — no per-row range probe, no candidate
  * explosion, no skew amplification (a key's cost is linear in its own row
  * count) — which is the 100-TB shape; a range equi-join would
  * re-materialize every (left, candidate) pair. Right rows sort before
  * left rows at equal timestamps, so the match is inclusive
  * (`right.ts == left.ts` matches), the same convention DuckDB's native
  * ASOF JOIN applies — which is what oracles q66. */
object AsOf {

  /** Left columns + the latest-prior right payload columns (null when no
    * right row precedes). Right must share `keyCol`/`tsCol`; its other
    * columns are the carried payload and must not collide with left's.
    * Rows of `right` with duplicate (key, ts) are reduced to the max
    * `tieCol` row first so the pick is total-order deterministic. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String): DataFrame = {
    val payload = right.columns.filter(c => c != keyCol && c != tsCol).toSeq
    require(payload.nonEmpty, "right side needs at least one payload column")
    require(payload.forall(!left.columns.contains(_)),
      s"right payload columns ${payload.mkString(",")} collide with left")
    // deterministic pick among equal (key, ts) right rows
    val dw = Window.partitionBy(col(keyCol), col(tsCol))
      .orderBy(col(tieCol).desc)
    val r1 = right.withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === 1).drop("__rn")
    // the carried value is ONE struct of the whole right payload — never
    // per-column: last(_, ignoreNulls) per column would skip a newer right
    // row's null field and mix fields from different right rows; the
    // struct is non-null exactly when a right row exists, so null payload
    // FIELDS inside the latest matching row are preserved as-is
    val payloadStruct = struct(payload.map(col): _*)
    val payloadType = StructType(payload.map(c => r1.schema(c)))
    val leftTagged = left.withColumn("__side", lit(1))
      .select((left.columns.map(col) :+ col("__side")) :+
        lit(null).cast(payloadType).as("__payload"): _*)
    val rightTagged = r1.withColumn("__side", lit(0))
      .select((left.columns.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side")) :+
        payloadStruct.as("__payload"): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = leftTagged.unionByName(rightTagged)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
