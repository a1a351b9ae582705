package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

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

  /** Two-pass TIME-CHUNKED as-of join — same output as [[asofJoin]], but a
    * monster key no longer serializes into one window task.
    *
    * [[asofJoin]]'s one window partitions by key: linear per key, but a
    * single key holding 30% of the rows becomes one straggler task that
    * AQE cannot split (it is a window, not a join). Here time is cut into
    * fixed-width chunks and the carry is staged:
    *
    *  1. per (key, chunk): the chunk's LAST right payload — a window over
    *     (key, chunk), bounded by the chunk's own row count;
    *  2. per key over the (key, chunk) DISTINCT-chunk list (metadata-
    *     scale: occupied chunks, not rows): a running carry gives each
    *     chunk the latest right payload from all EARLIER chunks;
    *  3. the [[asofJoin]] union-window, now partitioned by (key, chunk),
    *     with one synthetic carry-in row (null ts, sorts first) seeding
    *     each chunk.
    *
    * Every stage's largest partition is one key's rows in ONE chunk —
    * `chunkWidth` (in the ts column's native unit; timestamps count
    * seconds) is the straggler knob. Monotone chunking keeps inclusive
    * `right.ts <= left.ts` semantics bit-identical to [[asofJoin]]. */
  def asofJoinChunked(left: DataFrame, right: DataFrame, keyCol: String,
                      tsCol: String, tieCol: String,
                      chunkWidth: Double): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    val payload = right.columns.filter(c => c != keyCol && c != tsCol).toSeq
    require(payload.nonEmpty, "right side needs at least one payload column")
    require(payload.forall(!left.columns.contains(_)),
      s"right payload columns ${payload.mkString(",")} collide with left")
    // monotone ts -> chunk id (shared mapping with RangeJoin — see
    // ChunkTime); any monotone map preserves the inclusive as-of semantics
    def chunkOf(c: Column): Column =
      floor(ChunkTime.toNumericSeconds(c, left.schema(tsCol).dataType) /
        chunkWidth).cast("long")
    // deterministic pick among equal (key, ts) right rows (as in asofJoin)
    val dw = Window.partitionBy(col(keyCol), col(tsCol))
      .orderBy(col(tieCol).desc)
    val r1 = right.withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("__chunk", chunkOf(col(tsCol)))
    val payloadStruct = struct(payload.map(col): _*)
    val payloadType = StructType(payload.map(c => right.schema(c)))
    // pass 1: last right payload per (key, chunk) — bounded partitions
    val lastW = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(col(tsCol).desc)
    val lastPerChunk = r1
      .withColumn("__ln", row_number().over(lastW))
      .filter(col("__ln") === 1)
      .select(col(keyCol), col("__chunk"), payloadStruct.as("__last"))
    // pass 2: carry-in per occupied (key, chunk) — one row per occupied
    // chunk from EITHER side, so chunks holding only left rows still see
    // the carry; per-key row count here is #chunks, not #rows
    val lc = left.withColumn("__chunk", chunkOf(col(tsCol)))
    val occupied = lc.select(col(keyCol), col("__chunk"))
      .union(r1.select(col(keyCol), col("__chunk")))
      .distinct()
    val carryW = Window.partitionBy(col(keyCol)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = occupied
      .join(lastPerChunk, Seq(keyCol, "__chunk"), "left")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(carryW))
      .filter(col("__carry").isNotNull)
      .select(col(keyCol), col("__chunk"), col("__carry"))
    // pass 3: union-window per (key, chunk), seeded by the carry-in row
    // (null ts sorts first; right rows before left at equal ts = inclusive)
    val leftCols = left.columns.toSeq
    val leftTagged = lc.withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__chunk") :+ col("__side")) :+
        lit(null).cast(payloadType).as("__payload"): _*)
    val rightTagged = r1.withColumn("__side", lit(0))
      .select((leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__chunk") :+ col("__side")) :+
        payloadStruct.as("__payload"): _*)
    val seedTagged = carryIn.withColumn("__side", lit(-1))
      .select((leftCols.map(c =>
        if (c == keyCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__chunk") :+ col("__side")) :+
        col("__carry").as("__payload"): _*)
    val w = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(col(tsCol).asc_nulls_first, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = leftTagged.unionByName(rightTagged).unionByName(seedTagged)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
