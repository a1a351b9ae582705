package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Range (interval-containment) join — the other join Spark lacks natively
  * (with [[AsOf]]): each point row matches the interval rows whose
  * `[lo, hi]` contains it, optionally on equal keys.
  *
  * Spark plans a raw `pt BETWEEN lo AND hi` predicate as
  * BroadcastNestedLoopJoin (all-pairs — dead at scale). Here the number
  * line is cut into fixed-width chunks: intervals EXPLODE to the chunks
  * they cover, points map to their single containing chunk, and the match
  * becomes a hash equi-join on (keys…, chunk) + exact BETWEEN refine.
  * Because a point owns exactly ONE chunk, every matching pair surfaces
  * exactly once — no distinct pass.
  *
  * Scale shape: shuffle keys are (key…, chunk) — skew is bounded by
  * points-per-chunk, tunable via `chunkWidth`; the interval blow-up is
  * `width/chunkWidth` rows per interval, so pick `chunkWidth` near the
  * typical interval width (the standard range-join binning trade: fewer
  * chunks = fatter probe lists, more chunks = fatter interval explode).
  * Small interval sets broadcast instead (`broadcastIntervals`), making
  * the whole join map-side. */
object RangeJoin {

  private def numeric(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    ChunkTime.toNumericSeconds(c, dt)

  /** Inner interval join: all `points` columns + all `intervals` columns
    * for each containment match (`lo <= pt <= hi`, inclusive both ends).
    *
    * @param keys optional equi-join key columns present on BOTH sides
    *             (e.g. user_id) — matches require equality on all of them
    * @param chunkWidth bin width in the point column's native unit
    *                   (timestamps count seconds) */
  def intervalJoin(points: DataFrame, ptCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   chunkWidth: Double, keys: Seq[String] = Nil,
                   broadcastIntervals: Boolean = false): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    require(keys.forall(k => points.columns.contains(k) &&
      intervals.columns.contains(k)), s"keys $keys must exist on both sides")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(shared.isEmpty,
      s"non-key columns ${shared.mkString(",")} exist on both sides")
    val pts = points.withColumn("__chunk",
      floor(numeric(col(ptCol), points.schema(ptCol).dataType) / chunkWidth)
        .cast("long"))
    val ivs = intervals.withColumn("__chunk", explode(sequence(
      floor(numeric(col(loCol), intervals.schema(loCol).dataType) / chunkWidth)
        .cast("long"),
      floor(numeric(col(hiCol), intervals.schema(hiCol).dataType) / chunkWidth)
        .cast("long"))))
    val rhs = if (broadcastIntervals) broadcast(ivs) else ivs
    pts.join(rhs, keys :+ "__chunk")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__chunk")
  }

  /** Interval–interval OVERLAP join: all (left, right) pairs whose CLOSED
    * intervals intersect (`loL <= hiR && loR <= hiL`), optionally on
    * equal keys — the session-overlap / availability / shift-conflict
    * join. Same chunk-binning shape as [[intervalJoin]]: both sides
    * explode to the contiguous chunk range their interval covers and
    * candidates hash-equi-join on (keys…, chunk) — never the
    * BroadcastNestedLoopJoin Spark plans for a raw inequality predicate.
    *
    * Exactly-once with no distinct pass: a pair's shared chunks are the
    * intersection of two CONTIGUOUS ranges, so the minimum shared chunk
    * is simply `max(loChunk_left, loChunk_right)` — computable from
    * columns already in flight; the pair is claimed only there.
    *
    * Inverted (`hi < lo`) or non-finite (NaN/±Inf) intervals match
    * NOTHING. All need explicit drops: Spark's `sequence` would silently
    * DESCEND on an inverted range, Spark orders NaN GREATER than every
    * value (so `lo <= NaN-hi` is true and a NaN bound would otherwise
    * match everything past lo), and an Inf bound would floor to
    * Long.MaxValue and CRASH the chunk explode instead of degrading
    * (all caught by the spec's degenerate battery).
    * Blow-up/skew trades are [[intervalJoin]]'s; pick `chunkWidth` near
    * the typical interval width of the DENSER side. */
  def overlapJoin(left: DataFrame, loL: String, hiL: String,
                  right: DataFrame, loR: String, hiR: String,
                  chunkWidth: Double, keys: Seq[String] = Nil,
                  broadcastRight: Boolean = false): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    require(keys.forall(k => left.columns.contains(k) &&
      right.columns.contains(k)), s"keys $keys must exist on both sides")
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(shared.isEmpty,
      s"non-key columns ${shared.mkString(",")} exist on both sides")
    def chunkOf(df: DataFrame, c: String): Column =
      floor(numeric(col(c), df.schema(c).dataType) / chunkWidth).cast("long")
    def finite(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case TimestampType | TimestampNTZType => lit(true)
        case _ =>
          val d = col(c).cast("double")
          !isnan(d) && d > lit(Double.NegativeInfinity) &&
            d < lit(Double.PositiveInfinity)
      }
    val l = left.where(col(loL) <= col(hiL) &&
        finite(left, loL) && finite(left, hiL))
      .withColumn("__lc0", chunkOf(left, loL))
      .withColumn("__chunk", explode(sequence(col("__lc0"), chunkOf(left, hiL))))
    val r = right.where(col(loR) <= col(hiR) &&
        finite(right, loR) && finite(right, hiR))
      .withColumn("__rc0", chunkOf(right, loR))
      .withColumn("__chunk", explode(sequence(col("__rc0"), chunkOf(right, hiR))))
    val rhs = if (broadcastRight) broadcast(r) else r
    l.join(rhs, keys :+ "__chunk")
      .filter(col("__chunk") === greatest(col("__lc0"), col("__rc0")))
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .drop("__chunk", "__lc0", "__rc0")
  }
}

/** Shared monotone value -> numeric-seconds mapping for chunk binning —
  * ONE definition so [[RangeJoin]] and [[AsOf.asofJoinChunked]] can never
  * bin the same column differently (timestamps, incl. NTZ which refuses a
  * double cast, go through epoch micros; any monotone map preserves both
  * operators' semantics). */
private[operators] object ChunkTime {
  def toNumericSeconds(c: Column,
                       dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case TimestampType | TimestampNTZType =>
        unix_micros(c.cast("timestamp")) / lit(1e6)
      case _ => c.cast("double")
    }
}
