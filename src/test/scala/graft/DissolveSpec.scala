package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dissolve
import graft.sql.SparkTestSession

/** st_union_agg (deterministic cascaded union) + the Dissolve operator:
  * weld semantics, canonical output, partition invariance, and the
  * two-level (hex-bucketed) shape's bit-equality on grid inputs. */
class DissolveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  import spark.implicits._

  /** rows: (key, unit box [i, i+1] × [0, 1]) */
  private def boxes(rows: Seq[(Int, Int)]) =
    rows.toDF("k", "i").withColumn("g",
      expr("st_boxtopolygon(CAST(i AS DOUBLE), 0.0d, CAST(i + 1 AS DOUBLE), 1.0d)"))

  private def unionWkt(rows: Seq[(Int, Int)], parts: Int = 1): Map[Int, String] =
    boxes(rows).repartition(parts)
      .groupBy("k").agg(expr("st_aswkt(st_union_agg(g))").as("w"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  test("adjacent boxes weld into one ring; gaps split islands") {
    val m = unionWkt(Seq(1 -> 0, 1 -> 1, 1 -> 2, 2 -> 0, 2 -> 2))
    // island of 3 adjacent boxes: one shell, interior edges gone, the
    // shared-edge vertices stay as collinear ring points
    assert(m(1) ==
      "POLYGON ((0 0, 1 0, 2 0, 3 0, 3 1, 2 1, 1 1, 0 1, 0 0))")
    // gap -> two islands, canonically sorted by smallest shell vertex
    assert(m(2) ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 0, 3 0, 3 1, 2 1, 2 0)))")
  }

  test("result is partition/retry-invariant (1 vs 13 partitions)") {
    val rows = (0 until 60).map(i => (i % 4, (i * 7) % 15))
    assert(unionWkt(rows, parts = 1) == unionWkt(rows, parts = 13))
  }

  test("duplicates are idempotent; empties drop; all-empty group is POLYGON EMPTY") {
    val m = unionWkt(Seq(1 -> 5, 1 -> 5, 1 -> 5))
    assert(m(1) == "POLYGON ((5 0, 6 0, 6 1, 5 1, 5 0))")
    val withEmpty = spark.sql(
      """SELECT st_aswkt(st_union_agg(g)) FROM VALUES
        |  (st_boxtopolygon(0.0d, 0.0d, 1.0d, 1.0d)),
        |  (st_geomfromwkt('POLYGON EMPTY')) AS t(g)""".stripMargin)
      .collect()(0).getString(0)
    assert(withEmpty == "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    val allEmpty = spark.sql(
      "SELECT st_aswkt(st_union_agg(st_geomfromwkt('POLYGON EMPTY')))")
      .collect()(0).getString(0)
    assert(allEmpty == "POLYGON EMPTY")
  }

  test("overlapping boxes: union area = covered cells exactly") {
    // [0,2]x[0,1] overlaps [1,3]x[0,1]: union = [0,3]x[0,1]
    val got = spark.sql(
      """SELECT st_area(st_union_agg(g)), st_aswkt(st_union_agg(g)) FROM VALUES
        |  (st_boxtopolygon(0.0d, 0.0d, 2.0d, 1.0d)),
        |  (st_boxtopolygon(1.0d, 0.0d, 3.0d, 1.0d)) AS t(g)""".stripMargin)
      .collect()(0)
    assert(got.getDouble(0) == 3.0)
    // the crossing points at x=1 and x=2 survive as ring vertices
    assert(got.getString(1) ==
      "POLYGON ((0 0, 1 0, 2 0, 3 0, 3 1, 2 1, 1 1, 0 1, 0 0))")
  }

  test("dissolve: two-level (hex-bucketed) equals direct, bit for bit, on grid inputs") {
    val rows = (0 until 200).map(i => (i % 3, (i * 11) % 40))
    val df = boxes(rows)
    def dump(out: org.apache.spark.sql.DataFrame): Map[Int, String] =
      out.select(col("k"), expr("st_aswkt(g)").as("w"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val direct = dump(Dissolve.dissolve(df, Seq("k"), "g"))
    // small cellSize -> many buckets per key (real two-level work)
    val two = dump(Dissolve.dissolve(df, Seq("k"), "g", cellSize = Some(2.0)))
    // large cellSize -> single bucket per key (degenerate two-level)
    val one = dump(Dissolve.dissolve(df, Seq("k"), "g", cellSize = Some(1e6)))
    assert(direct == two)
    assert(direct == one)
    // bucket helper column must not leak into the output
    assert(Dissolve.dissolve(df, Seq("k"), "g", cellSize = Some(2.0))
      .columns.toSeq == Seq("k", "g"))
  }

  test("Z operands are rejected at every group size (no silent Z drop)") {
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    // singleton group used to shortcut past the dims guard and silently
    // drop Z where a 2-element group threw
    for (vals <- Seq(
      "(st_geomfromwkt('POLYGON Z ((0 0 1, 1 0 1, 1 1 1, 0 1 1, 0 0 1))'))",
      """(st_geomfromwkt('POLYGON Z ((0 0 1, 1 0 1, 1 1 1, 0 1 1, 0 0 1))')),
        |(st_geomfromwkt('POLYGON ((2 0, 3 0, 3 1, 2 1, 2 0))'))""".stripMargin)) {
      val t = intercept[Throwable](
        spark.sql(s"SELECT st_aswkt(st_union_agg(g)) FROM VALUES $vals AS t(g)")
          .collect())
      assert(causes(t).exists(c =>
        c.getMessage != null && c.getMessage.contains("XY geometries only")),
        s"expected the XY-only guard, got $t")
    }
  }

  test("single-geometry groups come out canonical (CW shell input flips CCW)") {
    val got = spark.sql(
      """SELECT st_aswkt(st_union_agg(
        |  st_geomfromwkt('POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))')))""".stripMargin)
      .collect()(0).getString(0)
    assert(got == "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
  }
}
