package graft.sql

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Linear-referencing inverses + proximity + azimuth (q124 family):
  * st_linelocatepoint, st_closestpoint, st_shortestline, st_azimuth. */
class LineRefSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def d(sql: String): Double =
    spark.sql(s"SELECT $sql").collect()(0).getDouble(0)
  private def s1(sql: String): String =
    spark.sql(s"SELECT $sql").collect()(0).getString(0)

  test("locate is the inverse of interpolate on on-line points") {
    // locate(interpolate(f)) == f up to fp for random bent lines; the
    // composition is the PostGIS contract for on-line points.
    val rnd = new scala.util.Random(20260818)
    for (_ <- 1 to 120) {
      val n = 2 + rnd.nextInt(4)
      val pts = Seq.tabulate(n)(i =>
        (i * 10.0 + rnd.nextDouble() * 8 - 4, rnd.nextDouble() * 20 - 10))
      val wkt = pts.map { case (x, y) => s"$x $y" }.mkString("LINESTRING (", ", ", ")")
      val f = rnd.nextDouble()
      val got = d(
        s"""st_linelocatepoint(st_geomfromwkt('$wkt'),
           |  st_lineinterpolate(st_geomfromwkt('$wkt'), CAST($f AS DOUBLE)))""".stripMargin)
      assert(math.abs(got - f) < 1e-9, s"locate(interp($f)) = $got on $wkt")
    }
  }

  test("closest point: clamping, interior projection, multiline/multipoint") {
    // off both ends -> clamps to the end vertices
    assert(s1("st_aswkt(st_closestpoint(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(CAST(-5.0 AS DOUBLE), CAST(3.0 AS DOUBLE))))")
      == "POINT (0 0)")
    assert(s1("st_aswkt(st_closestpoint(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(CAST(14.0 AS DOUBLE), CAST(-2.0 AS DOUBLE))))")
      == "POINT (10 0)")
    // interior projection drops perpendicularly
    assert(s1("st_aswkt(st_closestpoint(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(CAST(4.0 AS DOUBLE), CAST(9.0 AS DOUBLE))))")
      == "POINT (4 0)")
    // multilinestring scans parts in order; nearest part wins
    assert(s1("st_aswkt(st_closestpoint(st_geomfromwkt('MULTILINESTRING ((0 0, 1 0), (10 0, 10 10))'), st_point(CAST(9.0 AS DOUBLE), CAST(5.0 AS DOUBLE))))")
      == "POINT (10 5)")
    // multipoint = nearest vertex
    assert(s1("st_aswkt(st_closestpoint(st_geomfromwkt('MULTIPOINT (0 0, 7 1, 20 0)'), st_point(CAST(6.0 AS DOUBLE), CAST(0.0 AS DOUBLE))))")
      == "POINT (7 1)")
    // shortest line runs closest -> query point
    assert(s1("st_aswkt(st_shortestline(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(CAST(4.0 AS DOUBLE), CAST(9.0 AS DOUBLE))))")
      == "LINESTRING (4 0, 4 9)")
    // EMPTY either side -> null
    assert(spark.sql("SELECT st_closestpoint(st_geomfromwkt('LINESTRING EMPTY'), st_point(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))")
      .collect()(0).isNullAt(0))
  }

  test("closest point on multiline matches brute force over segments") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 60) {
      val parts = Seq.fill(1 + rnd.nextInt(3)) {
        val n = 2 + rnd.nextInt(3)
        Seq.fill(n)((rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 40 - 20))
      }
      val wkt = parts.map(p => p.map { case (x, y) => s"$x $y" }
        .mkString("(", ", ", ")")).mkString("MULTILINESTRING (", ", ", ")")
      val (px, py) = (rnd.nextDouble() * 60 - 30, rnd.nextDouble() * 60 - 30)
      val got = spark.sql(
        s"""SELECT st_x(st_closestpoint(st_geomfromwkt('$wkt'),
           |  st_point(CAST($px AS DOUBLE), CAST($py AS DOUBLE)))) AS x,
           |  st_y(st_closestpoint(st_geomfromwkt('$wkt'),
           |  st_point(CAST($px AS DOUBLE), CAST($py AS DOUBLE)))) AS y""".stripMargin)
        .collect()(0)
      val best = parts.flatMap(p => p.sliding(2).map { seg =>
        val Seq((xa, ya), (xb, yb)) = seg.toSeq
        val (dx, dy) = (xb - xa, yb - ya)
        val len2 = dx * dx + dy * dy
        val t = math.max(0.0, math.min(1.0,
          if (len2 == 0) 0.0 else ((px - xa) * dx + (py - ya) * dy) / len2))
        val (cx, cy) = (xa + dx * t, ya + dy * t)
        ((px - cx) * (px - cx) + (py - cy) * (py - cy), cx, cy)
      }).minBy(_._1)
      assert(math.abs(got.getDouble(0) - best._2) < 1e-12 &&
        math.abs(got.getDouble(1) - best._3) < 1e-12,
        s"closest mismatch on $wkt at ($px,$py)")
    }
  }

  test("azimuth: quadrants, wrap-around, null flags") {
    val eps = 1e-12
    assert(math.abs(d("st_azimuth(st_point(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), st_point(CAST(0.0 AS DOUBLE), CAST(9.0 AS DOUBLE)))")) < eps)
    assert(math.abs(d("st_azimuth(st_point(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), st_point(CAST(3.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))") - math.Pi / 2) < eps)
    assert(math.abs(d("st_azimuth(st_point(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), st_point(CAST(0.0 AS DOUBLE), CAST(-1.0 AS DOUBLE)))") - math.Pi) < eps)
    assert(math.abs(d("st_azimuth(st_point(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), st_point(CAST(-5.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))") - 3 * math.Pi / 2) < eps)
    // general direction agrees with atan2 wrap, always in [0, 2pi)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val (dx, dy) = (rnd.nextDouble() * 10 - 5, rnd.nextDouble() * 10 - 5)
      if (dx != 0.0 || dy != 0.0) {
        val expect = { val a = math.atan2(dx, dy); if (a < 0) a + 2 * math.Pi else a }
        val got = d(s"st_azimuth(st_point(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), st_point(CAST($dx AS DOUBLE), CAST($dy AS DOUBLE)))")
        assert(got == expect && got >= 0 && got < 2 * math.Pi)
      }
    }
    // coincident -> null (PostGIS nulls), EMPTY -> null
    assert(spark.sql("SELECT st_azimuth(st_point(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), st_point(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)))").collect()(0).isNullAt(0))
    assert(spark.sql("SELECT st_azimuth(st_geomfromwkt('POINT EMPTY'), st_point(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)))").collect()(0).isNullAt(0))
  }

  test("locate: clamped ends, zero-length line, first-wins tie") {
    assert(d("st_linelocatepoint(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(CAST(-4.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))") == 0.0)
    assert(d("st_linelocatepoint(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(CAST(99.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))") == 1.0)
    assert(d("st_linelocatepoint(st_geomfromwkt('LINESTRING (5 5, 5 5)'), st_point(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))") == 0.0)
    // equidistant from both segments of a right angle: first segment wins
    assert(d("st_linelocatepoint(st_geomfromwkt('LINESTRING (0 0, 10 0, 10 10)'), st_point(CAST(10.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))") == 0.5)
  }
}
