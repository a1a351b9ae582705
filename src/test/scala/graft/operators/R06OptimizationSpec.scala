package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Geom, GeomTypes, Measure, Wkt}
import graft.sql.Geo

/** Focused equivalence tests for the round-6 optimization changes: each
  * optimization must be VALUE-identical to the shape it replaced. */
class R06OptimizationSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Geo.register(s)
    s
  }

  // ---- st_minsharedtile ≡ array_min(array_intersect(a, b)) ----

  test("st_minsharedtile matches array_min(array_intersect) on random covers") {
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val rows = (0 until 2000).map { _ =>
      def arr() = Array.fill(rnd.nextInt(12))(rnd.nextInt(40).toLong)
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", call_function("st_minsharedtile", col("a"), col("b")))
      .withColumn("ref", array_min(array_intersect(col("a"), col("b"))))
    assert(df.filter(!(col("fast") <=> col("ref"))).count() == 0)
  }

  // ---- Measure.intersects fast paths ----

  private def g(wkt: String): Geom = Wkt.parse(wkt)

  test("intersects envelope early-out and rectangle fast path stay exact") {
    val rnd = new scala.util.Random(11)
    // random axis-aligned rectangles: intersects must equal closed-interval
    // overlap (the solid-rectangle ground truth)
    for (_ <- 0 until 3000) {
      def rect() = {
        val x0 = rnd.nextInt(50) - 25; val y0 = rnd.nextInt(50) - 25
        val w = rnd.nextInt(8) + 1; val h = rnd.nextInt(8) + 1
        (x0.toDouble, y0.toDouble, (x0 + w).toDouble, (y0 + h).toDouble)
      }
      val (ax0, ay0, ax1, ay1) = rect()
      val (bx0, by0, bx1, by1) = rect()
      def poly(x0: Double, y0: Double, x1: Double, y1: Double) =
        g(s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")
      val expected = ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1
      assert(Measure.intersects(poly(ax0, ay0, ax1, ay1),
        poly(bx0, by0, bx1, by1)) == expected,
        s"($ax0,$ay0,$ax1,$ay1) x ($bx0,$by0,$bx1,$by1)")
    }
  }

  test("intersects non-rectangle and degenerate shapes take the exact path") {
    // triangle vs rectangle: corner region of the rect's envelope that the
    // triangle does not cover — envelopes overlap, geometries do not
    val tri = g("POLYGON ((0 0, 10 0, 0 10, 0 0))")
    val farCorner = g("POLYGON ((8 8, 9 8, 9 9, 8 9, 8 8))")
    assert(!Measure.intersects(tri, farCorner))
    assert(Measure.intersects(tri, g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")))
    // touching rectangles intersect (closed intervals)
    assert(Measure.intersects(
      g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      g("POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))")))
    // strictly disjoint envelopes -> false via the early-out
    assert(!Measure.intersects(
      g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      g("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")))
    // a backtracking 5-point ring (zero area, envelope-sized) must NOT be
    // treated as a solid rectangle: its boundary misses the other box
    val backtrack = g("POLYGON ((0 0, 4 0, 4 4, 4 0, 0 0))")
    val inside = g("POLYGON ((1 2, 2 2, 2 3, 1 3, 1 2))")
    assert(!Measure.intersects(backtrack, inside))
  }

  // ---- dupClusters pointer jumping: same fixpoint, long chains ----

  test("dupClusters labels a 200-node chain with its min id (log rounds)") {
    import spark.implicits._
    val chain = (0 until 199).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val out = Dedup.dupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 200 && out.values.forall(_ == 0L))
    // two components + a singleton-free check
    val two = ((0 until 50).map(i => (i.toLong, (i + 1).toLong)) ++
      (100 until 150).map(i => (i.toLong, (i + 1).toLong)))
      .toDF("id_a", "id_b")
    val m = Dedup.dupClusters(two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 to 51).forall(i => !m.contains(i.toLong) || m(i.toLong) == 0L))
    assert((100 to 150).forall(i => m(i.toLong) == 100L))
  }

  // ---- observe-based convergence: edge cases of the in-action metric ----

  test("dupClusters converges via the observed changed-count on edge cases") {
    import spark.implicits._
    // empty edge list: zero label rows -> null metric -> converged round 0
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.dupClusters(empty).count() == 0L)
    // single edge: one propagation round + one no-change round
    val one = Seq((7L, 3L)).toDF("id_a", "id_b")
    val m1 = Dedup.dupClusters(one).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == Map(7L -> 3L, 3L -> 3L))
    // self-loop only: labels stay themselves, converged after round 0
    val self = Seq((5L, 5L)).toDF("id_a", "id_b")
    val m2 = Dedup.dupClusters(self).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m2 == Map(5L -> 5L))
  }

  // ---- pageRank single-plan composition: unchanged values ----

  test("pageRank single lazy plan reproduces the fixed-point values") {
    import spark.implicits._
    // star: hub 0 <- 1..5, plus 0 -> 1 back edge
    val edges = ((1 to 5).map(i => (i.toLong, 0L)) :+ (0L, 1L))
      .toDF("src", "dst")
    val r = graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // replay the integer recurrence in-test
    val scale = 1000000000L
    val base = scale * 3L / 20L
    var rank = Map((0L to 5L).map(_ -> scale): _*)
    for (_ <- 0 until 3) {
      def share(n: Long, outdeg: Long) = rank(n) * 17L / 20L / outdeg
      val next = (0L to 5L).map { n =>
        val in = n match {
          case 0L => (1L to 5L).map(share(_, 1L)).sum
          case 1L => share(0L, 1L)
          case _ => 0L
        }
        n -> (base + in)
      }.toMap
      rank = next
    }
    assert(r == rank)
  }
}
