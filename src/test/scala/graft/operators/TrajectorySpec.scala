package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrajectorySpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  // two entities: #1 a 3-ping L-shaped track (with a duplicate-timestamp
  // ping to exercise the NULL-speed guard), #2 a single ping
  private def pings = Seq(
    (1L, t("2026-01-01 00:00:00"), 1L, 0.0, 0.0),
    (1L, t("2026-01-01 00:00:10"), 2L, 3.0, 0.0),
    (1L, t("2026-01-01 00:00:10"), 3L, 3.0, 4.0), // dt=0 -> NULL speed
    (2L, t("2026-01-01 00:00:00"), 4L, 7.0, 7.0)
  ).toDF("entity", "ts", "tie", "lon", "lat")

  test("withKinematics: step distance, elapsed, NULL-guarded speed") {
    val out = Trajectory
      .withKinematics(pings, "entity", "ts", "tie", "lon", "lat")
      .select("tie", "step_dist", "step_s", "speed")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((None, None, None)))                   // first ping
    assert(out(2L) == ((Some(3.0), Some(10.0), Some(0.3))))   // 3 units / 10 s
    assert(out(3L) == ((Some(4.0), Some(0.0), None)))         // dt=0 -> no 0/0
    assert(out(4L) == ((None, None, None)))                   // lone entity
  }

  test("buildTracks: time-ordered LINESTRING, exact length, 1-ping tracks kept") {
    val out = Trajectory
      .buildTracks(pings, "entity", "ts", "tie", "lon", "lat")
      .selectExpr("entity", "n_pings", "track_len",
        "st_aswkt(track) AS wkt")
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 7.0, "LINESTRING (0 0, 3 0, 3 4)")))
    assert(out(2L) == ((1L, 0.0, "LINESTRING (7 7)")))
  }

  test("odMatrix: first/last ping tiles, flows aggregated") {
    // zoom 0: the whole world is tile (0,0) -> both entities fold into one
    // flow cell with n_entities=2, n_pings=4
    val z0 = Trajectory
      .odMatrix(pings, "entity", "ts", "tie", "lon", "lat", z = 0)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(z0.toSeq == Seq((0L, 0L, 0L, 0L, 2L, 4L)))
    // first/last must follow (ts, tie): entity 1 origin=(0,0), dest=(3,4)
    val ends = Trajectory
      .odMatrix(pings.filter($"entity" === 1L),
        "entity", "ts", "tie", "lon", "lat", z = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(ends.length == 1)
    val (otx, oty, dtx, dty, ne, np) = ends.head
    assert((ne, np) == ((1L, 3L)))
    // origin tile strictly west of dest tile at z10 (lon 0 vs 3)
    assert(otx < dtx && oty >= dty) // lat 0 -> 4 moves north (smaller y)
  }

  test("partitioning invariance: 1 vs 8 partitions produce identical tracks") {
    val a = Trajectory.buildTracks(pings.coalesce(1),
      "entity", "ts", "tie", "lon", "lat")
      .selectExpr("entity", "st_aswkb(track) AS w", "track_len")
      .as[(Long, Array[Byte], Double)].collect()
      .map(r => (r._1, r._2.toSeq, r._3)).sortBy(_._1)
    val b = Trajectory.buildTracks(pings.repartition(8),
      "entity", "ts", "tie", "lon", "lat")
      .selectExpr("entity", "st_aswkb(track) AS w", "track_len")
      .as[(Long, Array[Byte], Double)].collect()
      .map(r => (r._1, r._2.toSeq, r._3)).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("withKinematics pays one shuffle (all windows share the entity sort)") {
    val plan = Trajectory
      .withKinematics(pings, "entity", "ts", "tie", "lon", "lat")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"kinematics must pay one shuffle, got $exchanges:\n$plan")
  }
}
