package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank vs an independent scalar reference. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  test("kCore equals the brute-force peel; clique survives, chain cascades") {
    import graft.sql.GeoOps
    // random graph on 0..59 + an ISOLATED 6-clique (ids 100..105, a
    // 5-core) + a pendant 6-node path (ids 200..205 — peel depth ~3, the
    // cascading-removal case)
    val rnd = (0 until 400).map { i =>
      val h = GeoOps.splitmix64(3000L + i)
      (java.lang.Long.remainderUnsigned(h, 60L),
        java.lang.Long.remainderUnsigned(h >>> 20, 60L))
    }.filter(t => t._1 != t._2)
    val clique = for (i <- 100L to 105L; j <- 100L to 105L if i < j) yield (i, j)
    val chain = (0 until 5).map(i => (200L + i, 201L + i))
    val all = rnd ++ clique ++ chain
    val edges = all.toDF("src", "dst")
    def brute(k: Int): Set[Long] = {
      var adj = all.flatMap(t => Seq(t, t.swap)).distinct
      var changed = true
      while (changed) {
        val deg = adj.groupBy(_._1).map { case (n, es) => n -> es.size }
        val dead = deg.filter(_._2 < k).keySet
        changed = dead.nonEmpty
        adj = adj.filter(t => !dead(t._1) && !dead(t._2))
      }
      adj.map(_._1).toSet
    }
    for (k <- Seq(2, 3, 5, 6)) {
      val got = Graph.kCore(edges, "src", "dst", k)
        .as[Long].collect().toSet
      assert(got == brute(k), s"k=$k")
    }
    assert((100L to 105L).toSet.subsetOf(brute(5)), "clique is a 5-core")
    assert(!(100L to 105L).exists(brute(6)), "clique is not a 6-core")
    assert(!(200L to 205L).exists(brute(2)),
      "pendant chain must cascade away even at k=2")
  }

  /** Literal replay of the documented semantics in plain Scala. */
  private def referencePr(edges: Seq[(Long, Long)], iters: Int,
                          scale: Long): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val base = scale * 3L / 20L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val contribs = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) * 17L / 20L / outdeg(s) }.sum }
      r = nodes.map(n => n -> (base + contribs.getOrElse(n, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int = 5,
                  scale: Long = 1000000000L): Map[Long, Long] =
    Graph.pageRank(
        spark.createDataset(edges).toDF("src", "dst").repartition(parts),
        "src", "dst", iters, scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // a small web: 0 is a hub everyone links to; 3 links out only; 4 dangles
  private val web = Seq(
    (1L, 0L), (2L, 0L), (3L, 0L), (1L, 2L), (2L, 1L),
    (3L, 4L), (0L, 1L), (1L, 0L) /* dupe must drop */)

  test("matches the scalar reference bit-for-bit at several depths") {
    for (iters <- Seq(0, 1, 2, 3, 5)) {
      assert(run(web, iters) === referencePr(web, iters, 1000000000L),
        s"iters=$iters")
    }
  }

  test("hub outranks leaves; dangling node keeps only its in-mass") {
    val got = run(web, 3)
    assert(got(0L) > got(4L) && got(0L) > got(2L))
    val ref = referencePr(web, 3, 1000000000L)
    assert(got(4L) === ref(4L))
  }

  test("partition invariance: 1 vs 13 partitions identical") {
    assert(run(web, 3, parts = 1) === run(web, 3, parts = 13))
  }

  test("a ring conserves mass exactly (no dangling, outdeg 1)") {
    // every node passes floor(r·17/20) along; ranks stay uniform
    val ring = (0L until 6L).map(i => i -> ((i + 1) % 6))
    val got = run(ring, 4)
    assert(got.values.toSet.size === 1)
    assert(got === referencePr(ring, 4, 1000000000L))
  }

  // ------------------------------------------------------------ triangles

  /** Literal per-node triangle counts: enumerate all id-ordered vertex
    * triples of the undirected simple graph. */
  private def referenceTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = (und.map(_._1) ++ und.map(_._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if und((a, b)) && und((a, c)) && und((b, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private def runTri(edges: Seq[(Long, Long)], parts: Int = 5): Map[Long, Long] =
    Graph.triangleCounts(
        spark.createDataset(edges).toDF("src", "dst").repartition(parts),
        "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle counts match brute force on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(220)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
    assert(runTri(edges) === referenceTriangles(edges))
  }

  test("triangles: reversed/duplicate edges and self-loops drop; " +
    "hub wedge explosion avoided by orientation") {
    // K4 on {0..3} given as a dirty mix of directions/dupes/loops, plus a
    // hub (9) with many spokes and no closing edges (zero triangles)
    val k4 = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (0L, 3L), (1L, 2L),
      (2L, 3L), (3L, 1L), (2L, 2L))
    val spokes = (10L to 30L).map(i => (i, 9L))
    val got = runTri(k4 ++ spokes)
    // each K4 vertex sits in C(3,2) = 3 triangles
    assert(Seq(0L, 1L, 2L, 3L).forall(got(_) == 3L))
    assert(got(9L) === 0L && got(10L) === 0L)
    assert(got === referenceTriangles(k4 ++ spokes))
  }

  test("triangle counts are partition-invariant") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(150)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
    assert(runTri(edges, parts = 1) === runTri(edges, parts = 13))
  }
}
