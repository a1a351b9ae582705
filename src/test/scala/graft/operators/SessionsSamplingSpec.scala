package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionsSamplingSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  test("sessionize: gap boundaries, per-key ordinals, one shuffle") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2026-01-01 00:00:00"), 1L),
      (2L, t("2026-01-01 00:10:00"), 1L),
      (3L, t("2026-01-01 00:40:00"), 1L), // 30:00 gap exactly -> same session
      (4L, t("2026-01-01 01:10:01"), 1L), // 30:01 -> new session
      (5L, t("2026-01-01 00:05:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = Sessions.sessionize(events, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
    // both window operators share one (key, time) sort: a single Exchange
    val plan = Sessions.sessionStats(events, "user_id", "ts", "event_id", 1800L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"sessionize must pay one shuffle, got $exchanges:\n$plan")
  }

  test("asofJoin: matches brute force, inclusive ties, one shuffle") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2026-01-01 00:05:00")),
      (2L, 1L, t("2026-01-01 00:10:00")), // == quote ts -> inclusive match
      (3L, 1L, t("2026-01-01 00:00:30")), // before any quote -> null
      (4L, 2L, t("2026-01-01 00:20:00")),
      (5L, 3L, t("2026-01-01 00:20:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, t("2026-01-01 00:01:00"), 100L),
      (1L, t("2026-01-01 00:10:00"), 101L),
      (1L, t("2026-01-01 00:10:00"), 102L), // dup ts -> max tie wins
      (2L, t("2026-01-01 00:02:00"), 200L)
    ).toDF("user_id", "ts", "quote_id")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", "quote_id")
      .select("event_id", "quote_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(102L), 3L -> None,
      4L -> Some(200L), 5L -> None))
    // one shuffle for the as-of itself (the dedup window keys differently,
    // so <= 2 exchanges total; no range/nested-loop join anywhere)
    val plan = AsOf.asofJoin(left, right, "user_id", "ts", "quote_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"as-of must stay union-window shaped:\n$plan")
  }

  test("asofJoinChunked: identical to asofJoin on a monster-key corpus") {
    // one key holds 90% of the rows — the case the chunked variant exists
    // for; every chunk width must reproduce the single-window answer
    // exactly, including carries across empty and left-only chunks
    val rnd = new scala.util.Random(23)
    val left = (0 until 2000).map { i =>
      val key = if (i % 10 == 0) (i % 3 + 2).toLong else 1L
      (i.toLong, key, (rnd.nextInt(100000)).toLong)
    }.toDF("event_id", "user_id", "ts")
    val right = (0 until 300).map { i =>
      val key = if (i % 10 == 0) (i % 3 + 2).toLong else 1L
      (key, (rnd.nextInt(100000)).toLong, (1000 + i).toLong)
    }.toDF("user_id", "ts", "quote_id")
    val base = AsOf.asofJoin(left, right, "user_id", "ts", "quote_id")
      .select("event_id", "quote_id").as[(Long, Option[Long])]
      .collect().toMap
    for (width <- Seq(100.0, 7777.0, 1000000.0)) {
      val chunked = AsOf.asofJoinChunked(left, right, "user_id", "ts",
          "quote_id", width)
        .select("event_id", "quote_id").as[(Long, Option[Long])]
        .collect().toMap
      assert(chunked == base, s"width $width")
    }
    // the big window now partitions by (key, chunk): no single-key task
    val plan = AsOf.asofJoinChunked(left, right, "user_id", "ts",
        "quote_id", 100.0).queryExecution.executedPlan.toString
    assert(plan.contains("__chunk"), s"chunk column must key the window:\n$plan")
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("intervalJoin: matches brute force, no nested-loop, keys respected") {
    val rnd = new scala.util.Random(31)
    val pts = (0 until 1000).map(i =>
      (i.toLong, (i % 4).toLong, rnd.nextInt(10000).toDouble))
    val ivs = (0 until 60).map(i =>
      (i.toLong, (i % 4).toLong, rnd.nextInt(9000).toDouble))
      .map { case (id, k, lo) => (id, k, lo, lo + 50 + rnd.nextInt(2000)) }
    val ptsDf = pts.toDF("pid", "k", "v")
    val ivsDf = ivs.toDF("iid", "k", "lo", "hi")
    for (width <- Seq(100.0, 1234.0); bcast <- Seq(false, true)) {
      val got = RangeJoin.intervalJoin(ptsDf, "v", ivsDf, "lo", "hi",
          chunkWidth = width, keys = Seq("k"), broadcastIntervals = bcast)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      val expected = for {
        (pid, pk, v) <- pts
        (iid, ik, lo, hi) <- ivs
        if pk == ik && v >= lo && v <= hi
      } yield (pid, iid)
      // exactly-once semantics: multiset equality, not just set
      assert(got.sorted == expected.sorted, s"width $width bcast $bcast")
    }
    val plan = RangeJoin.intervalJoin(ptsDf, "v", ivsDf, "lo", "hi", 500.0,
        keys = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must bin into an equi-join:\n$plan")
  }

  test("asofJoin: latest row wins atomically — null payload fields carried") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, 1L, t("2026-01-01 00:30:00"))).toDF("event_id", "user_id", "ts")
    // newer right row has a NULL x: the match must return (x=null, y=8)
    // from ts=2, never mix in the older row's x=5
    val right = Seq(
      (1L, t("2026-01-01 00:01:00"), Some(5L), 7L),
      (1L, t("2026-01-01 00:02:00"), None, 8L)
    ).toDF("user_id", "ts", "x", "y")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", "y")
      .select("x", "y").collect()(0)
    assert(out.isNullAt(0) && out.getLong(1) == 8L, out.toString)
  }

  test("decontaminate: flags exactly the docs sharing an n-gram") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains the benchmark 8-gram verbatim inside longer text
      (1L, "xx alpha beta gamma delta epsilon zeta eta theta yy"),
      // 7-word overlap only -> clean
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "completely different words in this one here now ok"),
      (4L, "short doc")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "text", "doc_id", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L), out.toString)
  }

  test("balanceSources: achieved mix tracks targets, deterministic") {
    val df = ((0 until 8000).map(i => (i.toLong, "web")) ++
      (8000 until 9000).map(i => (i.toLong, "books")) ++
      (9000 until 11000).map(i => (i.toLong, "code")) ++
      (11000 until 11100).map(i => (i.toLong, "junk")))
      .toDF("doc_id", "source")
    val out = Sampling.balanceSources(df, "source", "doc_id",
      Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25), seed = 3L)
    val got = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // bottleneck = books (1000 rows / 0.25 share): keeps all 1000;
    // web keeps ~2000 of 8000, code ~1000 of 2000; junk dropped
    assert(got("books") == 1000L)
    assert(math.abs(got("web") - 2000L) < 150, got.toString)
    assert(math.abs(got("code") - 1000L) < 100, got.toString)
    assert(!got.contains("junk"))
    // membership is a pure function of (id, seed): re-run identical
    val again = Sampling.balanceSources(df, "source", "doc_id",
      Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25), seed = 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("dupClusters: empty pair set yields singletons, no crash") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = Dedup.withClusters(docs, "doc_id", noPairs)
      .select("doc_id", "cluster", "is_rep")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 1), (2L, 2L, 1), (3L, 3L, 1)))
  }

  test("hll_sketch: partition-invariant, accurate, groupBy-able") {
    graft.sql.Geo.register(spark)
    val n = 20000
    def run(parts: Int) = spark.range(n).repartition(parts)
      .selectExpr("hll_sketch(id, 8) AS s")
      .selectExpr("s.estimate", "s.reg_checksum", "s.zero_regs")
      .collect()(0)
    // max-merge registers: identical result under any partitioning
    val a = run(1); val b = run(7); val c = run(32)
    assert(a == b && b == c, s"$a vs $b vs $c")
    // standard HLL accuracy: ~1.04/sqrt(256) ≈ 6.5% — allow 3 sigma
    val est = a.getDouble(0)
    assert(math.abs(est - n) / n < 0.2, s"estimate $est for $n distinct")
    // duplicates don't move the registers (idempotent update)
    val dup = spark.range(n).union(spark.range(n)).repartition(5)
      .selectExpr("hll_sketch(id, 8) AS s")
      .selectExpr("s.estimate", "s.reg_checksum", "s.zero_regs").collect()(0)
    assert(dup == a)
    // per-group sketches in one pass
    val grouped = spark.range(n).selectExpr("id % 4 AS g", "id")
      .groupBy("g").agg(expr("hll_sketch(id, 8).estimate AS est"))
      .collect().map(r => r.getDouble(1))
    assert(grouped.length == 4 &&
      grouped.forall(e => math.abs(e - n / 4.0) / (n / 4.0) < 0.25),
      grouped.mkString(","))
  }

  test("cms_sketch: partition-invariant counters, upper-bound estimates") {
    graft.sql.Geo.register(spark)
    // skewed frequencies: id i appears (i % 10 + 1) times
    val rows = (0 until 500).flatMap(i => Seq.fill(i % 10 + 1)(i.toLong))
    def run(parts: Int) = rows.toDF("id").repartition(parts)
      .selectExpr("cms_sketch(id, 4, 1024) AS sk")
      .selectExpr((0 until 500 by 37).map(i =>
        s"cms_query(sk, ${i}L, 4, 1024) AS e$i"): _*)
      .collect()(0)
    val a = run(1); val b = run(13)
    assert(a == b, "sketch must be partition-invariant")
    // estimates are upper bounds on the true counts; with 500 keys over
    // 4x1024 counters most probes are exact
    val probes = (0 until 500 by 37)
    val exactCnt = probes.map(i => i % 10 + 1)
    val ests = probes.indices.map(j => a.getLong(j))
    assert(probes.indices.forall(j => ests(j) >= exactCnt(j)),
      s"$ests vs $exactCnt")
    assert(probes.indices.count(j => ests(j) == exactCnt(j)) >= probes.size / 2)
  }

  test("bloom_sketch: no false negatives, scala-exact probes, partition/dup-invariant") {
    graft.sql.Geo.register(spark)
    import spark.implicits._
    val members = (0 until 400).map(i => (i * 7L + 3))
    def run(parts: Int, dup: Int) = members.flatMap(Seq.fill(dup)(_))
      .toDF("id").repartition(parts)
      .selectExpr("bloom_sketch(id, 4096, 5) AS bf")
      .selectExpr((0 until 4000 by 13).map(i =>
        s"bloom_contains(bf, ${i}L, 5) AS h$i"): _*)
      .collect()(0)
    val a = run(1, 1); val b = run(13, 1); val c = run(13, 3)
    assert(a == b && a == c,
      "OR-merge must be partition- and double-count-invariant")
    // scala reference: the same double-hashing probes (h1 + r*h2, h2 odd)
    def bits(i: Long): Seq[Int] = {
      val h1 = graft.sql.GeoOps.splitmix64(i)
      val h2 = graft.sql.GeoOps.splitmix64(h1) | 1L
      (0 until 5).map(r => ((h1 + r * h2) & 4095L).toInt)
    }
    val words = new Array[Long](64)
    for (m <- members; bit <- bits(m)) words(bit >>> 6) |= 1L << (bit & 63)
    def ref(i: Long): Boolean =
      bits(i).forall(bit => (words(bit >>> 6) & (1L << (bit & 63))) != 0)
    val probes = (0 until 4000 by 13)
    probes.indices.foreach(j =>
      assert(a.getBoolean(j) == ref(probes(j)), s"probe ${probes(j)}"))
    val memberSet = members.toSet
    assert(probes.filter(i => memberSet(i.toLong)).forall(i => ref(i)),
      "false negative")
    val fps = probes.count(i => !memberSet(i.toLong) && ref(i))
    assert(fps < probes.size / 10, s"fp rate implausible: $fps")
  }

  test("funnel: sequential-min recurrence, ties, out-of-order, partial depth") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val evs = Seq(
      // u1 completes all 3, with decoys out of order before
      (1L, ts(5), "click"), (1L, ts(10), "view"), (1L, ts(12), "click"),
      (1L, ts(20), "purchase"),
      // u2: click BEFORE view only -> depth 1 (view at 30, no later click)
      (2L, ts(10), "click"), (2L, ts(30), "view"),
      // u3: view and click SIMULTANEOUS -> strict > blocks the advance
      (3L, ts(10), "view"), (3L, ts(10), "click"),
      // u4: no funnel steps at all
      (4L, ts(1), "error"),
      // u5: picks the EARLIEST eligible at each depth
      (5L, ts(1), "view"), (5L, ts(2), "view"), (5L, ts(3), "click"),
      (5L, ts(2), "purchase"), (5L, ts(9), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = graft.operators.Sessions
      .funnel(evs, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Int, Option[Timestamp])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) == ((3, Some(ts(20)))))
    assert(got(2L) == ((1, Some(ts(30)))))
    assert(got(3L) == ((1, Some(ts(10)))), "simultaneous click must not count")
    assert(got(4L) == ((0, None)))
    assert(got(5L) == ((3, Some(ts(9)))),
      "purchase at ts(2) precedes click ts(3) and must not count")
    // partition invariance
    val got13 = graft.operators.Sessions
      .funnel(evs.repartition(7), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Int, Option[Timestamp])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got13 == got)
  }

  test("approxQuantiles: near-true quantiles, bit-identical under any partitioning") {
    import spark.implicits._
    // values 0..9999 uniformly: true quantile q is ~q*9999
    val df = (0 until 10000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val qs = Seq(0.1, 0.5, 0.9)
    val est = Sampling.approxQuantiles(df, "v", "id", qs, k = 1024)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    qs.foreach { q =>
      val truth = q * 9999.0
      assert(math.abs(est(q) - truth) < 9999.0 * 0.08,
        s"q=$q est=${est(q)} truth=$truth") // ~1/sqrt(1024) order bound
    }
    // the sample is a pure function of the ids — 1 vs 17 partitions give
    // bit-identical estimates (no reservoir/task-order dependence)
    val e1 = Sampling.approxQuantiles(df.repartition(1), "v", "id", qs, 1024)
      .collect().map(_.getDouble(1)).toSeq
    val e17 = Sampling.approxQuantiles(df.repartition(17), "v", "id", qs, 1024)
      .collect().map(_.getDouble(1)).toSeq
    assert(e1 == e17 && e1 == qs.map(est))
    // endpoints are exact order statistics of the sample
    val ends = Sampling.approxQuantiles(df, "v", "id", Seq(0.0, 1.0), 64)
      .collect().map(_.getDouble(1))
    assert(ends(0) <= ends(1))
  }

  test("perKeySample: deterministic, exactly k per key, map-side pruning") {
    val docs = (0 until 500).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "key")
    val a = Sampling.perKeySample(docs, "key", "id", k = 7)
    val rows = a.select("key", "id").as[(String, Long)].collect()
    assert(rows.length == 21 && rows.groupBy(_._1).forall(_._2.length == 7))
    // reproducible
    val b = Sampling.perKeySample(docs, "key", "id", k = 7)
      .select("key", "id").as[(String, Long)].collect()
    assert(rows.sorted.toSeq == b.sorted.toSeq)
    // rank filter prunes per-partition before the exchange
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-key sample should prune map-side:\n$plan")
  }
}
