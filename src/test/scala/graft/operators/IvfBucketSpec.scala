package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketed
import graft.sql.GeoOps

class IvfBucketSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  test("IVF ANN: high recall vs exact brute force") {
    val vecs = (0 until 400).map { i =>
      (i.toLong, (0 until 16).map(j =>
        ((GeoOps.splitmix64(i * 16L + j) % 1000L) / 500.0 - 1.0).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = Ann.bruteForceTopK(df, queries, "embedding", "vec_id",
        "qid", "qvec", 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Ann.ivfTopK(df, queries, "embedding", "vec_id", "qid", "qvec",
        k = 10, nlist = 8, nprobe = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"IVF mean recall $meanRecall (nprobe=half of nlist)")
  }

  test("IVF assignment is map-side: no crossJoin, single rerank window") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 8).map(j =>
        ((GeoOps.splitmix64(i * 8L + j) % 1000L) / 500.0 - 1.0).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Ann.ivfTopK(df, queries, "embedding", "vec_id", "qid", "qvec",
      k = 5, nlist = 8, nprobe = 4)
    val plan = out.queryExecution.executedPlan.toString
    // centroid assignment must be a codegen'd projection against the
    // literal codebook — no corpus*nlist materialization, no per-row window
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"IVF assignment must not cross-join the corpus:\n$plan")
    assert(plan.linesIterator.count(l => l.contains("Window [")) <= 1,
      s"only the final rerank may use a window:\n$plan")
    // the executed plan may constant-fold the kernel into a LocalTableScan
    // for local-relation inputs — assert it on the analyzed plan instead
    val analyzed = out.queryExecution.analyzed.toString
    assert(analyzed.contains("argmaxCentroid"),
      s"assignment should call the argmax kernel:\n$analyzed")
  }

  test("brute-force top-k gets partial per-partition pruning (WindowGroupLimit)") {
    // the rank<=k filter over the row_number window must push a PARTIAL
    // WindowGroupLimit below the exchange: each reducer then receives at
    // most k rows per (query, partition), not the whole corpus per query —
    // the property that keeps exact top-k viable at corpus scale
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(j =>
        ((GeoOps.splitmix64(i * 8L + j) % 1000L) / 500.0 - 1.0).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(4)
    val queries = vecs.take(3).map { case (id, v) => (id, v) }
      .toDF("qid", "qvec")
    val plan = Ann.bruteForceTopK(df, queries, "embedding", "vec_id",
      "qid", "qvec", k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected partial top-k pushdown:\n$plan")
    assert(plan.contains("Partial"), s"expected a partial (map-side) limit:\n$plan")
  }

  test("bucketed co-located join plans without exchanges") {
    // default warehouse dir (spark-warehouse/ under cwd, gitignored)
    val a = (0 until 1000).map(i => (i.toLong % 97, i.toLong)).toDF("key", "va")
    val b = (0 until 500).map(i => (i.toLong % 97, s"s$i")).toDF("key", "vb")
    Bucketed.writeBucketed(a, "bucketed_a", "key", 8)
    Bucketed.writeBucketed(b, "bucketed_b", "key", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.cologicalJoin(spark, "bucketed_a", "bucketed_b", "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      val ca = (0 until 1000).groupBy(_ % 97).view.mapValues(_.size)
      val cb = (0 until 500).groupBy(_ % 97).view.mapValues(_.size)
      val expected = ca.keys.map(k => ca(k).toLong * cb.getOrElse(k, 0)).sum
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("SQ8 ANN: quantization round-trip and high recall vs brute force") {
    // kernel-level: codes/range reproduce the fixed arithmetic
    val v = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(-1.0f, 0.0f, 0.5f, 1.0f))
    val sq = graft.sql.VecOps.sq8(v)
    assert(sq.getFloat(1) == -1.0f && sq.getFloat(2) == 1.0f)
    assert(sq.getBinary(0).toSeq == Seq(0, 128, 191, 255).map(_.toByte))
    // dequantized self-cosine is ~1 (quantization noise only)
    val selfCos = graft.sql.VecOps.sq8Cosine(sq.getBinary(0),
      sq.getFloat(1), sq.getFloat(2), v)
    assert(selfCos > 0.999, s"self-cosine $selfCos")
    // operator-level: rerank recovers the exact top-k order
    val vecs = (0 until 400).map { i =>
      (i.toLong, (0 until 16).map(j =>
        ((GeoOps.splitmix64(i * 16L + j) % 1000L) / 500.0 - 1.0).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = Ann.bruteForceTopK(df, queries, "embedding", "vec_id",
        "qid", "qvec", 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val sq8 = Ann.sq8TopK(df, queries, "embedding", "vec_id", "qid", "qvec",
        k = 10, rerank = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.map { q =>
      sq8.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.9, s"SQ8 mean recall $meanRecall")
  }

  test("PQ ANN: recall vs brute force; partition-invariant; pruned windows") {
    val vecs = (0 until 400).map { i =>
      (i.toLong, (0 until 16).map(j =>
        ((GeoOps.splitmix64(i * 16L + j) % 1000L) / 500.0 - 1.0).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = Ann.bruteForceTopK(df, queries, "embedding", "vec_id",
        "qid", "qvec", 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def run(parts: Int) = Ann.pqTopK(df.repartition(parts), queries,
        "embedding", "vec_id", "qid", "qvec", k = 10, m = 4, kSub = 8,
        iters = 2, rerank = 6)
      .select("qid", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val pq = run(5)
    val bySet = pq.groupBy(_._1).view
      .mapValues(_.map(_._3).toSet).toMap
    val recalls = exact.keys.map { q =>
      bySet.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble /
        exact(q).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.6, s"PQ mean recall $meanRecall")
    // schedule determinism: fixed-point training + ordered ADC sums make
    // the whole result (codes, candidates, ranks) partitioning-invariant
    assert(run(1) === pq)
    // the ADC candidate window and the rerank window both prune map-side
    val plan = Ann.pqTopK(df.repartition(4), queries, "embedding", "vec_id",
        "qid", "qvec", k = 5, m = 2, kSub = 4, iters = 1, rerank = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected partial top-k pushdown in the PQ windows:\n$plan")
  }

  test("mutualKnnClusters: recovers planted blobs, singletons label themselves") {
    // 3 well-separated blobs of 6 jittered vectors + 1 isolated vector
    def vec(cx: Float, cy: Float, j: Int): Array[Float] =
      Array(cx + j * 0.01f, cy - j * 0.01f, 1.0f, 0.5f)
    val rows =
      (0 until 6).map(j => (j.toLong, vec(10f, 0f, j))) ++
      (0 until 6).map(j => (100L + j, vec(0f, 10f, j))) ++
      (0 until 6).map(j => (200L + j, vec(-10f, -10f, j))) :+
      (999L, Array(5f, 5f, -9f, 3f))
    val df = rows.toDF("vec_id", "embedding")
    val got = graft.operators.Ann
      .mutualKnnClusters(df, "embedding", "vec_id", k = 3)
      .as[(Long, Long)].collect().toMap
    assert((0 until 6).forall(j => got(j.toLong) == 0L))
    assert((0 until 6).forall(j => got(100L + j) == 100L))
    assert((0 until 6).forall(j => got(200L + j) == 200L))
    assert(got(999L) == 999L, "isolated vector must be a singleton")
    assert(got.size == rows.size)
  }

  test("k-means: recovers planted blobs; bit-identical under any partitioning") {
    // three well-separated blobs in 8-d: blob centers at 0, 10, 20 per dim
    // with small deterministic jitter — Lloyd's must put each blob in its
    // own cluster and place centroids near the planted centers
    val vecs = (0 until 300).map { i =>
      val blob = i % 3
      (i.toLong, (0 until 8).map(j =>
        (blob * 10.0 + (GeoOps.splitmix64(i * 8L + j) % 1000L) / 1000.0)
          .toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (cb, summary) = Ann.trainKmeans(df, "embedding", "vec_id",
      k = 3, iters = 4)
    val rows = summary.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // every cluster holds exactly one blob (100 members each)
    assert(rows.map(_._3).toSet == Set(100L))
    // each planted center is matched by some centroid within the jitter
    val centroids = (0 until 3).map(c => cb.slice(c * 8, c * 8 + 8))
    (0 until 3).foreach { blob =>
      val target = blob * 10.0 // signed splitmix jitter, mean ~ 0
      assert(centroids.exists(cen =>
        cen.forall(v => math.abs(v - target) < 0.3)),
        s"no centroid near blob $blob: ${centroids.map(_.toSeq)}")
    }
    // the trained model is partition-schedule-invariant BIT-FOR-BIT: the
    // fixed-point integer sums commute, so 1-partition and 13-partition
    // training produce the identical float codebook
    val (cb1, _) = Ann.trainKmeans(df.repartition(1), "embedding", "vec_id",
      k = 3, iters = 4)
    val (cb13, _) = Ann.trainKmeans(df.repartition(13), "embedding", "vec_id",
      k = 3, iters = 4)
    assert(cb1.toSeq == cb.toSeq && cb13.toSeq == cb.toSeq)
    // null vectors carry no signal and must not crash the update collect
    val withNulls = df.unionByName(
      spark.range(3).selectExpr("id + 1000 AS vec_id",
        "CAST(NULL AS ARRAY<FLOAT>) AS embedding"))
    val (cbN, _) = Ann.trainKmeans(withNulls, "embedding", "vec_id",
      k = 3, iters = 4)
    assert(cbN.toSeq == cb.toSeq) // identical model — nulls dropped
  }

  test("k-means assignment is map-side: no shuffle before the partial aggregate") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, (0 until 4).map(j =>
        ((GeoOps.splitmix64(i * 4L + j) % 1000L) / 500.0 - 1.0).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    graft.sql.Geo.register(spark)
    val cb = Array.fill(8)(0.1f)
    val assigned = df
      .withColumn("__c", call_function("vec_argmin_l2", $"embedding", lit(cb)))
      .groupBy($"__c")
      .agg(call_function("vec_fixedsum_agg",
        call_function("vec_fixed", $"embedding", lit(20))).as("fs"))
    val plan = assigned.queryExecution.executedPlan.toString
    // exactly one exchange, carrying k aggregate BUFFERS (the array-sum
    // aggregate partials map-side; no rows×dim explode anywhere)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Generate"), plan) // no explode in the plan
    assert(plan.contains("vec_fixedsum_agg"), plan)
  }

  test("vec_project: JL distance preservation + determinism") {
    import graft.sql.VecOps
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val rnd = new scala.util.Random(5)
    def vec(d: Int) = Array.fill(d)(rnd.nextFloat() * 2 - 1)
    def arr(a: Array[Float]) = UnsafeArrayData.fromPrimitiveArray(a)
    def l2(a: Array[Float], b: Array[Float]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val vecs = Seq.fill(40)(vec(64))
    def proj(v: Array[Float], k: Int) = {
      val p = VecOps.project(arr(v), k, 11L)
      (0 until k).map(p.getFloat).toArray
    }
    // pairwise distance ratios concentrate near 1 at k=32 (JL bound)
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
      d = l2(vecs(i), vecs(j)) if d > 1e-6
    } yield l2(proj(vecs(i), 32), proj(vecs(j), 32)) / d
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.1, s"mean distortion $mean")
    assert(ratios.count(r => r > 0.5 && r < 1.5).toDouble / ratios.size > 0.95)
    // deterministic: same input + seed -> bit-identical floats
    val a = proj(vecs.head, 16); val b = proj(vecs.head, 16)
    assert(a.toSeq == b.toSeq)
  }
}
