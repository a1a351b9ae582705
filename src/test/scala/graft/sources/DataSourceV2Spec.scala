package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Geo

/** `spark.read.format("geoparquet"/"arrowipc")` — the SQL-user entry
  * (reference: `open_dataset(path)`). Asserts both the round-trip values
  * and the SCAN-QUALITY plan properties: pushdown + pruning for
  * geoparquet (inherited parquet machinery), decode-level pruning +
  * batch splitting for arrowipc. */
class DataSourceV2Spec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"dsv2_$tag").toFile
    d.delete(); d.getAbsolutePath
  }

  test("geoparquet format: values match the object API; pushdown + pruning plan") {
    Geo.register(spark)
    val df = spark.sql(
      """SELECT id, CAST(id * 2 AS DOUBLE) AS score,
        |  st_geomfromwkt(concat('POINT (', CAST(CAST(id AS DOUBLE) / 10.0 AS STRING),
        |    ' ', CAST(CAST(id AS DOUBLE) / 20.0 AS STRING), ')')) AS geom
        |FROM range(1000)""".stripMargin)
    val dir = tmp("geoparquet")
    GeoParquet.write(df, "geom", dir)

    val v2 = spark.read.format("geoparquet").load(dir)
    // geometry surfaces as standard WKB binary — SQL users decode in place
    assert(v2.schema("geom").dataType == org.apache.spark.sql.types.BinaryType)
    val decoded = v2.withColumn("geom", call_function("st_geomfromwkb", col("geom")))
    val viaObject = GeoParquet.read(spark, dir, "geom")
    assert(decoded.select(col("id"), call_function("st_aswkt", col("geom")))
      .collect().map(_.toString).sorted.toSeq ==
      viaObject.select(col("id"), call_function("st_aswkt", col("geom")))
        .collect().map(_.toString).sorted.toSeq)

    // scan quality: the filter pushes into the parquet reader and the
    // projection prunes the scan schema (no geometry bytes read)
    val pruned = v2.filter(col("id") > 500L).select("id", "score")
    val formatted = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // r06: no IsNotNull(id) — it came from InferFiltersFromConstraints,
    // excluded by Geo.register (its inferred filters duplicate kernel
    // work in cover-join plans); the user predicate still pushes down.
    assert(formatted.contains("PushedFilters: [GreaterThan(id,500)]"),
      formatted)
    assert(formatted.contains("ReadSchema: struct<id:bigint,score:double>"),
      formatted)
    assert(pruned.count() == 499)
    // v2 path, not a v1 fallback relation
    assert(formatted.contains("BatchScan"), formatted)

    // WRITES refuse loudly: a bare format("geoparquet") write would emit
    // plain parquet with no `geo` footer — a file claiming to be
    // GeoParquet that isn't. The error points at the object API.
    val err = intercept[Exception] {
      df.drop("geom").write.format("geoparquet").mode("overwrite")
        .save(tmp("geoparquet_w"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq() else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("GeoParquet.write")), err.toString)
  }

  test("arrowipc format: round-trip, decode-level pruning, batch splitting, _SUCCESS gate") {
    val df = spark.range(500).select(col("id"),
      (col("id") * 3).cast("double").as("v"),
      concat(lit("s"), col("id")).as("s")).repartition(2)
    val dir = tmp("arrowipc")
    ArrowIpc.write(df, dir, batchRows = 50) // ~5 batches per part

    val v2 = spark.read.format("arrowipc").load(dir)
    assert(v2.schema.fieldNames.toSeq == Seq("id", "v", "s"))
    assert(v2.collect().map(_.getLong(0)).sorted.toSeq == (0L until 500L))

    // column pruning reaches the scan (visible in the v2 scan description)
    val prunedPlan = v2.select("v").queryExecution.executedPlan.toString
    assert(prunedPlan.contains("ReadSchema: struct<v:double>"), prunedPlan)
    assert(!prunedPlan.contains("ReadSchema: struct<id"), prunedPlan)
    assert(v2.select(sum("v")).collect()(0).getDouble(0) ==
      (0L until 500L).map(_ * 3.0).sum)

    // record-batch splitting multiplies input partitions
    val split = spark.read.format("arrowipc")
      .option("maxBatchesPerTask", 2).load(dir)
    assert(split.rdd.getNumPartitions > v2.rdd.getNumPartitions)
    assert(split.count() == 500)

    // _SUCCESS gating matches ArrowIpc.read semantics
    assert(new java.io.File(dir, "_SUCCESS").delete())
    intercept[Exception](spark.read.format("arrowipc").load(dir).count())
    assert(spark.read.format("arrowipc").option("requireSuccess", "false")
      .load(dir).count() == 500)
  }

  test("arrowipc format reads geoarrow-tagged files (raw nested layout)") {
    Geo.register(spark)
    val df = spark.sql(
      "SELECT id, st_geomfromwkt('POINT (1.5 2.5)') AS geom FROM range(20)")
    val dir = tmp("arrowgeo")
    ArrowIpc.writeGeo(df, "geom", dir, "point", "xy", "separate")
    val v2 = spark.read.format("arrowipc").load(dir)
    // raw native layout: struct<x,y> — same as ArrowIpc.read; decode via
    // st_fromnative or use ArrowIpc.readGeo for the tagged object path
    val row = v2.select(col("geom")("x"), col("geom")("y")).collect().head
    assert(row.getDouble(0) == 1.5 && row.getDouble(1) == 2.5)
  }
}
