package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoJsonSeqSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark

  test("GeoJSONSeq write/read round trip, foreign-tool line shape") {
    graft.sql.Geo.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("geojsonseq").toString
    val df = spark.sql(
      """SELECT id, concat('n', id) AS name,
        |  st_point(CAST(id AS DOUBLE) / 4, CAST(id AS DOUBLE) - 50) AS geom
        |FROM range(100)""".stripMargin)
    GeoJsonSeq.write(df, "geom", dir)
    // every line is a self-contained Feature any tool can parse
    val lines = spark.read.textFile(dir).collect()
    assert(lines.length == 100)
    assert(lines.forall(l => l.startsWith("{\"type\":\"Feature\",\"geometry\":")
      && l.contains("\"properties\":{")))
    val back = GeoJsonSeq.read(spark, dir)
    assert(back.schema("geom").dataType == graft.sql.GeoStruct.dataType)
    val got = back.select(
        get_json_object(col("properties"), "$.id").cast("long").as("id"),
        get_json_object(col("properties"), "$.name").as("name"),
        call_function("st_x", col("geom")).as("x"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == (0L until 100L).map(i => (i, s"n$i", i / 4.0)).toSet)
  }

  test("null geometries round-trip as \"geometry\": null (no row loss)") {
    graft.sql.Geo.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("geojsonseq_null").toString
    val df = spark.sql(
      """SELECT id, CASE WHEN id % 3 = 0 THEN NULL
        |  ELSE st_point(CAST(id AS DOUBLE), 0.0) END AS geom
        |FROM range(9)""".stripMargin)
    GeoJsonSeq.write(df, "geom", dir)
    val back = GeoJsonSeq.read(spark, dir)
    assert(back.count() == 9) // nothing silently dropped
    assert(back.filter(col("geom").isNull).count() == 3)
    assert(spark.read.textFile(dir).collect()
      .count(_.contains("\"geometry\":null")) == 3)
  }

  test("strict=false skips dirty lines instead of failing the scan") {
    graft.sql.Geo.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("geojsonseq_dirty")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"k":1}}
        |this line is not json
        |{"type":"Point","coordinates":[3,4]}
        |{"type":"Feature","geometry":null,"properties":{"k":2}}
        |""".stripMargin)
    val lenient = GeoJsonSeq.read(spark, dir.toString, strict = false)
    // 3 parseable features (one with null geometry), 1 dropped
    assert(lenient.count() == 3)
    assert(lenient.filter(col("geom").isNotNull).count() == 2)
    intercept[Exception] {
      // collect, not count — count() would prune the parse column away
      GeoJsonSeq.read(spark, dir.toString, strict = true).collect()
    }
  }

  test("FeatureCollection file: write one document, read it back losslessly") {
    graft.sql.Geo.register(spark)
    val df = spark.sql(
      """SELECT id, concat('name', id) AS name,
        |  st_geomfromwkt(concat('POINT (', CAST(CAST(id AS DOUBLE) / 7.0 AS STRING),
        |    ' ', CAST(CAST(id AS DOUBLE) / 3.0 AS STRING), ')')) AS geom
        |FROM range(50)""".stripMargin)
    val file = java.nio.file.Files.createTempDirectory("geojson_fc")
      .resolve("all.geojson").toString
    GeoJsonFc.write(df, "geom", file)
    // one valid JSON document, FeatureCollection-typed
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(file))
    assert(text.startsWith("{\"type\":\"FeatureCollection\",\"features\":["))
    val back = GeoJsonFc.read(spark, file)
    assert(back.count() == 50)
    val got = back.select(
        get_json_object(col("properties"), "$.id").cast("long").as("id"),
        call_function("st_x", col("geom")).as("x"),
        call_function("st_y", col("geom")).as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == (0 until 50).map(i =>
      (i.toLong, i / 7.0, i / 3.0)))
    // the size guard refuses lake-scale misuse
    intercept[IllegalArgumentException](
      GeoJsonFc.write(df, "geom", file, limit = 10))
  }

  test("DSv2 format(\"geojsonseq\"): splits, pruning, strict modes") {
    graft.sql.Geo.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("geojsonseq_v2").toString
    val df = spark.sql(
      """SELECT id, concat('n', id) AS name,
        |  st_point(CAST(id AS DOUBLE) / 4, CAST(id AS DOUBLE) - 50) AS geom
        |FROM range(200)""".stripMargin)
    GeoJsonSeq.write(df, "geom", dir)
    // same rows as the object API
    val v2 = spark.read.format("geojsonseq").load(dir)
    assert(v2.schema == GeoJsonSeqScan.schema)
    val got = v2.select(
        get_json_object(col("properties"), "$.id").cast("long").as("id"),
        call_function("st_x", col("geom")).as("x"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == (0L until 200L).map(i => (i, i / 4.0)).toSet)
    // byte-offset splitting: a tiny maxSplitBytes forces many partitions
    // over the same files; LineRecordReader's straddle protocol must not
    // duplicate or drop boundary lines
    val split = spark.read.format("geojsonseq")
      .option("maxSplitBytes", 256).load(dir)
    assert(split.rdd.getNumPartitions > 4)
    assert(split.select(get_json_object(col("properties"), "$.id")
        .cast("long")).collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 200L))
    // column pruning reaches the scan (visible in the v2 description) and
    // a properties-only projection must not decode geometry structs
    val pruned = v2.select("properties")
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("ReadSchema: struct<properties:string>"), desc)
    // strict gates: dirty line fails strict (default), skips lenient
    val dirty = java.nio.file.Files.createTempDirectory("geojsonseq_v2d")
    java.nio.file.Files.writeString(dirty.resolve("part-0.json"),
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"k":1}}
        |nope
        |""".stripMargin)
    intercept[Exception](
      spark.read.format("geojsonseq").load(dirty.toString).collect())
    assert(spark.read.format("geojsonseq").option("strict", false)
      .load(dirty.toString).count() == 1)
    // nested part directories contribute their files (recursive listing —
    // a dir-of-dirs layout must not silently lose subtrees), while hidden
    // segments (_temporary and friends) hide their whole subtree
    val nested = java.nio.file.Files.createTempDirectory("geojsonseq_v2n")
    java.nio.file.Files.createDirectories(nested.resolve("sub/a"))
    java.nio.file.Files.createDirectories(nested.resolve("_temporary"))
    val feat =
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"k":%d}}
        |""".stripMargin
    java.nio.file.Files.writeString(nested.resolve("top.json"), feat.format(1))
    java.nio.file.Files.writeString(nested.resolve("sub/a/deep.json"),
      feat.format(2))
    java.nio.file.Files.writeString(nested.resolve("_temporary/part.json"),
      feat.format(3))
    assert(spark.read.format("geojsonseq").load(nested.toString).count() == 2)
  }
}
