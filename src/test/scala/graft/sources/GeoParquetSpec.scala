package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.{Geo, GeoSchema}

class GeoParquetSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark

  test("GeoParquet write/read round trip with metadata") {
    Geo.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("geoparquet").toString
    val df = spark.sql(
      """SELECT id, st_point(CAST(id AS DOUBLE), CAST(id AS DOUBLE) + 1) AS geom
        |FROM range(100)""".stripMargin)
    GeoParquet.write(df, "geom", dir)

    // foreign readers see plain ISO WKB binary
    val raw = spark.read.parquet(dir)
    assert(raw.schema("geom").dataType == org.apache.spark.sql.types.BinaryType)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_geo_metadata.json")))

    val back = GeoParquet.read(spark, dir, "geom")
    assert(back.schema("geom").dataType == graft.sql.GeoStruct.dataType)
    val parsed = GeoSchema.parseField(back.schema(back.schema.fieldIndex("geom")))
    assert(parsed.geometryType == 1 && parsed.dims == 1)
    assert(parsed.crsType == GeoSchema.CrsType.Projjson)
    val xs = back.select(call_function("st_x", col("geom")).as("x"))
      .collect().map(_.getDouble(0)).sorted
    assert(xs.toSeq == (0 until 100).map(_.toDouble))
  }
}
