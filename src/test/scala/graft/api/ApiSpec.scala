package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.api.functions._
import graft.core.Wkt

object ApiSpec {
  case class Feature(id: Long, geom: GeomValue)
}

class ApiSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark

  test("column DSL end to end") {
    register(spark)
    import spark.implicits._
    val df = Seq("POINT (3 4)", "LINESTRING (0 0, 6 8)").toDF("wkt")
    val out = df.select(
      st_aswkt(st_casttype(st_geomfromwkt($"wkt"), lit2("multipoint",
        "multilinestring", $"wkt"))).as("w"))
    // helper below picks the right target per row
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("MULTIPOINT (3 4)", "MULTILINESTRING ((0 0, 6 8))"))

    val env = df.select(st_envelope(st_geomfromwkt($"wkt")).as("e"))
      .selectExpr("e.xmax").collect().map(_.getDouble(0)).toSeq
    assert(env == Seq(3.0, 6.0))
  }

  private def lit2(a: String, b: String, wkt: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions._
    when(wkt.startsWith("POINT"), lit(a)).otherwise(lit(b))
  }

  test("typed Dataset round trip through GeomValue case class") {
    register(spark)
    import spark.implicits._
    val g1 = Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val g2 = Wkt.parse("GEOMETRYCOLLECTION (POINT (1 2))")
    val ds = Seq((1L, GeomValue(g1)), (2L, GeomValue(g2))).toDS()
      .toDF("id", "geom")
    // the encoded struct is directly consumable by the SQL kernels
    val wkts = ds.select(st_aswkt($"geom").as("w")).collect().map(_.getString(0))
    assert(wkts.toSeq == Seq("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "GEOMETRYCOLLECTION (POINT (1 2))"))
    // and decodes back to the same geometry through the typed API
    val back = ds.as[ApiSpec.Feature].collect().sortBy(_.id)
    assert(back(0).geom.toGeom == g1 && back(1).geom.toGeom == g2)
  }

  test("image + tile-pixel column DSL wrappers bind to the kernels") {
    register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val png = graft.sql.MediaOps.makePng(8, 8, 10, 10, 10, 200, 200, 200)
    val df = Seq((png, 2.0, 45.0)).toDF("img", "lon", "lat")
    val row = df.select(
      img_mse($"img", img_resize($"img", lit(8), lit(8))).as("mse"),
      img_psnr($"img", $"img").as("psnr"),
      img_channel_sum($"img", lit(0)).as("sum_r"),
      img_nonzero($"img").as("lit_px"),
      st_tilepixel($"lon", $"lat", lit(4), lit(256)).as("pix"),
      st_worldpixelx($"lon", lit(4), lit(256)).as("wx"),
      st_worldpixely($"lat", lit(4), lit(256)).as("wy")).collect()(0)
    assert(row.getAs[Double]("mse") == 0.0)
    assert(row.getAs[Double]("psnr").isPosInfinity)
    assert(row.getAs[Long]("sum_r") == (10 * 32 + 200 * 32).toLong)
    assert(row.getAs[Long]("lit_px") == 64L)
    assert(row.getAs[Int]("pix") ==
      graft.core.Tiles.tilePixel(2.0, 45.0, 4, 256))
    assert(row.getAs[Long]("wx") ==
      graft.core.Tiles.worldPixelX(2.0, 4, 256))
    assert(row.getAs[Long]("wy") ==
      graft.core.Tiles.worldPixelY(45.0, 4, 256))
  }

  test("st_format precision and truncation options (kernel K4)") {
    register(spark)
    import spark.implicits._
    val df = Seq("LINESTRING (0.123456 1, 2 3, 4 5, 6 7)").toDF("wkt")
    val p3 = df.select(st_format(st_geomfromwkt($"wkt"),
      org.apache.spark.sql.functions.lit(3)).as("w")).collect()(0).getString(0)
    assert(p3 == "LINESTRING (0.123 1, 2 3, 4 5, 6 7)")
    val truncated = df.select(st_format(st_geomfromwkt($"wkt"),
      org.apache.spark.sql.functions.lit(16),
      org.apache.spark.sql.functions.lit(20L)).as("w")).collect()(0).getString(0)
    assert(truncated.length <= 20, s"'$truncated'")
    assert(truncated.startsWith("LINESTRING (0.123456"))
  }
}
