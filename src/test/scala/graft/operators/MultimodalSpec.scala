package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ElideRedundantGeoCasts
import graft.sources.ImagesTable

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  test("imageMeta parses real PNG headers") {
    val png = ImagesTable.pngBytes(12345L)
    assert(Multimodal.imageMeta(png) == ((Some(8), Some(8), "png")))
    assert(Multimodal.imageMeta(Array[Byte](1, 2, 3)) == ((None, None, "unknown")))
    // minimal JPEG: SOI + SOF0 with h=2 w=3
    val jpeg = Array[Int](0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 8,
      0, 2, 0, 3, 1, 0, 0, 0).map(_.toByte)
    assert(Multimodal.imageMeta(jpeg) == ((Some(3), Some(2), "jpeg")))
  }

  test("withImageMeta over a DataFrame of real PNGs") {
    val df = ImagesTable.generate(spark, 20L, png = true)
    val out = Multimodal.withImageMeta(df, "bytes")
    val rows = out.select("decoded_w", "decoded_h", "detected_fmt").distinct().collect()
    assert(rows.length == 1)
    assert(rows(0).getInt(0) == 8 && rows(0).getInt(1) == 8 &&
      rows(0).getString(2) == "png")
  }

  test("withImageMeta stays inside whole-stage codegen (static_invoke)") {
    val df = ImagesTable.generate(spark, 20L, png = true)
    val out = Multimodal.withImageMeta(df, "bytes")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("imagemeta") ||
      plan.contains("static_invoke"),
      s"img_meta must bind as a StaticInvoke kernel:\n$plan")
    assert(!plan.contains("MapPartitions") && !plan.contains("SerializeFromObject"),
      s"img_meta must not sever codegen with an object boundary:\n$plan")
  }

  test("img_features: real decode, grid-pooled means match analytic values") {
    // two-band 8x8 PNG: top half (10,20,30), bottom half (200,100,50);
    // 4x4 grid -> cells j<8 pool only top pixels, j>=8 only bottom pixels
    val png = graft.sql.MediaOps.makePng(8, 8, 10, 20, 30, 200, 100, 50)
    val feats = graft.sql.MediaOps.imgFeatures(png, 16).toFloatArray()
    val top = ((10 * 299 + 20 * 587 + 30 * 114).toDouble / 255000.0).toFloat
    val bot = ((200 * 299 + 100 * 587 + 50 * 114).toDouble / 255000.0).toFloat
    assert(feats.length == 16)
    assert(feats.take(8).forall(_ == top), feats.mkString(","))
    assert(feats.drop(8).forall(_ == bot), feats.mkString(","))
    // JPEG decodes too (lossy — only sanity-bound the values)
    val jpgImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jpgImg, "jpg", bos)
    val jf = graft.sql.MediaOps.imgFeatures(bos.toByteArray, 16).toFloatArray()
    assert(jf.length == 16 && jf.forall(v => v >= 0f && v <= 1f))
    // undecodable bytes -> null
    assert(graft.sql.MediaOps.imgFeatures("nope".getBytes, 16) == null)
  }

  test("withImageFeatures: deterministic, right shape, codegen'd kernel") {
    val df = ImagesTable.generate(spark, 10L, png = true)
    val out = Multimodal.withImageFeatures(df, "bytes", 16)
    val a = out.select("image_id", "features")
      .as[(String, Seq[Float])].collect().toMap
    val b = Multimodal.withImageFeatures(df, "bytes", 16)
      .select("image_id", "features").as[(String, Seq[Float])].collect().toMap
    assert(a == b)
    assert(a.values.forall(_.length == 16))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("imgfeatures") ||
      plan.contains("static_invoke"),
      s"img_features must bind as a StaticInvoke kernel:\n$plan")
    assert(!plan.contains("MapPartitions") && !plan.contains("SerializeFromObject"),
      s"img_features must not sever codegen with an object boundary:\n$plan")
  }

  test("frame sampling stub: explode shape") {
    val df = ImagesTable.generate(spark, 5L)
    val out = Multimodal.sampleFramesStub(df, "bytes", frameCount = 10, everyN = 3)
    assert(out.count() == 5 * 4) // frames 0,3,6,9
    assert(out.groupBy("image_id").count().collect().forall(_.getLong(1) == 4))
  }

  test("cast-elision rule folds idempotent cast chains") {
    graft.sql.Geo.register(spark)
    val df = spark.sql(
      """SELECT st_casttype(st_casttype(st_geomfromwkt('POINT (1 2)'),
        |  'multipoint'), 'multipoint') AS g""".stripMargin)
    val before = df.queryExecution.analyzed
    val after = ElideRedundantGeoCasts(before)
    def countCasts(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      var n = 0
      plan.transformAllExpressions {
        case si: org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
            if si.functionName == "castType" => n += 1; si
      }
      n
    }
    assert(countCasts(before) == 2)
    assert(countCasts(after) == 1)
    // and the result is unchanged
    assert(df.collect()(0).getStruct(0).getInt(0) == 4) // MULTIPOINT
  }
}
