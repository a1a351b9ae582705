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

  test("wav_meta/audio_features: real RIFF decode, analytic windowed means") {
    import graft.sql.AvOps
    // constant-amplitude square: a=0 -> every sample (40000 mod 65536)-32768
    val wav = AvOps.makeWav(64, 8000, 2, 0, 40000)
    val m = AvOps.wavMeta(wav)
    assert(m.getInt(0) == 2 && m.getInt(1) == 8000 && m.getInt(2) == 16 &&
      m.getInt(3) == 64 && m.getUTF8String(4).toString == "wav")
    val feats = AvOps.audioFeatures(wav, 8).toFloatArray()
    assert(feats.length == 8 && feats.forall(_ == (7232.0 / 32768.0).toFloat),
      feats.mkString(","))
    // varying samples cross-checked against a direct reduction
    val wav2 = AvOps.makeWav(100, 16000, 1, 31, 7)
    val samples = (0 until 100).map(i => math.abs(((31L * i + 7) % 65536) - 32768))
    val expect = (0 until 8).map { w =>
      val in = (0 until 100).filter(i => math.min(7, i * 8 / 100) == w)
      (in.map(samples).sum.toDouble / (32768.0 * in.size)).toFloat
    }
    assert(AvOps.audioFeatures(wav2, 8).toFloatArray().toSeq == expect)
    // garbage and truncated payloads degrade, never throw
    assert(AvOps.wavMeta("not audio".getBytes).getUTF8String(4).toString == "unknown")
    assert(AvOps.wavMeta(null).getUTF8String(4).toString == "unknown")
    assert(AvOps.audioFeatures(wav.take(30), 8) == null)
    // malformed header: blockAlign inconsistent with channels*2 must clamp
    // the frame count to the payload, never read past the buffer
    val bad = AvOps.makeWav(64, 8000, 2, 0, 40000)
    bad(32) = 1; bad(33) = 0 // blockAlign = 1 -> meta claims 4x the frames
    assert(AvOps.wavMeta(bad).getInt(3) == 256)
    val bf = AvOps.audioFeatures(bad, 8)
    assert(bf != null && bf.numElements() == 8)
  }

  test("video_meta/frame_features: real Y4M decode, banded pooled means") {
    import graft.sql.AvOps
    val y4m = AvOps.makeY4m(4, 4, 3, 100)
    val m = AvOps.videoMeta(y4m)
    assert(m.getInt(0) == 4 && m.getInt(1) == 4 && m.getInt(2) == 30 &&
      m.getInt(3) == 1 && m.getInt(4) == 3 &&
      m.getUTF8String(5).toString == "y4m")
    // everyN=2 samples frames 0 and 2; top band (seed+7f), bottom (seed+13f)
    val fr = AvOps.frameFeatures(y4m, 2, 4)
    assert(fr.numElements() == 2)
    val f0 = fr.getStruct(0, 2)
    val f2 = fr.getStruct(1, 2)
    assert(f0.getInt(0) == 0 && f2.getInt(0) == 2)
    assert(f0.getArray(1).toFloatArray().toSeq ==
      Seq.fill(4)((100.0 / 255.0).toFloat))
    assert(f2.getArray(1).toFloatArray().toSeq ==
      Seq((114.0 / 255.0).toFloat, (114.0 / 255.0).toFloat,
        (126.0 / 255.0).toFloat, (126.0 / 255.0).toFloat))
    assert(AvOps.videoMeta("MPEG4".getBytes).getUTF8String(5).toString == "unknown")
    assert(AvOps.frameFeatures("MPEG4".getBytes, 2, 4) == null)
  }

  test("sampleFrames (Y4M): explode shape, codegen'd kernel") {
    graft.sql.Geo.register(spark)
    val df = spark.range(6).selectExpr("id",
      "make_y4m(4, 8, CAST(id % 3 + 2 AS INT), CAST(id AS INT)) AS bytes")
    val out = Multimodal.sampleFrames(df, "bytes", everyN = 2, dim = 4)
    // nf 2->1 frame sampled, 3->2, 4->2
    val perId = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert((0L until 6L).forall(id => perId(id) == (id % 3 + 2 + 1) / 2))
    assert(out.columns.contains("frame_idx") && out.columns.contains("features"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("framefeatures") ||
      plan.contains("static_invoke"),
      s"frame_features must bind as a StaticInvoke kernel:\n$plan")
    assert(!plan.contains("MapPartitions"),
      s"real frame sampling must not use an object boundary:\n$plan")
  }

  test("AVI container: PNG frames decode bit-exact, MJPEG within tolerance") {
    graft.sql.Geo.register(spark)
    // PNG-in-AVI ('MPNG'): lossless — features are the analytic band/255
    val png = spark.sql(
      """SELECT video_meta(make_avi(8, 8, 4, 50, 0)) AS m,
        |  frame_features(make_avi(8, 8, 4, 50, 0), 2, 4) AS fr""".stripMargin)
      .collect()(0)
    val m = png.getStruct(0)
    assert((m.getInt(0), m.getInt(1), m.getInt(2), m.getInt(3), m.getInt(4),
      m.getString(5)) == (8, 8, 1000000, 40000, 4, "avi"))
    val frames = png.getSeq[org.apache.spark.sql.Row](1)
    assert(frames.map(_.getInt(0)) == Seq(0, 2))
    for (fr <- frames; f = fr.getInt(0)) {
      val feats = fr.getSeq[Float](1)
      val top = ((50 + 7 * f) % 256).toDouble / 255.0
      val bot = ((50 + 13 * f) % 256).toDouble / 255.0
      assert(feats == Seq(top.toFloat, top.toFloat, bot.toFloat, bot.toFloat))
    }
    // Motion-JPEG ('MJPG'): REAL lossy codec through javax.imageio — the
    // pooled means land within JPEG quantization error of the bands
    val jpg = spark.sql(
      """SELECT video_meta(make_avi(16, 16, 3, 90, 1)) AS m,
        |  frame_features(make_avi(16, 16, 3, 90, 1), 1, 4) AS fr""".stripMargin)
      .collect()(0)
    assert(jpg.getStruct(0).getString(5) == "avi")
    val jframes = jpg.getSeq[org.apache.spark.sql.Row](1)
    assert(jframes.map(_.getInt(0)) == Seq(0, 1, 2))
    for (fr <- jframes; f = fr.getInt(0)) {
      val feats = fr.getSeq[Float](1)
      val top = ((90 + 7 * f) % 256).toDouble / 255.0
      val bot = ((90 + 13 * f) % 256).toDouble / 255.0
      assert(math.abs(feats(0) - top) < 0.03 && math.abs(feats(1) - top) < 0.03,
        s"frame $f top: $feats vs $top")
      assert(math.abs(feats(2) - bot) < 0.03 && math.abs(feats(3) - bot) < 0.03,
        s"frame $f bot: $feats vs $bot")
    }
    // corrupt payload -> null features, "unknown" meta
    val bad = spark.sql(
      """SELECT video_meta(CAST('RIFFjunk' AS BINARY)) AS m,
        |  frame_features(CAST('RIFFjunk' AS BINARY), 1, 4) AS fr""".stripMargin)
      .collect()(0)
    assert(bad.getStruct(0).getString(5) == "unknown" && bad.isNullAt(1))
  }

  test("img_phash: banded structure survives JPEG recompression") {
    graft.sql.Geo.register(spark)
    // the near-dup property that makes phash dedup work: the SAME image
    // as lossless PNG vs lossy JPEG must land within a few bits
    val png = graft.sql.MediaOps.makePng(64, 64, 200, 200, 200, 30, 30, 30)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val pPng = graft.sql.MediaOps.imgPhash(png)
    val pJpg = graft.sql.MediaOps.imgPhash(bos.toByteArray)
    assert(pPng != null && pJpg != null)
    // bright top half -> top 32 bits exactly (the analytic q82 shape)
    assert(pPng.longValue() == 0xFFFFFFFF00000000L)
    val hamming = java.lang.Long.bitCount(pPng.longValue() ^ pJpg.longValue())
    assert(hamming <= 3, s"png/jpeg phash hamming $hamming")
    assert(graft.sql.MediaOps.imgPhash("not an image".getBytes) == null)
    assert(graft.sql.MediaOps.imgPhash(null) == null)
  }

  test("img_mse/img_psnr: decoded-pixel parity invariant (north rule)") {
    import graft.sql.MediaOps
    val png = MediaOps.makePng(24, 16, 200, 150, 100, 30, 60, 90)
    // identical images: MSE 0, PSNR +inf
    assert(MediaOps.imgMse(png, png).doubleValue == 0.0)
    assert(MediaOps.imgPsnr(png, png).doubleValue.isPosInfinity)
    // perturb by exactly delta per channel -> MSE = delta^2 in closed form
    for (delta <- Seq(1, 2, 3, 5, 17)) {
      val pert = MediaOps.imgPerturb(png, delta)
      val mse = MediaOps.imgMse(png, pert).doubleValue
      assert(mse == delta.toDouble * delta,
        s"delta=$delta expected mse=${delta * delta}, got $mse")
      val psnr = MediaOps.imgPsnr(png, pert).doubleValue
      val expect = 10.0 * math.log10(65025.0 / (delta * delta))
      assert(math.abs(psnr - expect) < 1e-12)
    }
    // the 40 dB gate: delta=2 passes (42.1 dB), delta=3 fails (38.6 dB)
    assert(MediaOps.imgPsnr(png, MediaOps.imgPerturb(png, 2)) >= 40.0)
    assert(MediaOps.imgPsnr(png, MediaOps.imgPerturb(png, 3)) < 40.0)
    // channel values straddling the 128 rail never clamp
    val edge = MediaOps.makePng(8, 8, 127, 128, 0, 255, 1, 254)
    assert(MediaOps.imgMse(edge, MediaOps.imgPerturb(edge, 127)).doubleValue
      == 127.0 * 127.0)
    // mismatched dimensions / undecodable input -> null, not a crash
    val other = MediaOps.makePng(8, 8, 1, 2, 3, 4, 5, 6)
    assert(MediaOps.imgMse(png, other) == null)
    assert(MediaOps.imgMse(png, "junk".getBytes) == null)
    assert(MediaOps.imgPsnr(null, png) == null)
    assert(MediaOps.imgPerturb("junk".getBytes, 1) == null)
    // real JPEG recompression vs the 40 dB gate, discriminating actual
    // encoder behavior: smooth content at max quality clears it (uniform
    // blocks are DC-only, near-lossless); a hard COLOR band edge fails it
    // at ANY quality because 4:2:0 chroma subsampling averages chroma
    // across the edge (~32 dB even at q=1.0) — the gate catches real
    // lossy damage, not just quantization strength
    def encodeJpeg(src: java.awt.image.BufferedImage,
                   quality: Float): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      writer.write(null, new javax.imageio.IIOImage(src, null, null), params)
      writer.dispose()
      bos.toByteArray
    }
    val flat = MediaOps.makePng(24, 16, 120, 130, 140, 120, 130, 140)
    val flatImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(flat))
    val psnrFlat = MediaOps.imgPsnr(flat, encodeJpeg(flatImg, 1.0f)).doubleValue
    assert(psnrFlat >= 40.0, s"uniform q=1.0 JPEG PSNR $psnrFlat")
    val bandImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val psnrBand = MediaOps.imgPsnr(png, encodeJpeg(bandImg, 1.0f)).doubleValue
    assert(psnrBand < 40.0, s"color-band q=1.0 JPEG PSNR $psnrBand")
  }

  test("img_psnr binds as a codegen'd kernel in SQL") {
    graft.sql.Geo.register(spark)
    val row = spark.sql(
      """SELECT img_mse(p, img_perturb(p, 4)) AS mse,
        |  img_psnr(p, img_perturb(p, 4)) AS psnr
        |FROM (SELECT make_png(16, 16, 10, 20, 30, 210, 220, 230) AS p)"""
        .stripMargin)
    // over literal input the optimizer constant-folds the whole chain
    // (env fact 10) — assert kernel binding on the ANALYZED plan, where
    // the StaticInvoke nodes are still visible
    val analyzed = row.queryExecution.analyzed.toString
    assert(analyzed.contains("imgMse") && analyzed.contains("imgPsnr") &&
      analyzed.contains("imgPerturb"),
      s"img_* must bind as StaticInvoke kernels:\n$analyzed")
    val r = row.collect()(0)
    assert(r.getDouble(0) == 16.0)
    assert(math.abs(r.getDouble(1) - 10.0 * math.log10(65025.0 / 16.0)) < 1e-12)
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
