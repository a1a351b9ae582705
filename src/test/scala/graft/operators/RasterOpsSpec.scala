package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Raster, Tiles}
import graft.sql.{GeoOps, GeoStruct, MediaOps}

/** DataFrame-level tests for the vector→raster / raster→vector bridge
  * operators (polygon rendering, zonal statistics) and the exact image
  * augmentation + lossy-JPEG kernels. */
class RasterOpsSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  private def decode(png: Array[Byte]) =
    ImageIO.read(new ByteArrayInputStream(png))

  test("renderPolygonTiles: weights sum per pixel, overlaps add, clamp bites") {
    graft.sql.Geo.register(spark)
    // two overlapping boxes (weights 3 and 250) and one separate (weight 2):
    // overlap pixels clamp at 255, solo pixels keep their weight
    val polys = Seq(
      ("POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))", 3L),
      ("POLYGON ((20 15, 40 15, 40 25, 20 25, 20 15))", 100L),
      ("POLYGON ((-60 -30, -50 -30, -50 -20, -60 -20, -60 -30))", 300L))
      .toDF("wkt", "w")
      .selectExpr("st_geomfromwkt(wkt) AS g", "w")
    val out = TileRender.renderPolygonTiles(polys, "g", zoom = 2, size = 64,
      weightCol = Some("w"))
      .collect().map(r => (r.getAs[Int]("x"), r.getAs[Int]("y")) ->
        r.getAs[Array[Byte]]("png")).toMap

    // ground truth straight from the kernel + the documented clamp
    def geomOf(wkt: String) = GeoStruct.decode(GeoOps.fromWkt(
      org.apache.spark.unsafe.types.UTF8String.fromString(wkt)))
    val gs = Seq(
      (geomOf("POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))"), 3L),
      (geomOf("POLYGON ((20 15, 40 15, 40 25, 20 25, 20 15))"), 100L),
      (geomOf("POLYGON ((-60 -30, -50 -30, -50 -20, -60 -20, -60 -30))"), 300L))
    val wantPix: Map[(Long, Int), Long] = gs.flatMap { case (g, w) =>
      Tiles.coverGeom(g, 2).toSeq.flatMap(id =>
        Raster.rasterize(g, id, 64).toSeq.map(p => ((id, p), w)))
    }.groupBy(_._1).map { case (k, vs) =>
      k -> math.min(255L, vs.map(_._2).sum)
    }
    val wantTiles = wantPix.keySet.map(_._1)
    assert(out.keySet == wantTiles.map(id => (Tiles.x(id), Tiles.y(id))))
    var sawClamp = false; var sawSum = false
    for (((id, p), w) <- wantPix) {
      val img = decode(out((Tiles.x(id), Tiles.y(id))))
      assert((img.getRGB(p % 64, p / 64) & 0xff) == w.toInt,
        s"pixel $p of tile ${Tiles.x(id)}/${Tiles.y(id)}")
      if (w == 255L) sawClamp = true
      if (w == 103L) sawSum = true
    }
    assert(sawClamp, "fixture must exercise the 255 clamp (solo weight 300)")
    assert(sawSum, "fixture must exercise overlap summing (3+100 = 103)")
  }

  test("zonalStats matches a brute-force recomputation from the points") {
    graft.sql.Geo.register(spark)
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(4000)((rnd.nextDouble() * 160 - 80,
      rnd.nextDouble() * 100 - 50)).toDF("lon", "lat")
    val tiles = TileRender.renderTiles(pts, "lon", "lat", zoom = 2, size = 64)
      .select("tile_id", "png")
    val zones = Seq(
      (1L, "POLYGON ((-70 -40, -10 -40, -10 10, -70 10, -70 -40))"),
      (2L, "POLYGON ((0 0, 60 0, 60 45, 0 45, 0 0))"))
      .toDF("zone_id", "wkt")
      .selectExpr("zone_id", "st_geomfromwkt(wkt) AS g")
    val got = TileRender.zonalStats(tiles, zones, "zone_id", "g",
      zoom = 2, size = 64)
      .collect().map(r => r.getAs[Long]("zone_id") ->
        (r.getAs[Long]("px_sum"), r.getAs[Long]("px_count"))).toMap

    // brute force: bin the points to (tile, pixel) with the tile math,
    // clamp, then assign each pixel center to the zone whose raster set
    // holds it
    val raw = pts.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val counts = raw.groupBy { case (lon, lat) =>
      (Tiles.tileId(lon, lat, 2), Tiles.tilePixel(lon, lat, 2, 64))
    }.map { case (k, v) => k -> math.min(255L, v.length.toLong) }
    def geomOf(wkt: String) = GeoStruct.decode(GeoOps.fromWkt(
      org.apache.spark.unsafe.types.UTF8String.fromString(wkt)))
    val zoneSets = Seq(
      1L -> geomOf("POLYGON ((-70 -40, -10 -40, -10 10, -70 10, -70 -40))"),
      2L -> geomOf("POLYGON ((0 0, 60 0, 60 45, 0 45, 0 0))")
    ).map { case (zid, g) =>
      zid -> Tiles.coverGeom(g, 2)
        .flatMap(id => Raster.rasterize(g, id, 64).map(p => (id, p))).toSet
    }
    val want = zoneSets.map { case (zid, set) =>
      val in = counts.filter { case ((id, p), _) => set.contains((id, p)) }
      zid -> (in.values.sum, in.size.toLong)
    }.filter(_._2._2 > 0).toMap
    assert(got == want)
    assert(got.nonEmpty && got.values.forall(_._2 > 0))
  }

  test("tile_pixel_values is the exact inverse of tileRender") {
    val packed = Array((0L << 32) | 1L, (19L << 32) | 300L, (63L << 32) | 77L)
    val png = MediaOps.tileRender(8, GeoStruct.longArray(packed))
    val back = MediaOps.tilePixelValues(png).toLongArray().toSet
    // count 300 clamps to 255 in the render, so the inverse sees 255
    assert(back == Set((0L << 32) | 1L, (19L << 32) | 255L, (63L << 32) | 77L))
    assert(MediaOps.tilePixelValues(Array[Byte](1, 2, 3)) == null)
  }

  test("img_flip / img_rot90 / img_crop move pixels exactly") {
    val src = MediaOps.makePng(8, 6, 10, 20, 30, 200, 150, 100)
    val img = decode(src)
    def px(b: Array[Byte], x: Int, y: Int) = decode(b).getRGB(x, y) & 0xffffff

    val hf = MediaOps.imgFlip(src, 0)
    val vf = MediaOps.imgFlip(src, 1)
    for (y <- 0 until 6; x <- 0 until 8) {
      assert(px(hf, x, y) == (img.getRGB(7 - x, y) & 0xffffff))
      assert(px(vf, x, y) == (img.getRGB(x, 5 - y) & 0xffffff))
    }
    // double flip is identity (decoded-pixel exact)
    assert(MediaOps.imgMse(MediaOps.imgFlip(hf, 0), src) == 0.0)
    assert(MediaOps.imgMse(MediaOps.imgFlip(vf, 1), src) == 0.0)

    val r1 = MediaOps.imgRot90(src, 1)
    val i1 = decode(r1)
    assert(i1.getWidth == 6 && i1.getHeight == 8)
    // one clockwise turn: output (x', y') = input (y', h-1-x') with h=6
    for (y <- 0 until 8; x <- 0 until 6)
      assert((i1.getRGB(x, y) & 0xffffff) == (img.getRGB(y, 5 - x) & 0xffffff))
    // four turns are identity; rotation preserves channel sums
    assert(MediaOps.imgMse(MediaOps.imgRot90(MediaOps.imgRot90(r1, 1), 2), src) == 0.0)
    assert(MediaOps.imgChannelSum(r1, 0) == MediaOps.imgChannelSum(src, 0))

    val cr = MediaOps.imgCrop(src, 2, 1, 4, 3)
    val ic = decode(cr)
    assert(ic.getWidth == 4 && ic.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert((ic.getRGB(x, y) & 0xffffff) == (img.getRGB(x + 2, y + 1) & 0xffffff))
    // out-of-bounds crop is flagged, not clamped
    assert(MediaOps.imgCrop(src, 6, 0, 4, 3) == null)
    assert(MediaOps.imgFlip(src, 2) == null)
    assert(MediaOps.imgRot90(src, 4) == null)
  }

  test("tileDiff: zero MSE on identical stores, null-flagged on missing tiles") {
    graft.sql.Geo.register(spark)
    val pts = Seq((10.0, 10.0), (12.0, 12.0), (-100.0, -40.0)).toDF("lon", "lat")
    val a = TileRender.renderTiles(pts, "lon", "lat", zoom = 2, size = 64)
      .select("tile_id", "png")
    val d0 = TileRender.tileDiff(a, a).collect()
    assert(d0.nonEmpty && d0.forall(_.getAs[Double]("mse") == 0.0))
    assert(d0.forall(_.getAs[Double]("psnr").isPosInfinity))
    // drop one tile from the right store: that tile must surface with a
    // null mse (flagged), not disappear
    val firstTile = d0.head.getAs[Long]("tile_id")
    val b = a.filter(col("tile_id") =!= firstTile)
    val d1 = TileRender.tileDiff(a, b).collect()
    assert(d1.length == d0.length)
    val flagged = d1.filter(_.isNullAt(d1.head.fieldIndex("mse")))
    assert(flagged.map(_.getAs[Long]("tile_id")).toSeq == Seq(firstTile))
  }

  test("st_buffer: closed CCW disc around the point; rejects non-points") {
    graft.sql.Geo.register(spark)
    val row = spark.sql(
      """SELECT st_buffer(st_point(CAST(3.0 AS DOUBLE), CAST(-2.0 AS DOUBLE)),
        |  CAST(2.5 AS DOUBLE), 16) AS g""".stripMargin)
      .selectExpr("st_npoints(g) AS n", "st_area(g) AS a",
        "st_containsxy(g, CAST(3.0 AS DOUBLE), CAST(-2.0 AS DOUBLE)) AS c",
        "st_aswkt(g) AS wkt")
      .collect()(0)
    assert(row.getAs[Int]("n") == 17) // 16 segments + ring closure
    // regular k-gon area: 0.5*k*r^2*sin(2pi/k) — within float slack
    val want = 0.5 * 16 * 2.5 * 2.5 * math.sin(2 * math.Pi / 16)
    assert(math.abs(row.getAs[Double]("a") - want) < 1e-9)
    assert(row.getAs[Boolean]("c"), "disc must contain its center")
    // buffered point rasterizes like any polygon (shares the fill rule)
    val g = GeoOps.bufferPoint(GeoOps.makePoint(3.0, -2.0), 2.5, 16)
    val ids = Raster.coverTiles(GeoStruct.decode(g), 4, 64)
    assert(ids.nonEmpty &&
      ids.map(Raster.rasterize(GeoStruct.decode(g), _, 64).length).sum > 0)
    intercept[Exception] {
      spark.sql("SELECT st_buffer(st_makeline(CAST(0.0 AS DOUBLE)," +
        " CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE))," +
        " CAST(1.0 AS DOUBLE), 8)").collect()
    }
    // EMPTY point buffers to POLYGON EMPTY
    val e = spark.sql("SELECT st_aswkt(st_buffer(" +
      "st_geomfromwkt('POINT EMPTY'), CAST(1.0 AS DOUBLE), 8)) AS w")
      .collect()(0).getString(0)
    assert(e == "POLYGON EMPTY")
  }

  test("img_histogram / img_entropy: exact bins and one-bit entropy over the full population") {
    // proves q116's constant-entropy oracle the q105 way: the (w, h, v1,
    // v2) tuple is periodic in doc_id with period 1280, v1 != v2 for every
    // doc_id (6d ≡ 243 mod 256 has no solution), so each image has exactly
    // two equal histogram bins and entropy exactly 1.0 bit — for EVERY
    // row at EVERY scale factor
    for (d <- 0 until 1280) {
      val w = (d % 5 + 1) * 8; val h = (d % 4 + 1) * 8
      val v1 = d % 256; val v2 = (d * 7 + 13) % 256
      assert(v1 != v2)
      val src = MediaOps.makePng(w, h, v1, v1, v1, v2, v2, v2)
      for (ch <- 0 to 2) {
        val hist = MediaOps.imgHistogram(src, ch)
        assert(hist != null && hist.numElements() == 256)
        (0 until 256).foreach { b =>
          val expect = if (b == v1 || b == v2) (w * h / 2).toLong else 0L
          assert(hist.getLong(b) == expect, s"doc $d ch $ch bin $b")
        }
        val e = MediaOps.imgEntropy(src, ch)
        assert(e != null && e.doubleValue == 1.0, s"doc $d ch $ch entropy $e")
      }
    }
    // degenerate cases: constant image → 0 bits; bad inputs → null
    val const = MediaOps.makePng(8, 8, 9, 9, 9, 9, 9, 9)
    assert(MediaOps.imgEntropy(const, 0).doubleValue == 0.0)
    assert(MediaOps.imgHistogram(const, 3) == null)
    assert(MediaOps.imgEntropy(Array[Byte](1, 2, 3), 0) == null)
  }

  test("img_jpeg: real lossy pass holds the PSNR>=40dB gate with margin") {
    // the north rule's lossy invariant, EXHAUSTIVE over the q105 image
    // population: the (w, h, v1, v2) tuple is periodic in doc_id with
    // period lcm(5, 4, 256) = 1280, so checking doc_id 0..1279 proves the
    // oracle's all-rows-pass claim for EVERY scale factor
    var minPsnr = Double.PositiveInfinity
    for (d <- 0 until 1280) {
      val w = (d % 5 + 1) * 8; val h = (d % 4 + 1) * 8
      val v1 = d % 256; val v2 = (d * 7 + 13) % 256
      val src = MediaOps.makePng(w, h, v1, v1, v1, v2, v2, v2)
      val jpg = MediaOps.imgJpeg(src, 95)
      assert(jpg != null && (jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8,
        "output must be a real JPEG")
      val psnr = MediaOps.imgPsnr(src, jpg)
      assert(psnr != null)
      minPsnr = math.min(minPsnr, psnr.doubleValue)
    }
    assert(minPsnr >= 40.0, s"lossy gate: min PSNR $minPsnr dB < 40")
    info(f"min PSNR over the full 1280-image q105 population at quality 95: $minPsnr%.1f dB")
    // determinism: same input, same bytes
    val s = MediaOps.makePng(16, 16, 1, 2, 3, 4, 5, 6)
    assert(java.util.Arrays.equals(MediaOps.imgJpeg(s, 80), MediaOps.imgJpeg(s, 80)))
    assert(MediaOps.imgJpeg(s, 0) == null && MediaOps.imgJpeg(s, 101) == null)
  }
}
