package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tiles
import graft.sql.MediaOps

class TileRenderSpec extends AnyFunSuite {
  lazy val spark = graft.sql.SparkTestSession.spark
  import spark.implicits._

  private def decode(png: Array[Byte]) =
    ImageIO.read(new ByteArrayInputStream(png))

  test("tilePixel lands inside the tile tileId assigns (random sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 5000) {
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = rnd.nextDouble() * 170.0 - 85.0
      val z = rnd.nextInt(12)
      val size = 256
      val p = Tiles.tilePixel(lon, lat, z, size)
      assert(p >= 0 && p < size * size, s"pixel $p out of range at z=$z")
      // the pixel's world position must fall inside the assigned tile's
      // envelope (fraction-past-truncation construction guarantees it)
      val id = Tiles.tileId(lon, lat, z)
      val (minLon, minLat, maxLon, maxLat) = Tiles.tileEnvelope(id)
      assert(lon >= minLon && lon < maxLon + 1e-9)
      assert(lat >= minLat - 1e-9 && lat <= maxLat + 1e-9)
    }
  }

  test("tileRender paints exact clamped counts at exact pixels") {
    // pixel 0 -> count 1, pixel (3,2)=2*8+3 -> count 300 (clamps to 255)
    val packed = Array((0L << 32) | 1L, (19L << 32) | 300L)
    val png = MediaOps.tileRender(8, graft.sql.GeoStruct.longArray(packed))
    val img = decode(png)
    assert(img.getWidth == 8 && img.getHeight == 8)
    assert((img.getRGB(0, 0) & 0xff) == 1)
    assert((img.getRGB(3, 2) & 0xff) == 255)
    var zeros = 0
    for (y <- 0 until 8; x <- 0 until 8
         if (x, y) != ((0, 0)) && (x, y) != ((3, 2)))
      zeros += (img.getRGB(x, y) & 0xffffff)
    assert(zeros == 0, "untouched pixels must be black")
    // audit kernels agree with the analytic values
    assert(MediaOps.imgNonzero(png) == 2L)
    assert(MediaOps.imgChannelSum(png, 0) == 256L)
  }

  test("renderTiles: end-to-end distributed render, decoded-pixel exact") {
    // two clusters in two different z2 tiles; three points share one pixel
    val pts = Seq(
      (10.0, 10.0), (10.0, 10.0), (10.0, 10.0), // same pixel, count 3
      (12.0, 12.0),                             // same tile, other pixel
      (-100.0, -40.0)                           // different tile
    ).toDF("lon", "lat")
    val out = TileRender.renderTiles(pts, "lon", "lat", zoom = 2, size = 64)
      .collect().map(r => (r.getAs[Int]("x"), r.getAs[Int]("y")) ->
        r.getAs[Array[Byte]]("png")).toMap
    assert(out.size == 2)
    val t1 = Tiles.tileId(10.0, 10.0, 2)
    val key1 = (Tiles.x(t1), Tiles.y(t1))
    val img1 = decode(out(key1))
    val p1 = Tiles.tilePixel(10.0, 10.0, 2, 64)
    assert((img1.getRGB(p1 % 64, p1 / 64) & 0xff) == 3)
    val p2 = Tiles.tilePixel(12.0, 12.0, 2, 64)
    assert((img1.getRGB(p2 % 64, p2 / 64) & 0xff) == 1)
    assert(MediaOps.imgNonzero(out(key1)) == 2L)
    val t2 = Tiles.tileId(-100.0, -40.0, 2)
    assert(MediaOps.imgNonzero(out((Tiles.x(t2), Tiles.y(t2)))) == 1L)
  }

  // ------------------------------------------------------------ convolve

  /** One-tile store with the given packed (pixel -> value) cells. */
  private def store(z: Int, tx: Int, ty: Int, size: Int,
                    cells: Seq[(Int, Long)]) = {
    val png = MediaOps.tileRender(size,
      graft.sql.GeoStruct.longArray(
        cells.map { case (p, v) => (p.toLong << 32) | v }.toArray))
    Seq((Tiles.pack(z, tx, ty), png)).toDF("tile_id", "png")
  }

  private def pixels(png: Array[Byte]): Map[(Int, Int), Int] = {
    val img = decode(png)
    (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth
          if (img.getRGB(x, y) & 0xff) != 0)
      yield (x, y) -> (img.getRGB(x, y) & 0xff)).toMap
  }

  test("convolve: identity kernel reproduces the store byte-for-byte") {
    val in = store(2, 1, 2, 64, Seq(0 -> 7L, 65 -> 255L, 64 * 64 - 1 -> 1L))
    val id = Seq(Seq(0L, 0L, 0L), Seq(0L, 1L, 0L), Seq(0L, 0L, 0L))
    val out = TileRender.convolve(in, id, 1L, size = 64).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Int]("z") == 2 && row.getAs[Int]("x") == 1 &&
      row.getAs[Int]("y") == 2)
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("png"),
      in.collect().head.getAs[Array[Byte]]("png")))
  }

  test("convolve: gaussian blur exchanges halo across tile boundaries") {
    // one pixel of value 16 at the top-left CORNER of tile (1,1): the blur
    // must light pixels in the three neighbor tiles (0,0), (1,0), (0,1)
    // that were absent from the input store — the halo exchange, plus
    // bleed-into-absent-tiles, in one case
    val in = store(2, 1, 1, 64, Seq(0 -> 16L))
    val out = TileRender.convolve(in, TileRender.GaussianKernel, 16L,
        size = 64)
      .collect()
      .map(r => (r.getAs[Int]("x"), r.getAs[Int]("y")) ->
        pixels(r.getAs[Array[Byte]]("png"))).toMap
    assert(out.keySet == Set((0, 0), (1, 0), (0, 1), (1, 1)))
    // contribution at offset (dx, dy) = w(dx)·w(dy), w = [1, 2, 1]
    assert(out((0, 0)) == Map((63, 63) -> 1))
    assert(out((1, 0)) == Map((0, 63) -> 2, (1, 63) -> 1))
    assert(out((0, 1)) == Map((63, 0) -> 2, (63, 1) -> 1))
    assert(out((1, 1)) == Map((0, 0) -> 4, (1, 0) -> 2, (0, 1) -> 2,
      (1, 1) -> 1))
    // kernel sum 16, divisor 16: total mass conserved away from edges
    assert(out.values.flatMap(_.values).sum == 16)
  }

  test("convolve: zero padding at the world edge drops out-of-range taps") {
    // value 16 at world pixel (0, 0): the 7 taps with a negative world
    // coordinate vanish (4 + 4 - 1 overlap), leaving mass 16 - 7 = 9
    val in = store(2, 0, 0, 64, Seq(0 -> 16L))
    val out = TileRender.convolve(in, TileRender.GaussianKernel, 16L,
        size = 64)
      .collect()
      .map(r => (r.getAs[Int]("x"), r.getAs[Int]("y")) ->
        pixels(r.getAs[Array[Byte]]("png"))).toMap
    assert(out.keySet == Set((0, 0)))
    assert(out((0, 0)) == Map((0, 0) -> 4, (1, 0) -> 2, (0, 1) -> 2,
      (1, 1) -> 1))
  }

  test("renderTiles plan: kernels codegen'd, partial agg before shuffle") {
    val pts = Seq((1.0, 2.0), (3.0, 4.0)).toDF("lon", "lat")
    val plan = TileRender.renderTiles(pts, "lon", "lat", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"),
      s"render must not sever codegen:\n$plan")
    // the (tile, pixel) count must partially aggregate map-side so the
    // only shuffle carries <= tiles x pixels rows, not input rows
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"expected a partial aggregate before the exchange:\n$plan")
  }

  test("renderTiles drops null coordinates instead of emitting a bogus null tile") {
    val pts = Seq[(java.lang.Double, java.lang.Double)](
      (10.0, 10.0), (null, 10.0), (10.0, null)).toDF("lon", "lat")
    val out = TileRender.renderTiles(pts, "lon", "lat", zoom = 2, size = 64)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Any]("tile_id") != null)
    assert(MediaOps.imgNonzero(out(0).getAs[Array[Byte]]("png")) == 1L)
  }

  test("renderTiles weighted: intensity = clamped weight sum, negatives floor at 0") {
    val pts = Seq(
      (10.0, 10.0, 7L), (10.0, 10.0, 5L),   // same pixel -> 12
      (12.0, 12.0, 900L),                   // clamps to 255
      (14.0, 14.0, -3L)                     // negative sum floors to 0 (black)
    ).toDF("lon", "lat", "w")
    val out = TileRender.renderTiles(pts, "lon", "lat", zoom = 2, size = 64,
        weightCol = Some("w")).collect()
    assert(out.length == 1)
    val png = out(0).getAs[Array[Byte]]("png")
    val img = decode(png)
    def at(lon: Double, lat: Double) = {
      val p = Tiles.tilePixel(lon, lat, 2, 64)
      img.getRGB(p % 64, p / 64) & 0xff
    }
    assert(at(10.0, 10.0) == 12)
    assert(at(12.0, 12.0) == 255)
    assert(at(14.0, 14.0) == 0)
    assert(MediaOps.imgNonzero(png) == 2L)
  }

  test("renderTilesRgb: channels render independent clamped sums") {
    val pts = Seq(
      (10.0, 10.0, 1L, 0L, 0L), (10.0, 10.0, 1L, 0L, 0L), // r=2 same pixel
      (10.0, 10.0, 0L, 5L, 0L),                           // g=5 same pixel
      (12.0, 12.0, 0L, 0L, 300L)                          // b clamps to 255
    ).toDF("lon", "lat", "r", "g", "b")
    val out = TileRender.renderTilesRgb(pts, "lon", "lat", zoom = 2,
      rCol = "r", gCol = "g", bCol = "b", size = 64).collect()
    assert(out.length == 1)
    val png = out(0).getAs[Array[Byte]]("png")
    val img = decode(png)
    val p1 = Tiles.tilePixel(10.0, 10.0, 2, 64)
    val rgb1 = img.getRGB(p1 % 64, p1 / 64)
    assert(((rgb1 >> 16) & 0xff, (rgb1 >> 8) & 0xff, rgb1 & 0xff) == ((2, 5, 0)))
    val p2 = Tiles.tilePixel(12.0, 12.0, 2, 64)
    assert((img.getRGB(p2 % 64, p2 / 64) & 0xff) == 255)
    assert(MediaOps.imgChannelSum(png, 0) == 2L)
    assert(MediaOps.imgChannelSum(png, 1) == 5L)
    assert(MediaOps.imgChannelSum(png, 2) == 255L)
    assert(MediaOps.imgNonzero(png) == 2L)
  }

  test("renderPyramid: every level matches a direct render at that zoom") {
    // pyramid levels must be BIT-IDENTICAL to re-rendering each level from
    // scratch — the exact-halving guarantee (power-of-two size)
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(400)(
      (rnd.nextDouble() * 350 - 175, rnd.nextDouble() * 160 - 80))
      .toDF("lon", "lat")
    val pyr = TileRender.renderPyramid(pts, "lon", "lat",
        minZoom = 1, maxZoom = 4, size = 64)
      .collect()
      .map(r => (r.getAs[Long]("tile_id"), r.getAs[Int]("z")) ->
        r.getAs[Array[Byte]]("png").toSeq).toMap
    for (z <- 1 to 4) {
      val direct = TileRender.renderTiles(pts, "lon", "lat", z, size = 64)
        .collect()
        .map(r => (r.getAs[Long]("tile_id"), z) ->
          r.getAs[Array[Byte]]("png").toSeq).toMap
      val pyrZ = pyr.filter(_._1._2 == z)
      assert(pyrZ.keySet == direct.keySet, s"tile set differs at z=$z")
      for ((k, png) <- direct)
        assert(pyrZ(k) == png, s"png bytes differ at $k")
    }
    // world-pixel halving invariant backing the reduction
    for (_ <- 0 until 2000) {
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 170 - 85
      val z = 1 + rnd.nextInt(10)
      assert(Tiles.worldPixelX(lon, z, 256) >> 1 ==
        Tiles.worldPixelX(lon, z - 1, 256))
      assert(Tiles.worldPixelY(lat, z, 256) >> 1 ==
        Tiles.worldPixelY(lat, z - 1, 256))
      // world pixel decomposes into (tile, in-tile pixel) consistently
      assert(Tiles.worldPixelX(lon, z, 256) / 256 == Tiles.tileX(lon, z))
      val p = Tiles.tilePixel(lon, lat, z, 256)
      assert(Tiles.worldPixelX(lon, z, 256) % 256 == p % 256)
      assert(Tiles.worldPixelY(lat, z, 256) % 256 == p / 256)
    }
  }

  test("imgResize: NN resize reproduces two-band synthesis exactly") {
    val orig = MediaOps.makePng(12, 8, 10, 20, 30, 200, 100, 50)
    for ((w2, h2) <- Seq((24, 16), (6, 4), (12, 8), (48, 2))) {
      val resized = MediaOps.imgResize(orig, w2, h2)
      val direct = MediaOps.makePng(w2, h2, 10, 20, 30, 200, 100, 50)
      assert(MediaOps.imgMse(resized, direct) == 0.0,
        s"NN resize to ${w2}x$h2 must be pixel-exact")
    }
    // odd target height: top band is ceil(h2*? ) rows by floor mapping —
    // row 1 of a 3-row target samples src row floor(1*8/3)=2 (top band)
    val odd = decode(MediaOps.imgResize(orig, 4, 3))
    assert(((odd.getRGB(0, 0) >> 16) & 0xff) == 10)
    assert(((odd.getRGB(0, 1) >> 16) & 0xff) == 10)
    assert(((odd.getRGB(0, 2) >> 16) & 0xff) == 200)
    assert(MediaOps.imgResize("not a png".getBytes, 4, 4) == null)
  }

  test("imgChannelSum / imgNonzero analytic on two-band synthesis") {
    val png = MediaOps.makePng(4, 4, 10, 20, 30, 200, 100, 50)
    assert(MediaOps.imgChannelSum(png, 0) == (10 * 8 + 200 * 8).toLong)
    assert(MediaOps.imgChannelSum(png, 1) == (20 * 8 + 100 * 8).toLong)
    assert(MediaOps.imgChannelSum(png, 2) == (30 * 8 + 50 * 8).toLong)
    assert(MediaOps.imgChannelSum(png, 3) == null)
    assert(MediaOps.imgNonzero(png) == 16L)
    val black = MediaOps.makePng(4, 4, 0, 0, 0, 0, 0, 0)
    assert(MediaOps.imgNonzero(black) == 0L)
    assert(MediaOps.imgChannelSum(null, 0) == null)
  }
}
