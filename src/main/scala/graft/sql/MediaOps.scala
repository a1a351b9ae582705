package graft.sql

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multimodal (binary payload) kernels, `StaticInvoke`-shaped like every
  * other kernel so image metadata extraction runs inside whole-stage
  * codegen, pipelined with the scan — no `mapPartitions` boundary, column
  * pruning flows through. Header parsing is a real decoder (PNG IHDR, JPEG
  * SOF0/SOF2 markers) needing no media library. */
object MediaOps {

  // All kernel IO is byte-array-backed; ImageIO's default DISK cache would
  // spill every decode/encode through a temp file — pure overhead on the
  // per-row hot path, and the shared temp-dir cache is the one piece of
  // cross-thread state in an otherwise stateless kernel (a rare
  // parallel-suite PSNR flake pointed here). Memory caching is strictly
  // better for in-memory streams.
  javax.imageio.ImageIO.setUseCache(false)

  val imageMetaType: StructType = StructType(Seq(
    StructField("decoded_w", IntegerType, nullable = true),
    StructField("decoded_h", IntegerType, nullable = true),
    StructField("detected_fmt", StringType, nullable = false)))

  /** (w, h, fmt) from the payload header as a struct; unknown/short payloads
    * yield (null, null, "unknown"). */
  def imageMeta(bytes: Array[Byte]): InternalRow = {
    val (w, h, fmt) = imageMetaTuple(bytes)
    new GenericInternalRow(Array[Any](
      w.map(Int.box).orNull, h.map(Int.box).orNull, UTF8String.fromString(fmt)))
  }

  /** Scala-side variant (shared by the expression and direct callers). */
  def imageMetaTuple(bytes: Array[Byte]): (Option[Int], Option[Int], String) = {
    if (bytes == null || bytes.length < 12) return (None, None, "unknown")
    // PNG: 89 50 4E 47 0D 0A 1A 0A, IHDR at offset 8, w/h big-endian at 16/20
    if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G' && bytes.length >= 24) {
      val bb = java.nio.ByteBuffer.wrap(bytes, 16, 8)
      return (Some(bb.getInt), Some(bb.getInt), "png")
    }
    // JPEG: FF D8, scan markers for SOF0(C0)/SOF2(C2): h/w big-endian
    if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < bytes.length) {
        if ((bytes(i) & 0xff) == 0xff) {
          val marker = bytes(i + 1) & 0xff
          if (marker == 0xc0 || marker == 0xc2) {
            val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
            val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
            return (Some(w), Some(h), "jpeg")
          }
          val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          i += 2 + len
        } else i += 1
      }
      return (None, None, "jpeg")
    }
    (None, None, "unknown")
  }

  /** Pooled-pixel image features — a REAL decoder for the two formats the
    * JDK ships (PNG and JPEG via javax.imageio), not a stub. The image is
    * decoded, each pixel reduced to the integer luminance
    * `299*r + 587*g + 114*b` (the BT.601 weights scaled by 1000 so cell
    * sums stay exact integers), pooled over a `gw x gh` grid
    * (`gw = ceil(sqrt(dim))`, `gh = ceil(dim/gw)`, row-major), and each
    * cell's mean normalized to [0,1]: `sum / (255000.0 * count)`. The
    * integer-sum-then-one-division shape makes the result bit-reproducible
    * (IEEE division is correctly rounded, so the value depends only on the
    * exact rational mean) — which is what lets the DuckDB oracle replicate
    * it analytically. Undecodable bytes -> null. */
  def imgFeatures(bytes: Array[Byte], dim: Int): ArrayData = {
    if (bytes == null || dim <= 0) return null
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    val gw = math.ceil(math.sqrt(dim.toDouble)).toInt
    val gh = math.ceil(dim.toDouble / gw).toInt
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      val cy = math.min(gh - 1, y * gh / h)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        val lum = ((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114
        val cell = cy * gw + math.min(gw - 1, x * gw / w)
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      out(j) =
        if (j < gw * gh && counts(j) > 0)
          (sums(j).toDouble / (255000.0 * counts(j))).toFloat
        else 0f
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** REAL perceptual hash (average-hash family) from decoded pixels: the
    * image pools to an 8×8 luminance grid (same BT.601 integer sums as
    * [[imgFeatures]]) and bit `63 - cell` (row-major) is set when the
    * cell's mean exceeds the whole-image mean. Comparison is
    * integer-cross-multiplied (`cellSum * totalCount > totalSum *
    * cellCount`) — no division, no rounding, so the hash is
    * bit-reproducible and analytically oracle-able (q82). Near-identical
    * images (recompressed, lightly edited) land within a few bits —
    * `hamming64` + [[graft.operators.Dedup.hash64NearDups]] turn this
    * into image-level dedup, the `phash` column of the input contract
    * computed from real bytes. Undecodable payloads -> null. Image sides
    * are capped at 4096 so the cross-products stay within Long. */
  def imgPhash(bytes: Array[Byte]): java.lang.Long = {
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        val lum = ((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114
        val cell = cy * 8 + math.min(7, x * 8 / w)
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var totalSum = 0L
    var totalCount = 0L
    var i = 0
    while (i < 64) { totalSum += sums(i); totalCount += counts(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (counts(i) > 0 && sums(i) * totalCount > totalSum * counts(i))
        hash |= 1L << (63 - i)
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Full pixel decode via javax.imageio; null for undecodable payloads. */
  private def decodeImage(bytes: Array[Byte]): BufferedImage = {
    if (bytes == null) return null
    try ImageIO.read(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null }
  }

  /** Mean squared error between two decoded images over all RGB channels —
    * the north rule's per-row image invariant ("decoded-pixel allclose,
    * PSNR>=40dB for lossy") as a first-class kernel instead of a test-only
    * helper. Exact arithmetic: integer channel diffs accumulate in a Long
    * (max 255²·3·4096² ≈ 3.3e12 < 2^53), one double division at the end —
    * bit-reproducible, so analytically oracle-able (q96). Undecodable
    * input or mismatched dimensions → null (a verification pipeline wants
    * those rows FLAGGED, not crashed). */
  def imgMse(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    val ia = decodeImage(a); val ib = decodeImage(b)
    if (ia == null || ib == null) return null
    val w = ia.getWidth; val h = ia.getHeight
    if (w != ib.getWidth || h != ib.getHeight ||
      w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val ra = new Array[Int](w); val rb = new Array[Int](w)
    var se = 0L
    var y = 0
    while (y < h) {
      ia.getRGB(0, y, w, 1, ra, 0, w)
      ib.getRGB(0, y, w, 1, rb, 0, w)
      var x = 0
      while (x < w) {
        val pa = ra(x); val pb = rb(x)
        val dr = ((pa >> 16) & 0xff) - ((pb >> 16) & 0xff)
        val dg = ((pa >> 8) & 0xff) - ((pb >> 8) & 0xff)
        val db = (pa & 0xff) - (pb & 0xff)
        se += dr * dr + dg * dg + db * db
        x += 1
      }
      y += 1
    }
    java.lang.Double.valueOf(se.toDouble / (3.0 * w * h))
  }

  /** Peak signal-to-noise ratio in dB over decoded pixels (8-bit peak):
    * `10·log10(255² / MSE)`; identical images → +Infinity. The membership
    * predicate `img_psnr(a, b) >= 40.0` is the north rule's lossy-payload
    * gate and is ulp-robust wherever the true PSNR isn't within float
    * noise of the threshold (the bit-exact companion is [[imgMse]]). */
  def imgPsnr(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    val mse = imgMse(a, b)
    if (mse == null) return null
    val m = mse.doubleValue
    if (m == 0.0) java.lang.Double.valueOf(Double.PositiveInfinity)
    else java.lang.Double.valueOf(10.0 * math.log10(65025.0 / m))
  }

  /** Deterministic lossless pixel perturbation: every channel moves by
    * exactly `delta`, away from its nearer rail (v ≥ 128 goes down, else
    * up) so no clamping ever occurs and the per-channel error is exactly
    * ±delta — hence `img_mse(orig, img_perturb(orig, d)) == d²`
    * analytically, which is what lets q96 oracle a real
    * decode→pixel-op→encode→decode→compare chain in closed form.
    * Re-encoded as PNG (lossless). Undecodable input → null. */
  def imgPerturb(bytes: Array[Byte], delta: Int): Array[Byte] = {
    require(delta >= 0 && delta <= 127, s"perturb delta out of [0,127]: $delta")
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        def shift(v: Int): Int = if (v >= 128) v - delta else v + delta
        row(x) = (shift((p >> 16) & 0xff) << 16) |
          (shift((p >> 8) & 0xff) << 8) | shift(p & 0xff)
        x += 1
      }
      out.setRGB(0, y, w, 1, row, 0, w)
      y += 1
    }
    val bos = new ByteArrayOutputStream(128 + w * h / 8)
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Rasterize one map tile from packed (pixel, count) cells into a
    * grayscale PNG: each packed long is `pixelIndex << 32 | count`, the
    * rendered intensity is `min(255, count)` replicated across R/G/B.
    * TYPE_INT_RGB (not TYPE_BYTE_GRAY) deliberately: Java2D converts
    * BYTE_GRAY through a linear color space on `getRGB`, which would
    * distort the decoded values — RGB keeps the rendered counts
    * bit-exact through an encode/decode round trip, which is what lets
    * the renderer be oracled end-to-end (q97). Cells arrive via
    * `collect_list`, so order is arbitrary — the fill is order-independent
    * (each pixel appears once per (tile, pixel) group). */
  def tileRender(size: Int, packed: ArrayData): Array[Byte] = {
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val cells = packed.toLongArray()
    var i = 0
    while (i < cells.length) {
      val v = cells(i)
      val p = (v >>> 32).toInt
      // p >= 0 matters: pixel bits above 2^31 would wrap negative and
      // reach setRGB as a raw out-of-bounds crash instead of this message
      require(p >= 0 && p < size * size, s"pixel index $p out of ${size}x$size tile")
      val cnt = v & 0xffffffffL
      val g = if (cnt > 255L) 255 else cnt.toInt
      img.setRGB(p % size, p / size, (g << 16) | (g << 8) | g)
      i += 1
    }
    val bos = new ByteArrayOutputStream(256 + size * size / 8)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** RGB variant of [[tileRender]]: each packed long is
    * `pixelIndex << 32 | r << 16 | g << 8 | b` (channels pre-clamped to
    * [0, 255] by the caller) — a categorical/multi-measure overlay where
    * each channel renders its own clamped sum. Same bit-exact
    * encode/decode contract as the grayscale renderer. */
  def tileRenderRgb(size: Int, packed: ArrayData): Array[Byte] = {
    require(size > 0 && size <= 4096, s"tile size out of (0,4096]: $size")
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val cells = packed.toLongArray()
    var i = 0
    while (i < cells.length) {
      val v = cells(i)
      val p = (v >>> 32).toInt
      require(p >= 0 && p < size * size, s"pixel index $p out of ${size}x$size tile")
      img.setRGB(p % size, p / size, (v & 0xffffffL).toInt)
      i += 1
    }
    val bos = new ByteArrayOutputStream(256 + size * size / 4)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Sum of one channel (0=R, 1=G, 2=B) over all decoded pixels. Long
    * accumulator (max 255·4096² ≈ 4.3e9 overflows Int). Undecodable
    * payload or bad channel → null. */
  def imgChannelSum(bytes: Array[Byte], channel: Int): java.lang.Long = {
    if (channel < 0 || channel > 2) return null
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val shift = (2 - channel) * 8
    val row = new Array[Int](w)
    var sum = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) { sum += (row(x) >> shift) & 0xff; x += 1 }
      y += 1
    }
    java.lang.Long.valueOf(sum)
  }

  /** 256-bin histogram of one decoded channel (0=R 1=G 2=B) — the corpus
    * statistic image-normalization and near-constant-image filters run on.
    * Exact integer counts, so the oracle reconstructs every bin in closed
    * form. Undecodable payload / bad channel → null. */
  def imgHistogram(bytes: Array[Byte], channel: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (channel < 0 || channel > 2) return null
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val shift = (2 - channel) * 8
    val bins = new Array[Long](256)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) { bins((row(x) >> shift) & 0xff) += 1L; x += 1 }
      y += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bins)
  }

  /** Shannon entropy (bits) of one channel's histogram — 0 for constant
    * images, log2(256)=8 max; the standard near-constant / synthetic-image
    * filter statistic. p·log2(p) via `Math.log(p) / Math.log(2)`. */
  def imgEntropy(bytes: Array[Byte], channel: Int): java.lang.Double =
    imgEntropyHist(imgHistogram(bytes, channel))

  /** Entropy from an already-materialized histogram array — use this form
    * when the query also projects `img_histogram` on the same bytes, so
    * the PNG decodes ONCE per row instead of once per statistic. */
  def imgEntropyHist(hist: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    if (hist == null) return null
    val n = hist.numElements()
    var total = 0.0
    var i = 0
    while (i < n) { total += hist.getLong(i).toDouble; i += 1 }
    if (total == 0) return java.lang.Double.valueOf(0.0)
    var e = 0.0
    val ln2 = Math.log(2.0)
    i = 0
    while (i < n) {
      val c = hist.getLong(i)
      if (c > 0) {
        val p = c.toDouble / total
        e -= p * (Math.log(p) / ln2)
      }
      i += 1
    }
    java.lang.Double.valueOf(e)
  }

  /** Count of decoded pixels with any nonzero RGB channel ("lit" pixels of
    * a rendered tile). Undecodable payload → null. */
  def imgNonzero(bytes: Array[Byte]): java.lang.Long = {
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val row = new Array[Int](w)
    var lit = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) { if ((row(x) & 0xffffff) != 0) lit += 1; x += 1 }
      y += 1
    }
    java.lang.Long.valueOf(lit)
  }

  /** Decode a rendered grayscale tile PNG back to packed
    * `pixelIndex << 32 | gray` longs for the NONZERO pixels — the inverse
    * of [[tileRender]] (gray read from the R channel; the renderer writes
    * identical R/G/B). This is what lets raster→vector operators (zonal
    * statistics) consume a tile store as rows without materializing size²
    * entries for empty pixels. Undecodable payload → null. */
  def tilePixelValues(png: Array[Byte]): ArrayData = {
    val img = decodeImage(png)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val row = new Array[Int](w)
    val buf = new scala.collection.mutable.ArrayBuilder.ofLong
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val v = (row(x) >> 16) & 0xff
        if (v != 0) buf += (y.toLong * w + x) << 32 | v
        x += 1
      }
      y += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buf.result())
  }

  /** Masked TYPE_INT_RGB copy of the rectangle `[x, x+w2) × [y, y+h2)` —
    * the shared normalize step of every augmentation kernel (alpha
    * dropped, pixel values otherwise exact). Callers validate bounds. */
  private def toRgbCopy(img: BufferedImage, x: Int, y: Int,
                        w2: Int, h2: Int): BufferedImage = {
    val out = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](w2)
    var yy = 0
    while (yy < h2) {
      img.getRGB(x, y + yy, w2, 1, row, 0, w2)
      var xx = 0
      while (xx < w2) { row(xx) &= 0xffffff; xx += 1 }
      out.setRGB(0, yy, w2, 1, row, 0, w2)
      yy += 1
    }
    out
  }

  /** Mirror flip, re-encoded as PNG (lossless): mode 0 = horizontal
    * (columns reverse), mode 1 = vertical (rows reverse). Exact pixel
    * moves — `img_mse(img_flip(img_flip(x, m), m), x) == 0` analytically.
    * Undecodable input or bad mode → null. */
  def imgFlip(bytes: Array[Byte], mode: Int): Array[Byte] = {
    if (mode < 0 || mode > 1) return null
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val src = new Array[Int](w)
    val dst = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, src, 0, w)
      if (mode == 0) {
        var x = 0
        while (x < w) { dst(x) = src(w - 1 - x) & 0xffffff; x += 1 }
        out.setRGB(0, y, w, 1, dst, 0, w)
      } else {
        var x = 0
        while (x < w) { src(x) &= 0xffffff; x += 1 }
        out.setRGB(0, h - 1 - y, w, 1, src, 0, w)
      }
      y += 1
    }
    encodePng(out, w * h)
  }

  /** Rotate by `k` clockwise quarter turns (k in 0..3), re-encoded as PNG.
    * Exact, ONE pass whatever k: the composed index mapping writes each
    * output row from one gather over the input (row-batched like the
    * other kernels — no intermediate images, no per-pixel setRGB).
    * Channel sums are invariant and dimensions swap for odd k, which is
    * what the closed-form oracle audits (q104). Undecodable input or k
    * outside 0..3 → null. */
  def imgRot90(bytes: Array[Byte], k: Int): Array[Byte] = {
    if (k < 0 || k > 3) return null
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    if (k == 0) return encodePng(toRgbCopy(img, 0, 0, w, h), w * h)
    val ow = if (k % 2 == 1) h else w
    val oh = if (k % 2 == 1) w else h
    val px = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, px, 0, w)
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    val dst = new Array[Int](ow)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        // k clockwise quarter turns: source of output (ox, oy)
        val (sx, sy) = k match {
          case 1 => (oy, h - 1 - ox)          // 90° cw
          case 2 => (w - 1 - ox, h - 1 - oy)  // 180°
          case _ => (w - 1 - oy, ox)          // 270° cw
        }
        dst(ox) = px(sy * w + sx) & 0xffffff
        ox += 1
      }
      out.setRGB(0, oy, ow, 1, dst, 0, ow)
      oy += 1
    }
    encodePng(out, w * h)
  }

  /** Exact crop to the rectangle `[x, x+w2) × [y, y+h2)`, re-encoded as
    * PNG. Out-of-bounds rectangles → null (a pipeline wants bad crops
    * flagged, not clamped into silently-different data). */
  def imgCrop(bytes: Array[Byte], x: Int, y: Int, w2: Int, h2: Int): Array[Byte] = {
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    // subtraction form: `x + w2 > w` would overflow Int for huge x/w2 and
    // let the bad crop through to a getRGB crash instead of the null
    if (x < 0 || y < 0 || w2 <= 0 || h2 <= 0 || w2 > w - x || h2 > h - y)
      return null
    encodePng(toRgbCopy(img, x, y, w2, h2), w2 * h2)
  }

  /** Re-encode through a REAL lossy JPEG pass at `quality` (1..100) and
    * return the JPEG bytes — the genuinely-lossy leg of the north rule's
    * "PSNR ≥ 40 dB for lossy" invariant (`img_psnr(orig, img_jpeg(orig,
    * q))` is the gate; q105 asserts it row-by-row). Deterministic for a
    * given JVM (one encoder implementation, explicit compression mode).
    * Undecodable input or quality outside 1..100 → null. */
  def imgJpeg(bytes: Array[Byte], quality: Int): Array[Byte] = {
    if (quality < 1 || quality > 100) return null
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    // JPEG writers refuse alpha; normalize to RGB
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else toRgbCopy(img, 0, 0, w, h)
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality / 100f)
      val bos = new ByteArrayOutputStream(256 + w * h / 4)
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(rgb, null, null), param)
      } finally ios.close()
      bos.toByteArray
    } finally writer.dispose()
  }

  private def encodePng(img: BufferedImage, pixels: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(128 + pixels / 8)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Nearest-neighbor resize to exactly `w2`×`h2`, re-encoded as PNG
    * (lossless). Source pixel of output (x, y) is
    * (⌊x·w/w2⌋, ⌊y·h/h2⌋) — exact integer math, so the result is
    * bit-reproducible and analytically oracle-able (q98: resizing a
    * two-band image to even heights reproduces the two-band image at the
    * new size exactly). Undecodable input → null. */
  def imgResize(bytes: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    require(w2 > 0 && h2 > 0 && w2 <= 4096 && h2 <= 4096,
      s"resize target out of (0,4096]: ${w2}x$h2")
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return null
    val out = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
    val srcRow = new Array[Int](w)
    val dstRow = new Array[Int](w2)
    var y = 0
    var lastSy = -1
    while (y < h2) {
      val sy = ((y.toLong * h) / h2).toInt
      if (sy != lastSy) { img.getRGB(0, sy, w, 1, srcRow, 0, w); lastSy = sy }
      var x = 0
      while (x < w2) {
        dstRow(x) = srcRow(((x.toLong * w) / w2).toInt) & 0xffffff
        x += 1
      }
      out.setRGB(0, y, w2, 1, dstRow, 0, w2)
      y += 1
    }
    val bos = new ByteArrayOutputStream(128 + w2 * h2 / 8)
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Deterministic two-band RGB PNG: rows [0, h/2) are (r1,g1,b1), rows
    * [h/2, h) are (r2,g2,b2). Real javax.imageio PNG encode — used to
    * synthesize oracle-checkable images in SQL (PNG is lossless, so the
    * encoder's byte choices never affect decoded pixels). */
  def makePng(w: Int, h: Int, r1: Int, g1: Int, b1: Int,
              r2: Int, g2: Int, b2: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"bad png size ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val top = ((r1 & 0xff) << 16) | ((g1 & 0xff) << 8) | (b1 & 0xff)
    val bot = ((r2 & 0xff) << 16) | ((g2 & 0xff) << 8) | (b2 & 0xff)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      java.util.Arrays.fill(row, if (y < h / 2) top else bot)
      img.setRGB(0, y, w, 1, row, 0, w)
      y += 1
    }
    val bos = new ByteArrayOutputStream(128 + w * h / 8)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
