package graft.sources

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sql.{Geo, GeoOps}

/** Deterministic synthesis of the north-rule input table (BASELINE.json
  * `input_hint`): `(image_id, bytes, w, h, fmt, caption, phash)` + derived
  * point geometry, seed=42, per FIXTURES.md §4 — plus the synthetic polygon
  * overlay layer of FIXTURES.md §5.
  *
  * Generation is a `spark.range` projection: fully distributed, no driver
  * materialization, reproducible at any scale (row i's content is a pure
  * function of i). Image bytes are real PNGs (javax.imageio, lossless) when
  * `pngBytes` is set — used by the payload-parity tests — or a 64-byte
  * deterministic raw pattern for large-scale benches where per-row PNG
  * encoding would dominate the measurement. */
object ImagesTable {

  val Seed = 42L

  /** phash of row i: splitmix64 stream seeded per FIXTURES.md §4. */
  def phashOf(i: Long): Long = GeoOps.splitmix64(Seed + (i + 1) * 0x9e3779b97f4a7c15L)

  def lonOf(phash: Long): Double =
    java.lang.Long.remainderUnsigned(phash, 3600000L) / 10000.0 - 180.0

  def latOf(phash: Long): Double =
    java.lang.Long.remainderUnsigned(
      java.lang.Long.divideUnsigned(phash, 3600000L), 1700000L) / 10000.0 - 85.0

  private val Words = Array("granite", "harbor", "meadow", "lantern", "drift",
    "copper", "sparrow", "juniper", "ember", "tide", "quarry", "fern",
    "summit", "glacier", "orchard", "basalt")

  /** Deterministic caption: template + phash-selected words. */
  def caption(i: Long, phash: Long): UTF8String = {
    val w1 = Words(((phash >>> 8) & 15).toInt)
    val w2 = Words(((phash >>> 16) & 15).toInt)
    val w3 = Words(((phash >>> 24) & 15).toInt)
    UTF8String.fromString(s"caption of img $i: $w1 $w2 $w3")
  }

  /** 8x8 gray pixel pattern derived from phash (one splitmix64 step per
    * row of 8 pixels). */
  def pixelPattern(phash: Long): Array[Int] = {
    val px = new Array[Int](64)
    var r = 0
    while (r < 8) {
      val h = GeoOps.splitmix64(phash + r)
      var c = 0
      while (c < 8) {
        px(r * 8 + c) = ((h >>> (c * 8)) & 0xff).toInt
        c += 1
      }
      r += 1
    }
    px
  }

  /** Real 8x8 grayscale PNG (lossless; decoded-pixel parity is exact, which
    * satisfies PSNR>=40dB trivially). */
  def pngBytes(phash: Long): Array[Byte] = {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
    val px = pixelPattern(phash)
    var i = 0
    while (i < 64) {
      val v = px(i)
      img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new ByteArrayOutputStream(256)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-byte raw pattern (fmt="raw") for bench-scale rows. */
  def rawBytes(phash: Long): Array[Byte] = {
    val px = pixelPattern(phash)
    val out = new Array[Byte](64)
    var i = 0
    while (i < 64) { out(i) = px(i).toByte; i += 1 }
    out
  }

  def imageBytes(phash: Long, fmt: UTF8String): Array[Byte] =
    if (fmt.toString == "png") pngBytes(phash) else rawBytes(phash)

  /** Decode + PSNR vs the expected pattern (payload invariant check;
    * lossless -> exact -> +inf dB, reported as 99.0). */
  def psnrVsPattern(bytes: Array[Byte], phash: Long): Double = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val px = pixelPattern(phash)
    var mse = 0.0
    var i = 0
    while (i < 64) {
      val got = img.getRGB(i % 8, i / 8) & 0xff
      val d = (got - px(i)).toDouble
      mse += d * d
      i += 1
    }
    mse /= 64
    if (mse == 0) 99.0 else 10 * math.log10(255.0 * 255.0 / mse)
  }

  /** The images table as a distributed projection of `spark.range(n)`. */
  def generate(spark: SparkSession, n: Long, png: Boolean = false,
               partitions: Int = 0): DataFrame = {
    Geo.register(spark)
    registerSynth(spark)
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base
      .withColumn("phash", call_function("synth_phash", col("id")))
      .select(
        format_string("img%09d", col("id")).as("image_id"),
        call_function("synth_image_bytes", col("phash"),
          lit(if (png) "png" else "raw")).as("bytes"),
        lit(8).as("w"), lit(8).as("h"),
        lit(if (png) "png" else "raw").as("fmt"),
        call_function("synth_caption", col("id"), col("phash")).as("caption"),
        col("phash"),
        call_function("synth_lon", col("phash")).as("lon"),
        call_function("synth_lat", col("phash")).as("lat"))
  }

  /** FIXTURES.md §5 polygon overlay: 100 convex k-gons on a deterministic
    * grid, ~10% re-centered onto one hot cell to exercise skew. The `n` /
    * radius overrides build denser layers for benchmarking. */
  def polygonLayer(spark: SparkSession, n: Int = 100, minRadius: Double = 0.5,
                   maxRadius: Double = 5.0): DataFrame = {
    Geo.register(spark)
    import spark.implicits._
    val side = math.max(1, math.ceil(math.sqrt(n / 2.0)).toInt)
    val polys = (0 until n).map { i =>
      val h = GeoOps.splitmix64(Seed ^ (i + 1).toLong)
      val hot = i % 10 == 9
      val cx = if (hot) 12.3 + (i % 7) * 0.2
        else (i % (side * 2)) * (340.0 / (side * 2)) - 160.0
      val cy = if (hot) 47.1 + (i % 5) * 0.2
        else ((i / (side * 2)) % side) * (150.0 / side) - 70.0
      val k = 4 + (java.lang.Long.remainderUnsigned(h, 9L)).toInt
      val radius = minRadius + java.lang.Long.remainderUnsigned(h >>> 8, 1000L) /
        1000.0 * (maxRadius - minRadius)
      val sb = new StringBuilder("POLYGON ((")
      (0 to k).foreach { v =>
        val ang = 2 * math.Pi * (v % k) / k
        if (v > 0) sb.append(", ")
        sb.append(cx + radius * math.cos(ang)).append(' ')
          .append(cy + radius * math.sin(ang))
      }
      sb.append("))")
      (i.toLong, sb.toString)
    }.toDF("poly_id", "wkt")
    polys.withColumn("poly", call_function("st_geomfromwkt", $"wkt"))
  }

  private val synthRegistered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[AnyRef, java.lang.Boolean]))

  /** Synthesis kernels registered as codegen-friendly functions. */
  def registerSynth(spark: SparkSession): Unit = {
    val key: AnyRef = spark.sessionState
    if (synthRegistered.contains(key)) return
    synchronized {
      import org.apache.spark.sql.catalyst.expressions.Expression
      import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
      import org.apache.spark.sql.types._
      val reg = spark.sessionState.functionRegistry
      def f(name: String, dt: DataType, method: String, types: Seq[DataType]): Unit =
        reg.createOrReplaceTempFunction(name,
          (args: Seq[Expression]) => StaticInvoke(ImagesTable.getClass, dt,
            method, args, inputTypes = types, propagateNull = true,
            returnNullable = false),
          "built-in")
      f("synth_phash", LongType, "phashOf", Seq(LongType))
      f("synth_lon", DoubleType, "lonOf", Seq(LongType))
      f("synth_lat", DoubleType, "latOf", Seq(LongType))
      f("synth_caption", StringType, "caption", Seq(LongType, LongType))
      f("synth_image_bytes", BinaryType, "imageBytes", Seq(LongType, StringType))
      synthRegistered.add(key)
    }
  }
}
