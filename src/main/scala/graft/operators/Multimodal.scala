package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side plumbing (schemas, per-partition batch iteration, column
  * contracts) is real and tested; heavyweight media decoding beyond what
  * the JVM ships is STUBBED deterministically and clearly marked — this
  * container has no image/audio libraries (prompt contract), but PNG/JPEG
  * *header* parsing needs no library and is implemented for real.
  *
  * At 100 TB these run as per-partition batch transforms (`mapPartitions`
  * over the binary column — the Scala analog of `mapInPandas` batches):
  * no shuffle, pipelined with the scan, payload bytes never leave the
  * executor that read them. */
object Multimodal {

  /** Parse (w, h, detected_fmt) from the payload header. PNG IHDR and JPEG
    * SOF0/SOF2 markers parsed directly; anything else -> nulls + "unknown".
    * This is a real decoder of the header, not a stub. */
  def imageMeta(bytes: Array[Byte]): (Option[Int], Option[Int], String) = {
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

  private val metaSchema = StructType(Seq(
    StructField("decoded_w", IntegerType, nullable = true),
    StructField("decoded_h", IntegerType, nullable = true),
    StructField("detected_fmt", StringType, nullable = false)))

  /** Adds decoded_w/decoded_h/detected_fmt from real header parsing —
    * per-partition batch transform over the binary column. */
  def withImageMeta(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ metaSchema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val (w, h, fmt) = imageMeta(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq ++ Seq(w.orNull, h.orNull, fmt))
      }
    }(enc)
  }

  /** STUB — deterministic fake of pixel feature extraction (this container
    * ships no image codec beyond javax.imageio; the real implementation
    * would decode and pool pixels here). Schema, batching, and determinism
    * are the real contract: features are a pure function of the bytes. */
  def extractFeaturesStub(df: DataFrame, bytesCol: String, dim: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val features = new Array[Float](dim)
        var h = 0x9e3779b97f4a7c15L
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
        }
        var j = 0
        while (j < dim) {
          val hj = graft.sql.GeoOps.splitmix64(h + j)
          features(j) = ((hj >>> 11).toDouble / (1L << 53).toDouble).toFloat
          j += 1
        }
        Row.fromSeq(row.toSeq :+ features.toSeq)
      }
    }(enc)
  }

  /** STUB — video frame sampling: emits `everyN`-th "frame" reference with
    * correct explode semantics (one output row per sampled frame, frame_idx
    * column). Real frame decode would slot into the marked line. */
  def sampleFramesStub(df: DataFrame, bytesCol: String, frameCount: Int,
                       everyN: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        (0 until frameCount by everyN).iterator.map { f =>
          // STUB: real codec would decode frame f of `bytes` here
          val frame = if (bytes == null) null
            else java.util.Arrays.copyOfRange(bytes, 0,
              math.min(16, bytes.length))
          Row.fromSeq(row.toSeq ++ Seq(f, frame))
        }
      }
    }(enc)
  }
}
