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
  def imageMeta(bytes: Array[Byte]): (Option[Int], Option[Int], String) =
    graft.sql.MediaOps.imageMetaTuple(bytes)

  /** Adds decoded_w/decoded_h/detected_fmt from real header parsing via the
    * codegen'd `img_meta` kernel — stays inside WholeStageCodegen, pipelined
    * with the scan; column pruning and pushdown flow through (vs the old
    * `mapPartitions`, which severed both). */
  def withImageMeta(df: DataFrame, bytesCol: String): DataFrame = {
    graft.sql.Geo.register(df.sparkSession)
    df.withColumn("__img_meta", call_function("img_meta", col(bytesCol)))
      .withColumn("decoded_w", col("__img_meta.decoded_w"))
      .withColumn("decoded_h", col("__img_meta.decoded_h"))
      .withColumn("detected_fmt", col("__img_meta.detected_fmt"))
      .drop("__img_meta")
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
