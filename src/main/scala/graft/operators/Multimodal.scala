package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The decode paths the JVM can serve are REAL, all codegen'd kernels:
  * image header parse (`img_meta`) and pixel features (`img_features`,
  * javax.imageio PNG/JPEG); audio metadata + windowed amplitude features
  * (`wav_meta`/`audio_features`, RIFF/WAVE PCM16); video metadata + frame
  * sampling with pooled luma features (`video_meta`/`frame_features`,
  * uncompressed YUV4MPEG2). Only COMPRESSED-codec frame decode — for which
  * the JVM ships no decoder — remains a clearly-marked deterministic stub
  * with the real schema/batch contract.
  *
  * At 100 TB these run pipelined with the scan (kernels) or as
  * per-partition batch transforms (`mapPartitions`, the Scala analog of
  * `mapInPandas` batches): no shuffle, payload bytes never leave the
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

  /** REAL pixel feature extraction for the formats the JDK ships (PNG and
    * JPEG via javax.imageio): decode + grid-pooled luminance means as the
    * codegen'd `img_features` kernel — pipelined with the scan, column
    * pruning flows through, undecodable payloads yield null. See
    * [[graft.sql.MediaOps.imgFeatures]] for the exact (oracle-replicable)
    * pooling arithmetic. */
  def withImageFeatures(df: DataFrame, bytesCol: String, dim: Int): DataFrame = {
    graft.sql.Geo.register(df.sparkSession)
    df.withColumn("features",
      call_function("img_features", col(bytesCol), lit(dim)))
  }

  /** Adds WAV metadata (channels/sample_rate/bits/n_frames/detected_fmt)
    * from real RIFF chunk-walking via the codegen'd `wav_meta` kernel. */
  def withAudioMeta(df: DataFrame, bytesCol: String): DataFrame = {
    graft.sql.Geo.register(df.sparkSession)
    df.withColumn("audio_meta", call_function("wav_meta", col(bytesCol)))
  }

  /** REAL audio feature extraction (PCM16 WAV): windowed mean-amplitude
    * features via the codegen'd `audio_features` kernel — pipelined with
    * the scan like `img_features`; non-PCM16 payloads yield null. */
  def withAudioFeatures(df: DataFrame, bytesCol: String, dim: Int): DataFrame = {
    graft.sql.Geo.register(df.sparkSession)
    df.withColumn("features",
      call_function("audio_features", col(bytesCol), lit(dim)))
  }

  /** REAL video frame sampling: the `frame_features` kernel decodes every
    * `everyN`-th frame and pools it to a `dim`-float feature vector in one
    * pass — uncompressed YUV4MPEG2 luma planes directly, COMPRESSED
    * RIFF/AVI containers (PNG and Motion-JPEG streams) through
    * javax.imageio per sampled frame. The result explodes to one row per
    * sampled frame (`frame_idx`, `features`). All codegen — no
    * `mapPartitions`, pruning/pushdown flow through. Only codecs with no
    * JVM decoder (H.264/HEVC) fall back to [[sampleFramesStub]]. */
  def sampleFrames(df: DataFrame, bytesCol: String, everyN: Int,
                   dim: Int): DataFrame = {
    graft.sql.Geo.register(df.sparkSession)
    df.withColumn("__frames",
        explode(call_function("frame_features", col(bytesCol), lit(everyN),
          lit(dim))))
      .withColumn("frame_idx", col("__frames.frame_idx"))
      .withColumn("features", col("__frames.features"))
      .drop("__frames")
  }

  /** STUB — frame sampling for codecs the JVM ships NO decoder for
    * (MP4/H.264/HEVC…): emits `everyN`-th "frame" reference with correct
    * explode semantics (one output row per sampled frame, frame_idx
    * column). Real frame decode would slot into the marked line. For
    * uncompressed Y4M AND compressed AVI (PNG/MJPEG) payloads use the
    * real [[sampleFrames]]. */
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
