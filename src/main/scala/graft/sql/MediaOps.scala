package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multimodal (binary payload) kernels, `StaticInvoke`-shaped like every
  * other kernel so image metadata extraction runs inside whole-stage
  * codegen, pipelined with the scan — no `mapPartitions` boundary, column
  * pruning flows through. Header parsing is a real decoder (PNG IHDR, JPEG
  * SOF0/SOF2 markers) needing no media library. */
object MediaOps {

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
}
