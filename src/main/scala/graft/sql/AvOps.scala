package graft.sql

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio/video payload kernels — the non-image legs of the multimodal
  * contract. Like [[MediaOps]], every entry is `StaticInvoke`-shaped so it
  * runs inside whole-stage codegen, pipelined with the scan: payload bytes
  * never cross a shuffle and column pruning flows through.
  *
  * These are REAL decoders for what a JVM can parse without any media
  * library: RIFF/WAVE PCM for audio, YUV4MPEG2 (uncompressed planar YUV)
  * for video, and RIFF/AVI containers whose frames are PNG ('MPNG') or
  * Motion-JPEG ('MJPG') — the container walk is hand-parsed and each
  * sampled frame decodes through javax.imageio, a genuine
  * compressed-codec path. Only codecs the JVM ships no decoder for
  * (MP3/AAC/H.264…) stay behind the clearly-marked stub in
  * [[graft.operators.Multimodal.sampleFramesStub]].
  *
  * Feature arithmetic is integer-sum-then-one-division (same discipline as
  * `img_features`): each value is one correctly-rounded IEEE division of an
  * exactly-accumulated rational, so results are bit-reproducible and the
  * DuckDB oracle can replicate them (q49/q56). */
object AvOps {

  // ------------------------------------------------------------- WAV audio

  val wavMetaType: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("detected_fmt", StringType, nullable = false)))

  private def unknownWav: InternalRow = new GenericInternalRow(
    Array[Any](null, null, null, null, UTF8String.fromString("unknown")))

  /** Parse a RIFF/WAVE header: walks chunks (skipping LIST/fact/…,
    * honoring even padding) to the `fmt ` and `data` chunks. Returns
    * (channels, sample_rate, bits_per_sample, n_frames, "wav");
    * non-WAV/truncated payloads yield nulls + "unknown". */
  def wavMeta(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 12) return unknownWav
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != 0x46464952 /* RIFF */ ||
        bb.getInt(8) != 0x45564157 /* WAVE */) return unknownWav
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataLen = -1L
    var p = 12
    while (p + 8 <= bytes.length) {
      val id = bb.getInt(p)
      val len = bb.getInt(p + 4).toLong & 0xffffffffL
      if (id == 0x20746d66 /* "fmt " */ && p + 8 + 16 <= bytes.length) {
        channels = bb.getShort(p + 10) & 0xffff
        rate = bb.getInt(p + 12)
        blockAlign = bb.getShort(p + 20) & 0xffff
        bits = bb.getShort(p + 22) & 0xffff
      } else if (id == 0x61746164 /* "data" */ ) {
        dataLen = math.min(len, (bytes.length - p - 8).toLong)
      }
      p += 8 + len.toInt + (len.toInt & 1) // chunks are even-padded
      if (len < 0 || len > bytes.length) p = bytes.length // corrupt size
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataLen < 0) return unknownWav
    val frameBytes = if (blockAlign > 0) blockAlign else channels * (bits / 8)
    val frames = if (frameBytes > 0) (dataLen / frameBytes).toInt else 0
    new GenericInternalRow(Array[Any](channels, rate, bits, frames,
      UTF8String.fromString("wav")))
  }

  /** Windowed mean-|amplitude| features over 16-bit PCM: the `n` frames
    * (channel-0 samples) split into `dim` windows by the same integer map
    * `img_features` uses for pooling (`w = min(dim-1, i*dim/n)`); each
    * feature is `sum(|s_i|) / (32768.0 * count)` — exact integer sum, one
    * correctly-rounded division, one double→float cast. Null for non-PCM16
    * or empty payloads. */
  def audioFeatures(bytes: Array[Byte], dim: Int): ArrayData = {
    if (bytes == null || dim <= 0) return null
    val meta = wavMeta(bytes)
    if (meta.isNullAt(0) || meta.getInt(2) != 16) return null
    val channels = meta.getInt(0)
    val dataOff = findDataOffset(bytes)
    if (dataOff < 0) return null
    // clamp the frame count to what the buffer can actually serve at the
    // channels*2 read stride: wavMeta derives n_frames from blockAlign,
    // and a malformed header (blockAlign inconsistent with channels/bits)
    // must degrade to fewer frames, never read past the payload
    val n = math.min(meta.getInt(3).toLong,
      (bytes.length - dataOff).toLong / (channels * 2)).toInt
    if (n <= 0) return null
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < n) {
      val s = bb.getShort(dataOff + i * channels * 2).toInt
      val w = math.min(dim - 1, (i.toLong * dim / n).toInt)
      sums(w) += math.abs(s)
      counts(w) += 1
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      out(j) = if (counts(j) > 0)
        (sums(j).toDouble / (32768.0 * counts(j))).toFloat else 0f
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def findDataOffset(bytes: Array[Byte]): Int = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var p = 12
    while (p + 8 <= bytes.length) {
      val id = bb.getInt(p)
      val len = bb.getInt(p + 4).toLong & 0xffffffffL
      if (id == 0x61746164 /* "data" */ ) return p + 8
      if (len < 0 || len > bytes.length) return -1
      p += 8 + len.toInt + (len.toInt & 1)
    }
    -1
  }

  /** Deterministic PCM16 WAV synthesis (oracle-checkable test audio):
    * frame i of every channel carries `((a*i + b) mod 65536) - 32768` —
    * plain modular integer arithmetic both engines replicate exactly. */
  def makeWav(nFrames: Int, sampleRate: Int, channels: Int,
              a: Int, b: Int): Array[Byte] = {
    require(nFrames >= 0 && nFrames <= (1 << 22), s"bad frame count $nFrames")
    require(channels >= 1 && channels <= 8, s"bad channel count $channels")
    val dataLen = nFrames * channels * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    bb.putInt(0x20746d66).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.putInt(0x61746164).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      val s = ((((a.toLong * i + b) % 65536) + 65536) % 65536 - 32768).toShort
      var c = 0
      while (c < channels) { bb.putShort(s); c += 1 }
      i += 1
    }
    bb.array()
  }

  // --------------------------------------------------- YUV4MPEG2 video

  val videoMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("fps_num", IntegerType, nullable = true),
    StructField("fps_den", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("detected_fmt", StringType, nullable = false)))

  private def unknownVideo: InternalRow = new GenericInternalRow(
    Array[Any](null, null, null, null, null, UTF8String.fromString("unknown")))

  private val Y4mMagic = "YUV4MPEG2".getBytes("US-ASCII")

  /** Parsed Y4M stream header + frame geometry. */
  private case class Y4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
                         chromaDiv: Int, headerEnd: Int) {
    def frameBytes: Int = w * h + (if (chromaDiv == 0) 0 else 2 * (w * h / chromaDiv))
  }

  private def parseY4mHeader(bytes: Array[Byte]): Option[Y4m] = {
    if (bytes == null || bytes.length < Y4mMagic.length + 1) return None
    var i = 0
    while (i < Y4mMagic.length) {
      if (bytes(i) != Y4mMagic(i)) return None
      i += 1
    }
    var end = i
    while (end < bytes.length && bytes(end) != '\n') end += 1
    if (end >= bytes.length) return None
    val header = new String(bytes, i, end - i, "US-ASCII")
    var w = -1; var h = -1; var num = 30; var den = 1; var chromaDiv = 4
    header.split(' ').filter(_.nonEmpty).foreach { p =>
      try p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'F' =>
          val fr = p.substring(1).split(':')
          num = fr(0).toInt; den = fr(1).toInt
        case 'C' => // chroma subsampling: plane-size divisor vs luma
          val c = p.substring(1)
          chromaDiv = if (c.startsWith("420")) 4
            else if (c.startsWith("422")) 2
            else if (c.startsWith("444")) 1
            else if (c == "mono") 0
            else return None
        case _ => // I/A/X params don't affect geometry
      } catch { case _: Exception => return None }
    }
    if (w <= 0 || h <= 0 || den <= 0) None
    else Some(Y4m(w, h, num, den, chromaDiv, end + 1))
  }

  private val FrameMagic = "FRAME".getBytes("US-ASCII")

  /** Offset of frame `idx`'s luma plane, or -1. Walks FRAME markers
    * (optional per-frame params up to the newline). */
  private def framePlaneOffset(bytes: Array[Byte], y4m: Y4m, idx: Int): Int = {
    var p = y4m.headerEnd
    var f = 0
    while (p + FrameMagic.length <= bytes.length) {
      var i = 0
      while (i < FrameMagic.length && bytes(p + i) == FrameMagic(i)) i += 1
      if (i < FrameMagic.length) return -1
      var e = p + FrameMagic.length
      while (e < bytes.length && bytes(e) != '\n') e += 1
      if (e >= bytes.length) return -1
      val plane = e + 1
      if (plane + y4m.frameBytes > bytes.length) return -1
      if (f == idx) return plane
      f += 1
      p = plane + y4m.frameBytes
    }
    -1
  }

  private def countFrames(bytes: Array[Byte], y4m: Y4m): Int = {
    var p = y4m.headerEnd
    var f = 0
    var ok = true
    while (ok && p + FrameMagic.length <= bytes.length) {
      var i = 0
      while (i < FrameMagic.length && bytes(p + i) == FrameMagic(i)) i += 1
      if (i < FrameMagic.length) ok = false
      else {
        var e = p + FrameMagic.length
        while (e < bytes.length && bytes(e) != '\n') e += 1
        if (e >= bytes.length || e + 1 + y4m.frameBytes > bytes.length) ok = false
        else { f += 1; p = e + 1 + y4m.frameBytes }
      }
    }
    f
  }

  /** Real video metadata: YUV4MPEG2 header parse + frame count by walking
    * FRAME markers, or RIFF/AVI container parse (compressed streams).
    * Other payloads yield nulls + "unknown". */
  def videoMeta(bytes: Array[Byte]): InternalRow = parseY4mHeader(bytes) match {
    case Some(y4m) => new GenericInternalRow(Array[Any](
      y4m.w, y4m.h, y4m.fpsNum, y4m.fpsDen, countFrames(bytes, y4m),
      UTF8String.fromString("y4m")))
    case None => parseAvi(bytes) match {
      case Some(avi) => aviMeta(avi)
      case None => unknownVideo
    }
  }

  val frameFeaturesType: ArrayType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false))), containsNull = false)

  /** REAL frame sampling + features. Uncompressed Y4M: every `everyN`-th
    * frame's luma plane pooled over a grid exactly like `img_features`
    * (luma already is the Y channel, so each feature is
    * `sum(Y) / (255.0 * count)`). COMPRESSED AVI ('MPNG'/'MJPG'): each
    * sampled frame chunk decodes via javax.imageio and pools BT.601
    * luminance ([[aviFrameFeatures]]). Returns array<struct<frame_idx,
    * features>> — explode it for one row per sampled frame. Null for
    * unrecognized payloads. */
  def frameFeatures(bytes: Array[Byte], everyN: Int, dim: Int): ArrayData = {
    if (bytes == null || everyN <= 0 || dim <= 0) return null
    val y4m = parseY4mHeader(bytes) match {
      case Some(v) => v
      case None => parseAvi(bytes) match {
        case Some(avi) => return aviFrameFeatures(bytes, avi, everyN, dim)
        case None => return null
      }
    }
    val nFrames = countFrames(bytes, y4m)
    val gw = math.ceil(math.sqrt(dim.toDouble)).toInt
    val gh = math.ceil(dim.toDouble / gw).toInt
    // one incremental walk: carry the marker cursor across sampled frames
    // instead of re-scanning from the header per frame (O(F), not O(F^2))
    var cursor = 0
    var cursorOff = framePlaneOffset(bytes, y4m, 0)
    val rows = Range(0, nFrames, everyN).map { f =>
      while (cursor < f && cursorOff >= 0) {
        var e = cursorOff + y4m.frameBytes + FrameMagic.length
        while (e < bytes.length && bytes(e) != '\n') e += 1
        cursorOff = if (e + 1 + y4m.frameBytes <= bytes.length) e + 1 else -1
        cursor += 1
      }
      val off = cursorOff
      val sums = new Array[Long](gw * gh)
      val counts = new Array[Long](gw * gh)
      var y = 0
      while (y < y4m.h) {
        val cy = math.min(gh - 1, y * gh / y4m.h)
        var x = 0
        while (x < y4m.w) {
          val cell = cy * gw + math.min(gw - 1, x * gw / y4m.w)
          sums(cell) += bytes(off + y * y4m.w + x) & 0xff
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val feats = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        feats(j) = if (j < gw * gh && counts(j) > 0)
          (sums(j).toDouble / (255.0 * counts(j))).toFloat else 0f
        j += 1
      }
      new GenericInternalRow(Array[Any](f,
        UnsafeArrayData.fromPrimitiveArray(feats))): Any
    }
    new GenericArrayData(rows.toArray)
  }

  /** Deterministic two-band Y4M synthesis (oracle-checkable test video,
    * C420): frame f's luma is `(seed + 7f) mod 256` on the top half rows
    * and `(seed + 13f) mod 256` on the bottom half; chroma planes constant
    * 128. Mirrors [[MediaOps.makePng]]'s banded design so pooled means are
    * analytic. */
  def makeY4m(w: Int, h: Int, nFrames: Int, seed: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0 &&
      w <= 1024 && h <= 1024, s"bad y4m size ${w}x$h")
    require(nFrames >= 0 && nFrames <= 4096, s"bad frame count $nFrames")
    val header = s"YUV4MPEG2 W$w H$h F30:1 Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII")
    val frameBytes = w * h + w * h / 2
    val out = ByteBuffer.allocate(
      header.length + nFrames * (6 + frameBytes))
    out.put(header)
    var f = 0
    while (f < nFrames) {
      out.put("FRAME\n".getBytes("US-ASCII"))
      val top = (((seed + 7L * f) % 256 + 256) % 256).toByte
      val bot = (((seed + 13L * f) % 256 + 256) % 256).toByte
      var y = 0
      while (y < h) {
        val v = if (y < h / 2) top else bot
        var x = 0
        while (x < w) { out.put(v); x += 1 }
        y += 1
      }
      var c = 0
      while (c < w * h / 2) { out.put(128.toByte); c += 1 }
      f += 1
    }
    out.array()
  }

  // ------------------------------------- AVI (COMPRESSED video container)

  /** Parsed AVI: geometry from `avih`, per-frame compressed chunk slices
    * from the `movi` list. */
  private case class Avi(w: Int, h: Int, usPerFrame: Int,
                         offs: Array[Int], lens: Array[Int]) {
    def nFrames: Int = offs.length
  }

  private def cc(bytes: Array[Byte], at: Int): String =
    new String(bytes, at, 4, "US-ASCII")

  private def u32(bytes: Array[Byte], at: Int): Long =
    (bytes(at) & 0xffL) | ((bytes(at + 1) & 0xffL) << 8) |
      ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)

  /** Real RIFF/AVI container parse: walks the chunk tree (LIST recursion),
    * reads width/height/µs-per-frame from `avih`, collects every video
    * frame chunk (`##dc` compressed / `##db` uncompressed DIB). The frame
    * PAYLOADS stay compressed — [[frameFeatures]] hands each sampled one
    * to javax.imageio, which decodes the codecs the JVM ships (PNG for
    * lossless 'MPNG' streams, JPEG for Motion-JPEG 'MJPG'). */
  private def parseAvi(bytes: Array[Byte]): Option[Avi] = {
    if (bytes == null || bytes.length < 24) return None
    if (cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ") return None
    var w = -1; var h = -1; var us = 0
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
    def walk(from: Int, until: Int): Unit = {
      var p = from
      while (p + 8 <= until) {
        val id = cc(bytes, p)
        // size stays a Long until bounds-checked: a crafted ~2-4 GB chunk
        // size in a >1 GB payload would overflow Int in `body + sz` and
        // slip past the guard, then index at a negative offset and THROW
        // — the contract is degrade-to-unknown, never fail the stage
        val szL = u32(bytes, p + 4) // unsigned, 0..2^32-1
        val body = p + 8
        if (body.toLong + szL > until) return // truncated/corrupt: stop
        val sz = szL.toInt // safe: bounded by `until` <= array length
        if (id == "LIST") walk(body + 4, body + sz)
        else if (id == "avih" && sz >= 40) {
          us = u32(bytes, body).toInt
          w = u32(bytes, body + 32).toInt
          h = u32(bytes, body + 36).toInt
        } else if ((id.endsWith("dc") || id.endsWith("db")) &&
            id.take(2).forall(_.isDigit)) {
          offs += body; lens += sz
        }
        p = body + sz + (sz & 1) // chunks pad to even
      }
    }
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
    walk(12, riffEnd)
    if (w <= 0 || h <= 0) None
    else Some(Avi(w, h, us, offs.toArray, lens.toArray))
  }

  /** AVI leg of [[videoMeta]]: (w, h, 1000000/µsPerFrame as the fps
    * rational, frame-chunk count, "avi"). */
  private def aviMeta(avi: Avi): InternalRow = new GenericInternalRow(
    Array[Any](avi.w, avi.h, 1000000,
      if (avi.usPerFrame > 0) avi.usPerFrame else 33333,
      avi.nFrames, UTF8String.fromString("avi")))

  /** AVI leg of [[frameFeatures]]: every `everyN`-th frame chunk decodes
    * through javax.imageio (PNG/MJPEG — a REAL compressed-codec path) and
    * pools BT.601 luminance exactly like `img_features`
    * ([[MediaOps.imgFeatures]] arithmetic, so gray two-band frames stay
    * analytically oracle-able). Any undecodable sampled frame fails the
    * whole payload to null (corrupt video, not partial data). */
  private def aviFrameFeatures(bytes: Array[Byte], avi: Avi, everyN: Int,
                               dim: Int): ArrayData = {
    val rows = Range(0, avi.nFrames, everyN).map { f =>
      val slice = java.util.Arrays.copyOfRange(
        bytes, avi.offs(f), avi.offs(f) + avi.lens(f))
      val feats = MediaOps.imgFeatures(slice, dim)
      if (feats == null) return null
      new GenericInternalRow(Array[Any](f, feats)): Any
    }
    new GenericArrayData(rows.toArray)
  }

  /** Deterministic two-band AVI synthesis (the compressed analog of
    * [[makeY4m]]): frame f is a [[MediaOps.makePng]]/JPEG image, gray
    * `(seed + 7f) mod 256` on the top half and `(seed + 13f) mod 256` on
    * the bottom. `codec` 0 = PNG frames ('MPNG' stream — lossless, so
    * pooled features are analytic constants for the oracle), 1 = JPEG
    * frames ('MJPG' Motion-JPEG — lossy, exercised by tolerance tests). */
  def makeAvi(w: Int, h: Int, nFrames: Int, seed: Int,
              codec: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 1024 && h <= 1024, s"bad avi size ${w}x$h")
    require(nFrames >= 0 && nFrames <= 4096, s"bad frame count $nFrames")
    val frames = (0 until nFrames).map { f =>
      val v1 = (((seed + 7L * f) % 256 + 256) % 256).toInt
      val v2 = (((seed + 13L * f) % 256 + 256) % 256).toInt
      if (codec == 0) MediaOps.makePng(w, h, v1, v1, v1, v2, v2, v2)
      else makeJpegBands(w, h, v1, v2)
    }
    val handler = if (codec == 0) "MPNG" else "MJPG"
    def le32(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ children)
    val avih = chunk("avih",
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(nFrames) ++
        le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
        Array.fill(16)(0.toByte))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ handler.getBytes("US-ASCII") ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
        le32(nFrames) ++ le32(0) ++ le32(0) ++ le32(0) ++
        Array.fill(8)(0.toByte))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++
        ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putShort(1.toShort).putShort(24.toShort).array() ++
        handler.getBytes("US-ASCII") ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      frames.map(fb => chunk("00dc", fb)).foldLeft(Array.empty[Byte])(_ ++ _))
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload
  }

  private def makeJpegBands(w: Int, h: Int, v1: Int, v2: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      val v = if (y < h / 2) v1 else v2
      java.util.Arrays.fill(row, (v << 16) | (v << 8) | v)
      img.setRGB(0, y, w, 1, row, 0, w)
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(512 + w * h)
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}
