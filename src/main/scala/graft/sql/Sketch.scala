package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Count-min sketch aggregate — frequency estimation over keys too
  * numerous to count exactly. `depth × width` long counters; update adds 1
  * to one counter per row (`bucket_r = splitmix64(item ^ r) & (width-1)`),
  * merge is element-wise addition — integer, commutative, and associative,
  * so the sketch is invariant to partitioning/merge order/retries and the
  * q68 DuckDB oracle rebuilds every counter exactly. Query with
  * `cms_query` (min over rows — the classic upper-bound estimate).
  * Buffer is `depth*width*8` bytes regardless of input size; partial
  * aggregation collapses each partition to one sketch before the
  * exchange. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth $depth out of [1,16]")
  require(width >= 16 && (width & (width - 1)) == 0,
    s"width $width must be a power of two >= 16")

  override def prettyName: String = "cms_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + (GeoOps.splitmix64(item ^ r) & (width - 1)).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

/** Bloom membership sketch — the join-pruning / decontamination-prefilter
  * sibling of the CMS (frequency) and HLL (distinct) sketches. `m` bits
  * (power of two) in m/64 long words, `k` probes per item via DOUBLE
  * hashing: `bit_r = (h1 + r·h2) & (m-1)` with `h1 = splitmix64(item)`,
  * `h2 = splitmix64(h1) | 1`. NOT `splitmix64(item ^ r)` — the xor form's
  * preimages collide across numerically-close items (`i^1 == (i+1)^0`),
  * which the spec measured as a ~20× false-positive inflation on
  * arithmetic-progression ids; double hashing needs a full 64-bit
  * collision to correlate. Update sets bits, merge ORs words —
  * idempotent, commutative, associative, so the sketch is invariant to
  * partitioning, merge order, retries AND double-counted rows, and the
  * q149 DuckDB oracle rebuilds every word exactly (distinct powers of two
  * summed in HUGEINT, wrapped to the signed word). No false negatives
  * ever; false-positive rate ~(1-e^{-kn/m})^k. Query with
  * `bloom_contains`. */
case class BloomSketchAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    s"mBits $mBits must be a power of two >= 64")
  require(k >= 1 && k <= 32, s"k $k out of [1,32]")

  override def prettyName: String = "bloom_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      val h1 = GeoOps.splitmix64(item)
      val h2 = GeoOps.splitmix64(h1) | 1L
      var r = 0
      while (r < k) {
        val b = ((h1 + r * h2) & (mBits - 1)).toInt
        buf(b >>> 6) |= 1L << (b & 63)
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketchAgg =
    copy(child = newChild)
}

/** Element-wise sum of fixed-point vectors (`array<long>`) as a custom
  * Catalyst aggregate — the k-means centroid update without exploding
  * rows×dim through the shuffle: each partition folds its vectors into
  * ONE dim+1 long buffer (slot 0 = row count), partials merge by
  * element-wise addition (commutative/associative integers — invariant to
  * partitioning, merge order and retries), and the exchange carries k
  * buffers instead of k·dim·rows exploded rows. Null vectors are skipped;
  * the buffer sizes itself to the first vector seen (shorter inputs
  * contribute zeros to missing trailing dims). */
case class VecFixedSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "vec_fixedsum_agg"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val dim = arr.numElements()
    val b = if (buf.length >= dim + 1) buf
      else java.util.Arrays.copyOf(buf, dim + 1)
    b(0) += 1L
    var i = 0
    while (i < dim) { b(i + 1) += arr.getLong(i); i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.length == 0) return a
    val out = if (a.length >= b.length) a
      else java.util.Arrays.copyOf(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }

  override def eval(buf: Array[Long]): Any = {
    val n = if (buf.length == 0) 0L else buf(0)
    val sums = if (buf.length == 0) Array.empty[Long]
      else java.util.Arrays.copyOfRange(buf, 1, buf.length)
    org.apache.spark.sql.catalyst.InternalRow(n,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(sums))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecFixedSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecFixedSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): VecFixedSumAgg =
    copy(child = newChild)
}

/** HyperLogLog distinct-count sketch as a custom Catalyst aggregate (the
  * "novel sketch" operator class) — single-pass, mergeable, groupBy-able.
  *
  * Deliberately bit-reproducible where stock HLL implementations are not:
  * the hash is the engine's splitmix64, registers merge by max (commutative
  * and idempotent, so the result is independent of partitioning, merge
  * order, and retries), and the final harmonic sum runs in fixed register
  * order over exact powers of two — which lets the q67 DuckDB oracle
  * rebuild every register and the estimate itself exactly (vs
  * `approx_count_distinct`, whose HLL++ registers no other engine can
  * replicate). Raw Flajolet et al. estimator, no empirical bias table
  * (both engines compute the same formula; accuracy is the standard
  * ~1.04/sqrt(m)).
  *
  * Returns struct(estimate, reg_checksum, zero_regs): the checksum
  * `sum((b+1) * M_b)` pins every register, so a single wrong register
  * fails the oracle even if the estimate happens to coincide.
  *
  * At 100 TB: the buffer is 2^p bytes (256 B at p=8) regardless of input
  * size; partial aggregation reduces each partition to one buffer before
  * the exchange. */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision p=$p out of [4,16]")
  private val m = 1 << p

  override def prettyName: String = "hll_sketch"
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("reg_checksum", LongType, nullable = false),
    StructField("zero_regs", IntegerType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = GeoOps.splitmix64(v.asInstanceOf[Long])
      val bucket = (h >>> (64 - p)).toInt
      val w0 = h & ((1L << (64 - p)) - 1)
      val rho =
        if (w0 == 0) 64 - p + 1
        else java.lang.Long.numberOfLeadingZeros(w0) - p + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // harmonic sum in fixed register order; 2^-M terms are exact dyadics
    var sum = 0.0
    var zeros = 0
    var checksum = 0L
    var b = 0
    while (b < m) {
      val reg = buf(b).toInt
      sum += 1.0 / (1L << reg)
      if (reg == 0) zeros += 1
      checksum += (b + 1).toLong * reg
      b += 1
    }
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    // m^2 as one exact double literal so the op sequence (one multiply,
    // one divide) matches the oracle's exactly
    val raw = alpha * (1L << (2 * p)).toDouble / sum
    // small-range correction (linear counting) uses ln: JVM vs libm ulps
    // differ, so the q67 oracle sizes its input to stay out of this branch
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    new GenericInternalRow(Array[Any](est, checksum, zeros))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}
