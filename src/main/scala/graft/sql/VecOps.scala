package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Embedding-vector kernels (`Array[Float]` columns) for similarity search.
  * Double accumulation in index order — deterministic and matching the
  * DuckDB oracle's evaluation order. */
object VecOps {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0 || nb == 0) 0.0 else dot(a, b) / (na * nb)
  }

  def l2Sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Index (0..nlist-1) of the max-cosine centroid in a flattened row-major
    * centroid matrix (nlist*dim floats), ties to the lowest index. Runs as
    * one codegen'd projection against the literal/broadcast codebook — the
    * IVF assignment path with ZERO shuffle (vs crossJoin+window, which
    * materializes corpus*nlist rows). */
  def argmaxCentroid(v: ArrayData, centroids: ArrayData): Int = {
    val dim = v.numElements()
    if (dim == 0) return 0
    val nlist = centroids.numElements() / dim
    val nv = norm(v)
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < nlist) {
      val sim = centroidCosine(v, centroids, c, dim, nv)
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** Index of the min-L2² centroid in a flattened row-major codebook
    * (k*dim floats), ties to the lowest index — the k-means assignment
    * step (Lloyd's iterations minimize squared Euclidean distance;
    * [[argmaxCentroid]]'s cosine is the IVF probe metric). Double
    * accumulation in index order, so the DuckDB oracle can fold the same
    * terms in the same order and match the argmin bit-exactly. */
  def argminL2(v: ArrayData, centroids: ArrayData): Int = {
    val dim = v.numElements()
    if (dim == 0) return 0
    val k = centroids.numElements() / dim
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      val base = c * dim
      while (i < dim) {
        val d = v.getFloat(i).toDouble - centroids.getFloat(base + i).toDouble
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Per-dimension fixed-point quantization `floor(v·2^scaleBits + 0.5)`
    * as longs. Integer partial sums are ADDITION-ORDER-FREE, which is what
    * makes the distributed k-means centroid update deterministic under any
    * partitioning / retry schedule (double sums are not). Exact arithmetic:
    * a float's 24-bit mantissa scaled by a power of two stays exact in
    * double, so both engines compute identical longs. */
  def fixedPoint(v: ArrayData, scaleBits: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    val scale = (1L << scaleBits).toDouble
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getFloat(i).toDouble * scale + 0.5).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** The `nprobe` nearest centroid indices for a query vector, descending
    * similarity, ties to the lowest index. */
  def topCentroids(v: ArrayData, centroids: ArrayData, nprobe: Int): ArrayData = {
    val dim = v.numElements()
    if (dim == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.empty[Int])
    val nlist = centroids.numElements() / dim
    val nv = norm(v)
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) { sims(c) = centroidCosine(v, centroids, c, dim, nv); c += 1 }
    val n = math.min(nprobe, nlist)
    val out = new Array[Int](n)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < n) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      c = 0
      while (c < nlist) {
        if (!taken(c) && sims(c) > bestSim) { bestSim = sims(c); best = c }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def centroidCosine(v: ArrayData, centroids: ArrayData, c: Int,
                             dim: Int, nv: Double): Double = {
    var dot = 0.0
    var nc = 0.0
    var i = 0
    val base = c * dim
    while (i < dim) {
      val cv = centroids.getFloat(base + i).toDouble
      dot += v.getFloat(i).toDouble * cv
      nc += cv * cv
      i += 1
    }
    if (nv == 0 || nc == 0) 0.0 else dot / (nv * math.sqrt(nc))
  }

  val sq8Type: StructType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("vmin", FloatType, nullable = false),
    StructField("vmax", FloatType, nullable = false)))

  /** Scalar (int8) quantization — the ANN memory/bandwidth scale path: a
    * float vector compressed to one byte per dimension plus its (vmin,
    * vmax) range, 4× smaller than float32. Quantization arithmetic is a
    * fixed sequence of correctly-rounded double ops
    * (`floor(((v - vmin) * 255) / (vmax - vmin) + 0.5)`, clamped), so
    * codes are bit-reproducible and the DuckDB oracle replicates them. */
  def sq8(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var vmin = Float.PositiveInfinity
    var vmax = Float.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = v.getFloat(i)
      if (x < vmin) vmin = x
      if (x > vmax) vmax = x
      i += 1
    }
    if (n == 0) { vmin = 0f; vmax = 0f }
    val scale = vmax.toDouble - vmin.toDouble
    val codes = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        val t = ((v.getFloat(i).toDouble - vmin.toDouble) * 255.0) / scale
        val q = math.floor(t + 0.5)
        codes(i) = math.max(0.0, math.min(255.0, q)).toInt.toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](codes, vmin, vmax))
  }

  /** Asymmetric SQ8 cosine: the corpus side dequantized on the fly
    * (`vmin + (code * scale) / 255`), the query side exact float — double
    * accumulation in index order, same discipline as [[cosine]]. */
  def sq8Cosine(codes: Array[Byte], vmin: Float, vmax: Float,
                q: ArrayData): Double = {
    val n = math.min(codes.length, q.numElements())
    val scale = vmax.toDouble - vmin.toDouble
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val d = vmin.toDouble + ((codes(i) & 0xff).toDouble * scale) / 255.0
      val qv = q.getFloat(i).toDouble
      dot += d * qv
      na += d * d
      nb += qv * qv
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane LSH bucket: sign bits of `bits` seeded pseudo-random
    * hyperplane dot products (deterministic from the seed — the IVF/LSH
    * scale path for ANN; SURVEY.md training-data ops). */
  def lshBucket(a: ArrayData, bits: Int, seed: Long): Long = {
    val n = a.numElements()
    var out = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < n) {
        // deterministic pseudo-gaussian-ish weight in [-1,1)
        val h = GeoOps.splitmix64(seed ^ (b.toLong << 32) ^ i)
        val w = (h >> 11).toDouble / (1L << 52).toDouble // [-1,1)
        s += a.getFloat(i).toDouble * w
        i += 1
      }
      if (s > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Deterministic Rademacher (±1) random projection — the
    * Johnson-Lindenstrauss dimensionality reduction for the ANN toolkit:
    * `out[j] = (1/sqrt(outDim)) * Σ_i ±v[i]`, signs from the low bit of
    * `splitmix64(seed ^ (j * 1000003 + i))`. Achlioptas-style ±1 entries
    * preserve pairwise distances in expectation like Gaussian entries but
    * keep the arithmetic EXACT-replicable: double accumulation in index
    * order, one final scale, float cast — the DuckDB oracle (q86) rebuilds
    * every output coordinate bit-for-bit. Shrinking 64-d embeddings to
    * 16-d cuts brute-force/rerank bandwidth 4× ahead of any bucketing. */
  def project(a: ArrayData, outDim: Int, seed: Long): ArrayData = {
    if (a == null || outDim <= 0) return null
    val n = a.numElements()
    val out = new Array[Float](outDim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val h = GeoOps.splitmix64(seed ^ (j.toLong * 1000003L + i))
        val v = a.getFloat(i).toDouble
        s += (if ((h & 1L) == 1L) v else -v)
        i += 1
      }
      out(j) = (s * scale).toFloat
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
