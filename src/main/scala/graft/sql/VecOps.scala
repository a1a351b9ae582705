package graft.sql

import org.apache.spark.sql.catalyst.util.ArrayData

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
}
