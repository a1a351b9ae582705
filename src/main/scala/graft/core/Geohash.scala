package graft.core

/** Geohash codec (public base32 geocode, Niemeyer 2008).
  *
  * Quantization is FLOOR-SCALED — `q = floor((v - lo) / span · 2^nbits)`,
  * clamped into [0, 2^nbits) — instead of the classic per-bit bisection.
  * The two agree everywhere except inputs within one rounding ulp of a
  * cell boundary (where bisection's midpoint arithmetic may differ by one
  * cell); floor scaling is one pinned IEEE expression, which makes every
  * hash bit-replicable by the DuckDB oracle (q127) and keeps encode O(1)
  * per ordinate instead of O(bits).
  *
  * Decode is exact: cell edges are `lo + q · (span / 2^nbits)` where
  * `span / 2^nbits` is a representable dyadic (360 = 45·2^3) and the
  * product/sum stay within 53 mantissa bits for every precision ≤ 12 —
  * no rounding anywhere on the decode path.
  */
object Geohash {
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  val MaxPrecision = 12 // 60 bits: nlon 30 + nlat 30

  private def quant(v: Double, lo: Double, span: Double, nbits: Int): Long = {
    val m = (1L << nbits).toDouble
    val q = math.floor((v - lo) / span * m).toLong
    if (q < 0L) 0L else if (q >= (1L << nbits)) (1L << nbits) - 1 else q
  }

  /** Encode (lon, lat) at `precision` characters (1..12). */
  def encode(lon: Double, lat: Double, precision: Int): String = {
    require(precision >= 1 && precision <= MaxPrecision,
      s"geohash precision must be 1..$MaxPrecision: $precision")
    require(!lon.isNaN && !lat.isNaN, "geohash of NaN ordinate")
    val nlon = (5 * precision + 1) / 2
    val nlat = 5 * precision / 2
    val qlon = quant(lon, -180.0, 360.0, nlon)
    val qlat = quant(lat, -90.0, 180.0, nlat)
    val sb = new java.lang.StringBuilder(precision)
    var j = 0
    while (j < precision) {
      var code = 0
      var u = 0
      while (u < 5) {
        val t = 5 * j + u
        val bit =
          if ((t & 1) == 0) (qlon >> (nlon - 1 - t / 2)) & 1L
          else (qlat >> (nlat - 1 - (t - 1) / 2)) & 1L
        code = (code << 1) | bit.toInt
        u += 1
      }
      sb.append(Alphabet.charAt(code))
      j += 1
    }
    sb.toString
  }

  /** Decode a hash to its cell box (xmin, ymin, xmax, ymax) — exact
    * dyadic edges. Throws on invalid characters or length. */
  def decodeBox(hash: String): Array[Double] = {
    val p = hash.length
    require(p >= 1 && p <= MaxPrecision,
      s"geohash length must be 1..$MaxPrecision: '$hash'")
    val nlon = (5 * p + 1) / 2
    val nlat = 5 * p / 2
    var qlon = 0L
    var qlat = 0L
    var t = 0
    var j = 0
    while (j < p) {
      val c = hash.charAt(j)
      val code = Alphabet.indexOf(
        if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      require(code >= 0, s"invalid geohash character '$c' in '$hash'")
      var u = 4
      while (u >= 0) {
        val bit = (code >> u) & 1
        if ((t & 1) == 0) qlon = (qlon << 1) | bit
        else qlat = (qlat << 1) | bit
        t += 1
        u -= 1
      }
      j += 1
    }
    val wlon = 360.0 / (1L << nlon).toDouble
    val wlat = 180.0 / (1L << nlat).toDouble
    Array(
      -180.0 + qlon.toDouble * wlon,
      -90.0 + qlat.toDouble * wlat,
      -180.0 + (qlon + 1L).toDouble * wlon,
      -90.0 + (qlat + 1L).toDouble * wlat)
  }
}
