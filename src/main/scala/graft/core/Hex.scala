package graft.core

/** Pointy-top axial hexagonal binning (H3-style hex heatmap keys over a
  * planar lon/lat frame; the cube-rounding construction is the standard
  * public hex-grid algorithm).
  *
  * Every step is one pinned IEEE expression — fractional axial coords
  * `qf = (√3/3·x − 1/3·y)/size`, `rf = (2/3·y)/size`, cube rounding with
  * half-up `floor(v + 0.5)` (NOT libm round: half-away differs at
  * negative halves across engines) and original-value branch tests — so
  * the DuckDB oracle (q128) reproduces every cell id and center ordinate
  * bit-for-bit. `size` is the hex circumradius in the input frame's
  * units. Cell ids pack (q, r) as two int32s in one long. */
object Hex {

  def cell(x: Double, y: Double, size: Double): Long = {
    require(size > 0.0 && !size.isNaN, s"hex size must be > 0: $size")
    // NaN would flow through floor/toLong to cell (0,0) silently —
    // fail loudly like Geohash.encode does
    require(!x.isNaN && !y.isNaN, "hex cell of NaN ordinate")
    val qf = (math.sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / size
    val rf = (2.0 / 3.0 * y) / size
    val yf = -qf - rf
    val rq0 = math.floor(qf + 0.5)
    val rr0 = math.floor(rf + 0.5)
    val ry0 = math.floor(yf + 0.5)
    val dq = math.abs(rq0 - qf)
    val dr = math.abs(rr0 - rf)
    val dy = math.abs(ry0 - yf)
    val rq = if (dq > dr && dq > dy) -rr0 - ry0 else rq0
    val rr = if (!(dq > dr && dq > dy) && dr > dy) -rq0 - ry0 else rr0
    val qi = rq.toLong
    val ri = rr.toLong
    require(qi >= Int.MinValue && qi <= Int.MaxValue &&
      ri >= Int.MinValue && ri <= Int.MaxValue,
      s"hex cell out of int32 range: ($qi, $ri) — size too small for frame")
    (qi << 32) | (ri & 0xffffffffL)
  }

  def cellQ(cell: Long): Int = (cell >> 32).toInt
  def cellR(cell: Long): Int = cell.toInt

  /** Hex center in the input frame (exact inverse of the fractional
    * transform at integer axial coords). */
  def centerX(cell: Long, size: Double): Double = {
    val q = cellQ(cell).toDouble
    val r = cellR(cell).toDouble
    size * (math.sqrt(3.0) * q + math.sqrt(3.0) / 2.0 * r)
  }

  def centerY(cell: Long, size: Double): Double = {
    val r = cellR(cell).toDouble
    size * (1.5 * r)
  }
}
