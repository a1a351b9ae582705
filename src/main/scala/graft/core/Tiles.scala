package graft.core

/** Web-Mercator z/x/y raster tile pyramid (slippy-map scheme).
  *
  * Tile ids pack as `z << 58 | x << 29 | y` (z <= 29). Latitudes clamp to
  * the Web-Mercator limit ±85.05112878°. Covering a lon/lat box with tiles
  * is exact (x from lon, y monotone-decreasing in lat), which makes this the
  * workhorse join key for raster↔vector assignment (SURVEY.md §2C).
  */
object Tiles {
  final val MaxLat = 85.05112878

  def tileX(lon: Double, z: Int): Int = {
    val n = 1 << z
    val x = ((lon + 180.0) / 360.0 * n).toInt
    math.max(0, math.min(n - 1, x))
  }

  def tileY(lat: Double, z: Int): Int = {
    val n = 1 << z
    val clamped = math.max(-MaxLat, math.min(MaxLat, lat))
    val latRad = math.toRadians(clamped)
    val y = ((1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi)
      / 2.0 * n).toInt
    math.max(0, math.min(n - 1, y))
  }

  def pack(z: Int, x: Int, y: Int): Long =
    (z.toLong << 58) | (x.toLong << 29) | y.toLong

  /** Bing-maps quadkey of a tile id: one base-4 digit per zoom level,
    * most significant first, digit = 2·y_bit + x_bit. The zoom-0 world
    * tile has the empty quadkey (Bing's scheme starts at level 1). A
    * quadkey is its own tile lineage — every prefix is an ancestor —
    * which is what makes it the common interop key for tile stores. */
  def quadkey(id: Long): String = {
    val zz = z(id); val xx = x(id); val yy = y(id)
    val out = new Array[Char](zz)
    var i = 0
    while (i < zz) {
      val shift = zz - 1 - i
      out(i) = ('0' + (((yy >> shift) & 1) << 1 | ((xx >> shift) & 1))).toChar
      i += 1
    }
    new String(out)
  }

  /** Inverse of [[quadkey]]: the packed tile id at zoom = key length.
    * Rejects characters outside '0'..'3' and keys longer than 29 levels. */
  def quadkeyTile(qk: String): Long = {
    require(qk.length <= 29, s"quadkey longer than 29 levels: ${qk.length}")
    var xx = 0; var yy = 0; var i = 0
    while (i < qk.length) {
      val d = qk.charAt(i) - '0'
      require(d >= 0 && d <= 3, s"invalid quadkey digit '${qk.charAt(i)}'")
      xx = (xx << 1) | (d & 1)
      yy = (yy << 1) | (d >> 1)
      i += 1
    }
    pack(qk.length, xx, yy)
  }

  def z(id: Long): Int = (id >>> 58).toInt
  def x(id: Long): Int = ((id >>> 29) & 0x1fffffffL).toInt
  def y(id: Long): Int = (id & 0x1fffffffL).toInt

  def tileId(lon: Double, lat: Double, zoom: Int): Long =
    pack(zoom, tileX(lon, zoom), tileY(lat, zoom))

  /** Global (world) pixel column of a longitude at `zoom` with
    * `size`×`size` tiles: `tileX * size + inTilePx`, using the SAME
    * fractional expressions as [[tileX]]/[[tilePixel]] — so
    * `worldPixelX / size == tileX` and `worldPixelX % size` is the
    * in-tile pixel column, exactly. Halving a world pixel (`>> 1`) is
    * exactly the world pixel one zoom level up, which is what lets a tile
    * pyramid reduce level-by-level without re-touching the points. */
  def worldPixelX(lon: Double, zoom: Int, size: Int): Long = {
    val n = 1 << zoom
    val fx = (lon + 180.0) / 360.0 * n
    val xi = math.max(0, math.min(n - 1, fx.toInt))
    xi.toLong * size + math.max(0, math.min(size - 1, ((fx - xi) * size).toInt))
  }

  /** Global (world) pixel row of a latitude — see [[worldPixelX]]. */
  def worldPixelY(lat: Double, zoom: Int, size: Int): Long = {
    val n = 1 << zoom
    val clamped = math.max(-MaxLat, math.min(MaxLat, lat))
    val latRad = math.toRadians(clamped)
    val fy = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * n
    val yi = math.max(0, math.min(n - 1, fy.toInt))
    yi.toLong * size + math.max(0, math.min(size - 1, ((fy - yi) * size).toInt))
  }

  /** Continuous (sub-pixel) world pixel column of a longitude — the SAME
    * floor-decomposed expression as [[worldPixelX]] with the final
    * truncation removed, so inside the open domain a rasterizer sampling
    * pixel CENTERS against projected vertices agrees exactly with point
    * binning. The decomposition (`floor(fx)*size + (fx-floor(fx))*size`,
    * NOT `fx*size`) is deliberate: it is bit-replicable in the DuckDB
    * oracle and rounds identically to the binning path. Domain-edge
    * caveat: AT the clamp boundary (lon = ±180, |lat| = MaxLat) this
    * clamps to `n*size` while the binning form clamps its pixel to
    * `n*size - 1` — consumers must treat these values as half-open
    * interval BOUNDS (as the rasterizer does), never floor them into bin
    * indices. */
  def worldPixelXD(lon: Double, zoom: Int, size: Int): Double = {
    val n = 1 << zoom
    val fx = (lon + 180.0) / 360.0 * n
    val xi = math.floor(fx)
    math.max(0.0, math.min(n.toDouble * size, xi * size + (fx - xi) * size))
  }

  /** Continuous world pixel row of a latitude — see [[worldPixelXD]]. */
  def worldPixelYD(lat: Double, zoom: Int, size: Int): Double = {
    val n = 1 << zoom
    val clamped = math.max(-MaxLat, math.min(MaxLat, lat))
    val latRad = math.toRadians(clamped)
    val fy = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * n
    val yi = math.floor(fy)
    math.max(0.0, math.min(n.toDouble * size, yi * size + (fy - yi) * size))
  }

  /** Pixel index (`py * size + px`) of a point within its z/x/y tile when
    * the tile is rasterized at `size`×`size`. Derives the pixel from the
    * SAME fractional expressions as [[tileX]]/[[tileY]] (fraction past the
    * truncated tile ordinate), so a point's pixel always lies inside the
    * tile [[tileId]] assigns it to — the invariant the distributed renderer
    * relies on when it groups by (tile, pixel). */
  def tilePixel(lon: Double, lat: Double, zoom: Int, size: Int): Int = {
    val px = (worldPixelX(lon, zoom, size) % size).toInt
    val py = (worldPixelY(lat, zoom, size) % size).toInt
    py * size + px
  }

  /** Tile envelope: (minLon, minLat, maxLon, maxLat). */
  def tileEnvelope(id: Long): (Double, Double, Double, Double) = {
    val zz = z(id); val xx = x(id); val yy = y(id)
    val n = 1 << zz
    def lonOf(xi: Int): Double = xi.toDouble / n * 360.0 - 180.0
    def latOf(yi: Int): Double = {
      val t = math.Pi * (1 - 2.0 * yi / n)
      math.toDegrees(math.atan(math.sinh(t)))
    }
    (lonOf(xx), latOf(yy + 1), lonOf(xx + 1), latOf(yy))
  }

  /** Exact tile cover of a lon/lat box at zoom z. An inverted or non-finite
    * box (the EMPTY-geometry envelope) covers nothing — falling through to
    * the rectangular fill would emit thousands of zeroed ids that explode
    * into join keys. */
  def coverBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
               zoom: Int): Array[Long] = {
    if (!(minLon <= maxLon) || !(minLat <= maxLat)) return Array.empty
    val x0 = tileX(minLon, zoom); val x1 = tileX(maxLon, zoom)
    val y0 = tileY(maxLat, zoom); val y1 = tileY(minLat, zoom) // y inverted
    val out = new Array[Long]((x1 - x0 + 1) * (y1 - y0 + 1))
    var idx = 0
    var xi = x0
    while (xi <= x1) {
      var yi = y0
      while (yi <= y1) { out(idx) = pack(zoom, xi, yi); idx += 1; yi += 1 }
      xi += 1
    }
    out
  }

  /** Tile cover of a geometry: the envelope cover pruned hierarchically to
    * tiles whose envelope actually touches the geometry (edges and interior
    * via [[Pip.boxIntersects]]) — a diagonal or ring-shaped polygon keeps
    * far fewer candidate keys than its bounding box would. Starts from a
    * coarse envelope cover and refines children, so pruning applies at
    * every zoom step. */
  def coverGeom(g: Geom, zoom: Int): Array[Long] = {
    val box = Geom.envelope(g)
    if (!(box(0) <= box(2)) || !(box(1) <= box(3))) return Array.empty
    if (g.geomType == GeomTypes.Point)
      return coverBox(box(0), box(1), box(2), box(3), zoom)
    val startZ = math.max(0, zoom - 8)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    def hit(id: Long): Boolean = {
      var (a, b, c, d) = tileEnvelope(id)
      // edge rows absorb the Web-Mercator lat clamp: a geometry beyond
      // ±MaxLat still assigns (clamped) to the edge tile, so the edge
      // tile's test box must reach the pole or the cover would miss it
      val n = 1 << z(id)
      if (y(id) == 0) d = 90.0
      if (y(id) == n - 1) b = -90.0
      // tiny pad so floating error in the inverse-mercator envelope can
      // never prune the tile a boundary point actually assigns to
      val padX = (c - a) * 1e-9 + 1e-12
      val padY = (d - b) * 1e-9 + 1e-12
      Pip.boxIntersects(g, a - padX, b - padY, c + padX, d + padY)
    }
    def recurse(id: Long): Unit = {
      if (!hit(id)) return
      if (z(id) >= zoom) { out += id; return }
      children(id).foreach(recurse)
    }
    coverBox(box(0), box(1), box(2), box(3), startZ).foreach(recurse)
    out.toArray
  }

  def parent(id: Long): Long = {
    val zz = z(id)
    require(zz > 0, "zoom-0 tile has no parent")
    pack(zz - 1, x(id) >> 1, y(id) >> 1)
  }

  /** Ancestor tile at `zoom` — pure bit shifts, exactly equal to
    * `tileId(lon, lat, zoom)` for any point in the tile (floor(floor(n*k)/k)
    * = floor(n), and the edge clamps shift consistently). Lets pyramid
    * queries compute ONE mercator projection at the finest zoom and derive
    * every coarser key for free. */
  def parentAt(id: Long, zoom: Int): Long = {
    val zz = z(id)
    require(zoom >= 0 && zoom <= zz, s"zoom $zoom not above tile zoom $zz")
    val dz = zz - zoom
    pack(zoom, x(id) >> dz, y(id) >> dz)
  }

  def children(id: Long): Array[Long] = {
    val zz = z(id); val xx = x(id) << 1; val yy = y(id) << 1
    Array(pack(zz + 1, xx, yy), pack(zz + 1, xx + 1, yy),
      pack(zz + 1, xx, yy + 1), pack(zz + 1, xx + 1, yy + 1))
  }
}
