package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeohashSpec extends AnyFunSuite {

  test("canonical vectors (interior points agree with bisection implementations)") {
    // Wikipedia's worked example
    assert(Geohash.encode(10.40744, 57.64911, 11) == "u4pruydqqvj")
    // Niemeyer's original example
    assert(Geohash.encode(-5.603, 42.605, 5) == "ezs42")
    // prefixes nest
    assert(Geohash.encode(10.40744, 57.64911, 5) == "u4pru")
  }

  test("round trip: the decoded box contains the point, re-encoding the center is stable") {
    val rnd = new scala.util.Random(127)
    for (_ <- 1 to 500) {
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val p = 1 + rnd.nextInt(12)
      val h = Geohash.encode(lon, lat, p)
      assert(h.length == p)
      val b = Geohash.decodeBox(h)
      assert(b(0) <= lon && lon <= b(2) && b(1) <= lat && lat <= b(3),
        s"($lon,$lat) outside box ${b.toSeq} of '$h'")
      // any interior point of the cell hashes back to the same string
      val cx = b(0) + (b(2) - b(0)) / 2; val cy = b(1) + (b(3) - b(1)) / 2
      assert(Geohash.encode(cx, cy, p) == h)
      // prefix stability at every shorter precision
      for (q <- 1 until p)
        assert(Geohash.encode(lon, lat, q) == h.substring(0, q))
    }
  }

  test("edges clamp, decode validates, case folds") {
    // poles and antimeridian clamp into the last cell instead of overflowing
    assert(Geohash.encode(180.0, 90.0, 6) == "zzzzzz")
    assert(Geohash.encode(-180.0, -90.0, 6) == "000000")
    assert(Geohash.encode(1e300, 1e300, 4) == "zzzz")
    val b = Geohash.decodeBox("ZZZZ") // case-insensitive decode
    assert(b(2) == 180.0 && b(3) == 90.0)
    assert(Geohash.decodeBox("0")(0) == -180.0)
    intercept[IllegalArgumentException](Geohash.decodeBox("ab!c"))
    intercept[IllegalArgumentException](Geohash.decodeBox(""))
    intercept[IllegalArgumentException](Geohash.decodeBox("a" * 13))
    intercept[IllegalArgumentException](Geohash.encode(0, 0, 0))
    // 'a', 'i', 'l', 'o' are not in the alphabet
    intercept[IllegalArgumentException](Geohash.decodeBox("ai"))
  }

  test("decode edges are exact dyadics: width halves per bit, no rounding") {
    // one-char cell: nlon 3, nlat 2 -> 45 x 45 degrees exactly
    val b1 = Geohash.decodeBox("s") // code 24 = 11000b: lon bits 110, lat bits 00
    assert(b1(2) - b1(0) == 45.0 && b1(3) - b1(1) == 45.0)
    // 12-char cell edges are still exact multiples of 360/2^30
    val b12 = Geohash.decodeBox("u4pruydqqvj8")
    val wlon = 360.0 / (1L << 30).toDouble
    assert(((b12(0) + 180.0) / wlon) == math.rint((b12(0) + 180.0) / wlon))
  }
}
