package graft.core

import org.scalatest.funsuite.AnyFunSuite

class HexSpec extends AnyFunSuite {

  private val Size = 2.5

  private def center(cell: Long): (Double, Double) =
    (Hex.centerX(cell, Size), Hex.centerY(cell, Size))

  private def pack(q: Int, r: Int): Long = (q.toLong << 32) | (r.toLong & 0xffffffffL)

  test("cell of a center is that cell; q/r round-trip the packing") {
    val rnd = new scala.util.Random(128)
    for (_ <- 1 to 300) {
      val q = rnd.nextInt(2001) - 1000
      val r = rnd.nextInt(2001) - 1000
      val cell = pack(q, r)
      assert(Hex.cellQ(cell) == q && Hex.cellR(cell) == r)
      val (cx, cy) = center(cell)
      assert(Hex.cell(cx, cy, Size) == cell, s"center of ($q,$r) strayed")
    }
  }

  test("assignment is nearest-center among the 7 candidate hexes") {
    val rnd = new scala.util.Random(777)
    for (_ <- 1 to 2000) {
      val x = rnd.nextDouble() * 360 - 180
      val y = rnd.nextDouble() * 180 - 90
      val cell = Hex.cell(x, y, Size)
      val q = Hex.cellQ(cell); val r = Hex.cellR(cell)
      val (cx, cy) = center(cell)
      val d0 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
      val neighbors = Seq((q + 1, r), (q - 1, r), (q, r + 1), (q, r - 1),
        (q + 1, r - 1), (q - 1, r + 1))
      neighbors.foreach { case (nq, nr) =>
        val (nx, ny) = center(pack(nq, nr))
        val dn = (x - nx) * (x - nx) + (y - ny) * (y - ny)
        assert(d0 <= dn + 1e-9,
          s"($x,$y) assigned to ($q,$r) but ($nq,$nr) is closer: $d0 > $dn")
      }
      // hexes tile the plane: containment radius bounds hold
      assert(d0 <= Size * Size + 1e-9, "point farther than circumradius from its center")
    }
  }

  test("guards: size must be positive, far-out frames overflow loudly") {
    intercept[IllegalArgumentException](Hex.cell(0, 0, 0.0))
    intercept[IllegalArgumentException](Hex.cell(0, 0, -1.0))
    intercept[IllegalArgumentException](Hex.cell(1e18, 0, 1e-9))
    // NaN must not silently bin to cell (0, 0)
    intercept[IllegalArgumentException](Hex.cell(Double.NaN, 3.0, 2.5))
    intercept[IllegalArgumentException](Hex.cell(3.0, Double.NaN, 2.5))
  }
}
