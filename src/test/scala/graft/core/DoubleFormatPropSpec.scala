package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.util.Random

/** Property tests for the shortest-digit fast path vs the exhaustive
  * BigDecimal search, and round-trip of the printed form. */
class DoubleFormatPropSpec extends AnyFunSuite {

  private def exhaustive(abs: Double): (Long, Int) = {
    val exact = new java.math.BigDecimal(abs)
    var k = 1
    while (k <= 17) {
      val r = exact.round(new java.math.MathContext(k,
        java.math.RoundingMode.HALF_EVEN))
      if (r.doubleValue() == abs) {
        val s = r.stripTrailingZeros()
        return (s.unscaledValue().longValueExact(), -s.scale())
      }
      k += 1
    }
    throw new AssertionError("unreachable")
  }

  test("fast path matches exhaustive search on random doubles") {
    val r = new Random(42)
    var i = 0
    while (i < 20000) {
      val d = r.nextInt(5) match {
        case 0 => r.nextDouble() * 1000 - 500
        case 1 => java.lang.Double.longBitsToDouble(r.nextLong()) match {
          case v if v.isNaN || v.isInfinite => 1.0
          case v => v
        }
        case 2 => r.nextInt(100000) / 10000.0 - 5.0
        case 3 => r.nextLong() % 1000000000L * 1.0
        case _ => math.pow(10, r.nextInt(40) - 20) * (r.nextDouble() + 0.5)
      }
      val abs = math.abs(d)
      if (abs != 0 && !abs.isInfinite) {
        assert(DoubleFormat.shortestDigits(abs) == exhaustive(abs),
          s"digits mismatch for $abs (bits ${java.lang.Double.doubleToLongBits(abs)})")
      }
      i += 1
    }
  }

  test("print(precision 16) round-trips random doubles in fixed range") {
    val r = new Random(7)
    (1 to 20000).foreach { _ =>
      val d = (r.nextDouble() - 0.5) * 2e17
      val printed = DoubleFormat.print(d)
      assert(printed.toDouble == d, s"round trip of $d via '$printed'")
    }
  }
}
