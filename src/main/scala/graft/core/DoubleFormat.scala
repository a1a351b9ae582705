package graft.core

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** Fixed-precision shortest-decimal double printing.
  *
  * Reproduces the output contract of the reference's Ryu-based printer
  * (`/root/reference/src/geoarrow.c:6331-6341` dispatching into
  * `/root/reference/src/d2s.c:690-806` / `to_chars_fixed` at `d2s.c:537`):
  *
  *   - start from the *shortest* decimal digit string that round-trips to
  *     the exact double (<=17 significant digits);
  *   - clamp to at most `precision` fraction digits, rounding half-even on
  *     the decimal digits, then strip trailing zeros;
  *   - values with |v| > 1e17 print in scientific notation `d.ddde[+-]XX`
  *     ignoring the precision;
  *   - specials: NaN -> "nan", +/-Inf -> "Infinity"/"-Infinity", and zero
  *     (either sign) -> "0" (`/root/reference/src/ryu/common.h:80-95`).
  *
  * The digit-extraction here uses exact BigDecimal arithmetic rather than the
  * Ryu tables — same outputs, simpler code. A fast path covers integral
  * values (the overwhelmingly common case in fixtures and synthetic data).
  */
object DoubleFormat {

  /** Default WKT precision, clamped 0..16 like the reference
    * (`/root/reference/src/geoarrow.c:5841-5845`). */
  val DefaultPrecision = 16

  def print(d: Double): String = print(d, DefaultPrecision)

  /** Shortest ROUND-TRIP representation — no precision cap, plain fixed
    * notation. The reference's WKT clamps at 16 fraction digits
    * (faithful), but interchange formats that promise losslessness
    * (GeoJSONSeq features) need the full shortest digits: a double like
    * -0.18129999999999313 requires 17, and a 16-cap reparses to a
    * DIFFERENT double. */
  def printShortest(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "nan"
    if (java.lang.Double.isInfinite(d)) return if (d > 0) "Infinity" else "-Infinity"
    if (d == 0.0) return "0"
    if (d == Math.rint(d) && Math.abs(d) < 9.007199254740992e15)
      return java.lang.Long.toString(d.toLong)
    val (mant, exp) = shortestDigits(d)
    val digits = java.lang.Long.toString(mant)
    val sb = new java.lang.StringBuilder(digits.length + math.abs(exp) + 3)
    if (d < 0) sb.append('-')
    if (exp >= 0) {
      sb.append(digits)
      var i = 0
      while (i < exp) { sb.append('0'); i += 1 }
    } else {
      val intLen = digits.length + exp // may be <= 0
      if (intLen > 0) {
        sb.append(digits, 0, intLen).append('.')
          .append(digits, intLen, digits.length)
      } else {
        sb.append("0.")
        var i = 0
        while (i < -intLen) { sb.append('0'); i += 1 }
        sb.append(digits)
      }
    }
    sb.toString
  }

  def print(d: Double, precision0: Int): String = {
    val precision = if (precision0 < 0 || precision0 > 16) 16 else precision0
    if (java.lang.Double.isNaN(d)) return "nan"
    if (java.lang.Double.isInfinite(d)) return if (d > 0) "Infinity" else "-Infinity"
    if (d == 0.0) return "0" // covers -0.0: reference prints unsigned zero
    if (d > 1.0e17 || d < -1.0e17) return printExp(d)
    // Fast path: integral values in the exactly-representable range print
    // as plain integers (no fraction to clamp).
    if (d == Math.rint(d) && Math.abs(d) < 9.007199254740992e15) {
      return java.lang.Long.toString(d.toLong)
    }
    val (mant, exp) = shortestDigits(d)
    toCharsFixed(mant, exp, d < 0, precision)
  }

  /** Shortest decimal (mantissa, exp10) with value == mantissa*10^exp10
    * (mantissa positive, no trailing zeros) that round-trips to `d`.
    *
    * Fast path: start from `Double.toString` (round-trippable by contract,
    * and at most one digit longer than shortest on JDK 17's pre-Ryu
    * implementation) and check whether one fewer significant digit still
    * round-trips — one BigDecimal probe instead of the k=1..17 search. */
  private[core] def shortestDigits(d: Double): (Long, Int) = {
    val abs = Math.abs(d)
    fromToString(abs).getOrElse(searchDigits(abs))
  }

  /** Exact powers of ten as doubles (10^0..10^22 are all exactly
    * representable); parsed, not pow()'d, so each is the true value. */
  private val Pow10D: Array[Double] =
    Array.tabulate(23)(i => java.lang.Double.parseDouble("1E" + i))

  /** nearest-double(cand * 10^e) == abs, for cand > 0. When cand <= 2^53
    * and |e| <= 22 both operands are exact doubles and one IEEE multiply/
    * divide IS the correctly-rounded conversion, so the equality test is
    * the round-trip test without touching BigDecimal (r06 — this probe is
    * the inner loop of every WKT/GeoJSON coordinate print). Outside that
    * range, the exact BigDecimal conversion decides identically. */
  private def candRoundTrips(cand: Long, e: Int, abs: Double): Boolean = {
    if (cand <= 9007199254740992L && e >= -22 && e <= 22) {
      val cd = cand.toDouble
      val v = if (e >= 0) cd * Pow10D(e) else cd / Pow10D(-e)
      v == abs
    } else
      JBigDecimal.valueOf(cand, -e).doubleValue() == abs
  }

  private def fromToString(abs: Double): Option[(Long, Int)] = {
    val s = java.lang.Double.toString(abs)
    // parse "ddd.ddd" or "d.dddEnn" into (digits, exp10)
    val e = { val i = s.indexOf('E'); i }
    val (body, exp0) = if (e >= 0) (s.substring(0, e), s.substring(e + 1).toInt)
      else (s, 0)
    val dot = body.indexOf('.')
    if (dot < 0) return None
    val digitStr = (body.substring(0, dot) + body.substring(dot + 1))
    if (digitStr.length > 18) return None
    var digits = digitStr.toLong
    var exp = exp0 - (body.length - dot - 1)
    if (digits == 0) return Some((0L, 0))
    while (digits % 10 == 0) { digits /= 10; exp += 1 }
    if (digits >= 10) {
      // would one fewer significant digit round-trip? Dropping the last
      // digit of a no-trailing-zero mantissa IS rounding to n-1
      // significant digits; probe both tie candidates (when the dropped
      // digit is exactly 5 the down- and up-rounding differ and either
      // may be the round-tripper).
      val q = digits / 10
      val r = digits - q * 10
      val candUp = q + (if (r >= 5) 1L else 0L)
      val candDown = q + (if (r > 5) 1L else 0L)
      if (candRoundTrips(candUp, exp + 1, abs)) return None // full search
      if (candDown != candUp && candRoundTrips(candDown, exp + 1, abs))
        return None
    }
    // sanity: toString must round-trip (spec guarantee)
    Some((digits, exp))
  }

  private def searchDigits(abs: Double): (Long, Int) = {
    val exact = new JBigDecimal(abs)
    var k = 1
    while (k <= 17) {
      val r = exact.round(new MathContext(k, RoundingMode.HALF_EVEN))
      if (r.doubleValue() == abs) {
        val s = r.stripTrailingZeros()
        return (s.unscaledValue().longValueExact(), -s.scale())
      }
      k += 1
    }
    // unreachable: 17 significant digits always round-trip a double
    val s = exact.stripTrailingZeros()
    (s.unscaledValue().longValueExact(), -s.scale())
  }

  private def decimalLength(v: Long): Int = java.lang.Long.toString(v).length

  private def pow10(n: Int): Long = {
    var r = 1L; var i = 0
    while (i < n) { r *= 10L; i += 1 }
    r
  }

  /** Port of `to_chars_fixed` (`/root/reference/src/d2s.c:537-660`):
    * value = output*10^exp; clamp fraction digits to `precision` with
    * half-even rounding on the decimal digits; strip trailing zeros. */
  private[core] def toCharsFixed(mantissa0: Long, exp0: Int, sign: Boolean, precision: Int): String = {
    var output = mantissa0
    var olength = decimalLength(output)
    var exp = exp0
    var integerPart = 0L
    var integerPartLength = 0
    var decimalPart = 0L
    var decimalPartLength = 0
    var trailingIntegerZeros = 0
    var leadingDecimalZeros = 0

    if (exp >= 0) {
      integerPart = output
      integerPartLength = olength
      trailingIntegerZeros = exp
      decimalPart = 0
    } else {
      if (precision < -exp) {
        val digitsToTrim = -exp - precision
        if (digitsToTrim > olength) {
          output = 0
          exp = 0
        } else {
          val divisor = pow10(digitsToTrim)
          val divisorHalf = divisor / 2
          val outputDiv = output / divisor
          val remainder = output - outputDiv * divisor
          output = outputDiv
          exp += digitsToTrim
          if (remainder > divisorHalf || (remainder == divisorHalf && (output & 1L) == 1L)) {
            output += 1
            olength = decimalLength(output)
          } else {
            olength -= digitsToTrim
          }
          while (output != 0 && output % 10 == 0) {
            output /= 10; exp += 1; olength -= 1
          }
        }
      }
      val nexp = -exp
      if (exp >= 0) {
        integerPart = output
        integerPartLength = olength
        trailingIntegerZeros = exp
        decimalPart = 0
      } else if (nexp < olength) {
        val p = pow10(nexp)
        integerPart = output / p
        decimalPart = output % p
        integerPartLength = olength - nexp
        decimalPartLength = olength - integerPartLength
        if (decimalPart < pow10(decimalPartLength - 1)) {
          val dl = decimalLength(decimalPart)
          leadingDecimalZeros = decimalPartLength - dl
          decimalPartLength = dl
        }
      } else {
        integerPart = 0
        decimalPart = output
        decimalPartLength = olength
        leadingDecimalZeros = nexp - olength
      }
    }

    val sb = new java.lang.StringBuilder(32)
    if (sign && (integerPart != 0 || decimalPart != 0)) sb.append('-')
    if (integerPart == 0 && integerPartLength <= 1) sb.append('0')
    else sb.append(integerPart)
    var i = 0
    while (i < trailingIntegerZeros) { sb.append('0'); i += 1 }
    if (decimalPart != 0) {
      sb.append('.')
      i = 0
      while (i < leadingDecimalZeros) { sb.append('0'); i += 1 }
      sb.append(decimalPart)
    }
    sb.toString
  }

  /** Scientific form for |v| > 1e17: shortest mantissa as `d[.ddd]e[+-]X+`
    * (`/root/reference/src/d2s.c:734-806`). */
  private def printExp(d: Double): String = {
    val (mant, exp) = shortestDigits(d)
    val olength = decimalLength(mant)
    val sciExp = exp + olength - 1
    val body = toCharsFixed(mant, 1 - olength, d < 0, 17)
    val sb = new java.lang.StringBuilder(body)
    sb.append('e')
    sb.append(if (sciExp < 0) '-' else '+')
    sb.append(Math.abs(sciExp))
    sb.toString
  }
}
