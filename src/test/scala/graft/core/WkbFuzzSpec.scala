package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.util.Random

/** Fuzz hardening: `Wkb.parse` on adversarial bytes must fail fast with an
  * exception — never hang, OOM (giant claimed element counts), or return
  * garbage — so `st_trygeomfromwkb` can null-out dirty lake data safely. */
class WkbFuzzSpec extends AnyFunSuite {

  test("random bytes never crash the JVM; either parse or throw") {
    val r = new Random(42)
    var parsed = 0
    (1 to 50000).foreach { _ =>
      val len = r.nextInt(64)
      val bytes = new Array[Byte](len)
      r.nextBytes(bytes)
      try { Wkb.parse(bytes); parsed += 1 }
      catch { case _: Exception => () }
    }
    assert(parsed >= 0) // completing the loop quickly is the property
  }

  test("mutated valid WKB never crashes") {
    val r = new Random(7)
    val base = Wkb.write(Wkt.parse(
      "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))"))
    (1 to 20000).foreach { _ =>
      val bytes = base.clone()
      (0 until 1 + r.nextInt(4)).foreach { _ =>
        bytes(r.nextInt(bytes.length)) = r.nextInt(256).toByte
      }
      try Wkb.parse(bytes)
      catch { case _: Exception => () }
    }
  }

  test("giant claimed counts rejected before allocation") {
    // MULTIPOINT with count = Int.MaxValue but only 4 bytes of payload
    val buf = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(4).putInt(Int.MaxValue).putInt(0)
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException](Wkb.parse(buf.array()))
    assert((System.nanoTime() - t0) < 1e9, "must reject fast, not allocate")
    // GEOMETRYCOLLECTION likewise
    val buf2 = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf2.put(1.toByte).putInt(7).putInt(Int.MaxValue).putInt(0)
    intercept[IllegalArgumentException](Wkb.parse(buf2.array()))
  }
}
