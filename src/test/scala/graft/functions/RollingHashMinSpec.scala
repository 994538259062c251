package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class RollingHashMinSpec extends AnyFunSuite {

  /** Quadratic reference: evaluate the polynomial per window with BigInt. */
  private def reference(s: String, w: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    val M = BigInt(RollingHashMin.Mod)
    val B = BigInt(RollingHashMin.Base)
    if (bytes.length < w) return -1L
    (0 to bytes.length - w).map { i =>
      (0 until w).foldLeft(BigInt(0)) { (acc, j) =>
        (acc * B + BigInt(bytes(i + j) & 0xFF)) mod M
      }
    }.min.toLong
  }

  private def compute(s: String, w: Int): Long =
    RollingHashMin.compute(UTF8String.fromString(s), w)

  test("rolling computation equals the quadratic polynomial reference") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(16, 17, 40, 200, 1000); trial <- 0 until 5) {
      val s = new String(Array.fill(len)((32 + rnd.nextInt(95)).toChar))
      assert(compute(s, 16) == reference(s, 16), s"len=$len trial=$trial")
      assert(compute(s, 3) == reference(s, 3))
    }
  }

  test("short or empty text yields -1") {
    assert(compute("", 16) == -1L)
    assert(compute("short", 16) == -1L)
    assert(compute("1234567890123456", 16) == reference("1234567890123456", 16))
  }

  test("identical windows anywhere in the text collide (rolling is position-free)") {
    val a = compute("XXXXmarkerwindow1234" * 2, 12)
    // the minimum is over all windows; inserting the same text elsewhere
    // cannot raise it
    val b = compute("prefix" + "XXXXmarkerwindow1234" * 2 + "suffix", 12)
    assert(b <= a || b == reference("prefix" + "XXXXmarkerwindow1234" * 2 + "suffix", 12))
    assert(compute("abcabcabc", 3) == compute("abc", 3)) // min window repeats
  }
}
