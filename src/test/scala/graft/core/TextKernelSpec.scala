package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TextKernelSpec extends AnyFunSuite {

  test("asciify is identity on ASCII") {
    assert(TextKernel.asciify("hello <world> 123.") == "hello <world> 123.")
    assert(TextKernel.asciify("") == "")
  }

  test("asciify folds non-ASCII via little-endian 7-bit chunks") {
    // U+00E9 = 233 -> 233 & 0x7f = 105 ('i'), then 233 >>> 7 = 1 (SOH)
    assert(TextKernel.asciify("é") == "i")
    assert(TextKernel.asciify("ré") == "ri")
    // U+20AC = 8364 -> 44 (','), then 8364 >>> 7 = 65 ('A'), then 0
    assert(TextKernel.asciify("€") == ",A")
    // chars after the first non-ASCII one are still copied
    assert(TextKernel.asciify("aéb") == "aib")
  }

  test("md5Ascii is deterministic, 7-bit, fixed length") {
    val h1 = TextKernel.md5Ascii("some-value")
    val h2 = TextKernel.md5Ascii("some-value")
    assert(h1 == h2 && h1.length == 8)
    assert(h1.forall(_ <= 0x7f))
    assert(TextKernel.md5Ascii("other-value") != h1)
  }
}
