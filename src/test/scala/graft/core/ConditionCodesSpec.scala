package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Gold values from the reference's own unit test
  * (ConditionCodes$Test.scala:10-35, see FIXTURES.md §1.1). */
class ConditionCodesSpec extends AnyFunSuite {
  import ConditionCodes._

  test("valid capture codes are exactly the 9 documented ones") {
    val valid = (0 to 255).filter(isValidCapture)
    assert(valid == Seq(10, 12, 14, 17, 20, 21, 33, 34, 35))
    assert(unaryCaptures.toSeq == Seq(10, 12, 17, 20, 33, 34))
    assert(binaryCaptures.toSeq == Seq(14, 21, 35))
  }

  test("unary/binary classification on the documented inputs") {
    val unaryIn = Set(9, 10, 12, 17, 18, 20, 33, 34, 36)
    val binaryIn = Set(11, 13, 14, 19, 21, 22, 35, 37, 38)
    unaryIn.foreach(c => assert(isUnary(c), s"code $c"))
    binaryIn.foreach(c => assert(isBinary(c), s"code $c"))
  }

  test("decode / pretty-print examples") {
    assert(prettyPrint(34, "type") == "o[p=type]")
    assert(prettyPrint(14, "a", "b") == "s[p=a,o=b]")
    assert(prettyPrint(21, "a", "b") == "p[s=a,o=b]")
    assert(prettyPrint(35, "a", "b") == "o[s=a,p=b]")
    assert(prettyPrint(10, "x") == "s[p=x]")
  }

  test("capture construction round-trips") {
    assert(capture(P, O) == 34)
    assert(capture(P | O, S) == 14)
    assert(capture(S | O, P) == 21)
    assert(capture(S | P, O) == 35)
    for (c <- allCaptures) {
      val (first, second, _) = decode(c)
      assert(capture(first | second, secondary(c)) == c)
    }
  }

  test("subcaptures of binary captures are valid unary captures") {
    assert(firstSubcapture(14) == 10 && secondSubcapture(14) == 12)
    assert(firstSubcapture(21) == 17 && secondSubcapture(21) == 20)
    assert(firstSubcapture(35) == 33 && secondSubcapture(35) == 34)
    for (c <- binaryCaptures) {
      assert(isValidCapture(firstSubcapture(c)))
      assert(isValidCapture(secondSubcapture(c)))
      assert(isSubcode(firstSubcapture(c), c))
      assert(isSubcode(secondSubcapture(c), c))
    }
  }

  test("isSubcode is a partial order on capture codes") {
    for (a <- allCaptures) assert(isSubcode(a, a))
    for (a <- allCaptures; b <- allCaptures
         if isSubcode(a, b) && isSubcode(b, a)) assert(a == b)
    for (a <- allCaptures; b <- allCaptures; c <- allCaptures
         if isSubcode(a, b) && isSubcode(b, c)) assert(isSubcode(a, c))
  }

  test("capture implication") {
    val bin = Capture(14, "p1", "o1")
    assert(bin.implies(Capture(10, "p1", "")))
    assert(bin.implies(Capture(12, "o1", "")))
    assert(bin.implies(bin))
    assert(!bin.implies(Capture(10, "p2", "")))
    assert(!Capture(10, "p1", "").implies(bin))
    assert(!bin.implies(Capture(34, "p1", "")))
  }
}
