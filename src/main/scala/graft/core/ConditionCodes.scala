package graft.core

/** Capture / condition code algebra.
  *
  * A *condition* restricts RDF triples by fixing one (unary) or two (binary)
  * of the attributes (s, p, o); a *capture* additionally projects one of the
  * remaining attributes. Both are packed into a single Int:
  *
  *   - bits 0..2: the conditioned ("primary") attributes — s=1, p=2, o=4
  *   - bits 3..5: the projected ("secondary") attribute, same encoding << 3
  *
  * Valid capture codes are therefore unary {10,12,17,20,33,34} and binary
  * {14,21,35}; e.g. 34 = o[p=?] (project o over triples with a fixed p) and
  * 14 = s[p=?,o=?].
  *
  * Semantics re-expressed from the reference implementation at
  * rdfind-algorithm/src/main/scala/de/hpi/isg/sodap/rdfind/util/ConditionCodes.scala:11-129
  * (verified against its unit test ConditionCodes$Test.scala:10-35).
  */
object ConditionCodes {
  val S = 1
  val P = 2
  val O = 4
  val AttrMask = 7
  val AttrBits = 3

  /** All valid unary capture codes, ascending. */
  val unaryCaptures: Array[Int] = Array(10, 12, 17, 20, 33, 34)

  /** All valid binary capture codes, ascending. */
  val binaryCaptures: Array[Int] = Array(14, 21, 35)

  val allCaptures: Array[Int] = (unaryCaptures ++ binaryCaptures).sorted

  @inline def primary(code: Int): Int = code & AttrMask

  @inline def secondary(code: Int): Int = (code >> AttrBits) & AttrMask

  @inline def merge(a: Int, b: Int): Int = a | b

  /** Build a code from conditioned attribute bits and a projected attribute. */
  @inline def capture(conditionBits: Int, projection: Int): Int =
    (conditionBits & AttrMask) | ((projection & AttrMask) << AttrBits)

  /** Mark every non-conditioned attribute as projected (used when a plain
    * condition code is widened to all captures it can participate in). */
  def withAllProjections(conditionBits: Int): Int =
    (conditionBits & AttrMask) | ((~conditionBits & AttrMask) << AttrBits)

  @inline def isUnary(code: Int): Boolean = Integer.bitCount(code & AttrMask) == 1

  @inline def isBinary(code: Int): Boolean = Integer.bitCount(code & AttrMask) == 2

  /** candidate's attribute sets are contained in superCode's. */
  @inline def isSubcode(candidate: Int, superCode: Int): Boolean =
    (candidate & superCode) == candidate

  /** Split the conditioned attributes into (first, second, unused) where
    * "first" is the lowest set bit (s < p < o order). second == 0 for unary. */
  def decode(code: Int): (Int, Int, Int) = {
    val first = Integer.lowestOneBit(code & AttrMask)
    val second = Integer.lowestOneBit(code & AttrMask & ~first)
    val unused = AttrMask & ~first & ~second
    (first, second, unused)
  }

  /** For a binary capture, the unary capture keeping only the first
    * (lowest-bit) conditioned attribute, e.g. 14 = s[p,o] -> 10 = s[p]. */
  def firstSubcapture(code: Int): Int =
    (code & ~AttrMask) | Integer.lowestOneBit(code & AttrMask)

  /** For a binary capture, the unary capture keeping only the second
    * conditioned attribute, e.g. 14 = s[p,o] -> 12 = s[o]. */
  def secondSubcapture(code: Int): Int = {
    val first = Integer.lowestOneBit(code & AttrMask)
    (code & ~AttrMask) | Integer.lowestOneBit(code & AttrMask & ~first)
  }

  /** Exactly 1-2 conditioned attrs, exactly one projected attr, disjoint,
    * and no stray bits — the validity predicate the reference tests. */
  def isValidCapture(code: Int): Boolean = {
    val prim = primary(code)
    val sec = secondary(code)
    val nPrim = Integer.bitCount(prim)
    nPrim >= 1 && nPrim <= 2 &&
      Integer.bitCount(sec) == 1 &&
      (prim & sec) == 0 &&
      (code & ~0x3f) == 0
  }

  private val attrChar = Map(S -> "s", P -> "p", O -> "o")

  /** Human-readable capture, e.g. prettyPrint(34, "type") == "o[p=type]". */
  def prettyPrint(code: Int, v1: String, v2: String = null): String = {
    val proj = attrChar.getOrElse(secondary(code), "")
    val (first, second, _) = decode(code)
    if (second == 0) s"$proj[${attrChar(first)}=$v1]"
    else s"$proj[${attrChar(first)}=$v1,${attrChar(second)}=$v2]"
  }
}
