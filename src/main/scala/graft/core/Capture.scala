package graft.core

/** A capture instance: a capture code plus its condition value(s).
  * Unary captures canonicalize v2 to "" (never null) — this kills the
  * null/empty dualism the reference juggles via coalesce/decoalesce
  * (reference data/Condition.scala:77-86).
  */
final case class Capture(code: Int, v1: String, v2: String) {

  def isUnary: Boolean = ConditionCodes.isUnary(code)
  def isBinary: Boolean = ConditionCodes.isBinary(code)

  /** The unary sub-capture keeping the first conditioned attribute. */
  def firstSub: Capture = Capture(ConditionCodes.firstSubcapture(code), v1, "")

  /** The unary sub-capture keeping the second conditioned attribute. */
  def secondSub: Capture = Capture(ConditionCodes.secondSubcapture(code), v2, "")

  /** True iff `that` is this capture or a generalization of it: every triple
    * matched by this capture's condition is matched by that's, with the same
    * projection. E.g. s[p=a,o=b] implies (is a subset of) s[p=a] and s[o=b].
    * Mirrors reference data/Condition.scala:35-45 (isImpliedBy).
    */
  def impliedCaptures: Iterator[Capture] =
    if (isBinary) Iterator(this, firstSub, secondSub) else Iterator(this)

  def implies(that: Capture): Boolean =
    this == that ||
      (isBinary && ConditionCodes.isSubcode(that.code, code) &&
        (that == firstSub || that == secondSub))

  def pretty: String =
    ConditionCodes.prettyPrint(code, v1, if (v2.isEmpty) null else v2)
}

object Capture {
  /** Total order by (code, v1, v2) — the sort the merge aggregates rely on. */
  implicit val ordering: Ordering[Capture] =
    Ordering.by((c: Capture) => (c.code, c.v1, c.v2))
}
