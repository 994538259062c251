package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: minimum Rabin-Karp rolling hash over all
  * byte windows of a fixed length — the classic winnowing-style document
  * fingerprint, computed in one O(n) pass (each window hash derives from
  * the previous by one multiply-subtract-add; that is the "rolling").
  *
  * h(w) = sum b[i] * B^(L-1-i) mod M with B = 257 and M = 2^61-1 (a
  * Mersenne prime, so reduction is shift-and-add and the 128-bit product
  * folds via Math.multiplyHigh). Output: the minimum window hash, or -1
  * for texts shorter than the window. Deterministic, codegen'd, and
  * reproducible in SQL — the oracle evaluates the same polynomial per
  * window (quadratically); only this expression ROLLS it.
  */
case class RollingHashMin(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash_min"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashMin.compute(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHashMin.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashMin =
    copy(child = newChild)
}

object RollingHashMin {
  final val Base = 257L
  final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** x mod 2^61-1 for 0 <= x < 2^63: fold the high bits (2^61 ≡ 1). */
  @inline private def modM(x: Long): Long = {
    val r = (x & Mod) + (x >>> 61)
    if (r >= Mod) r - Mod else r
  }

  /** (a * b) mod 2^61-1 for a, b < 2^61: 128-bit product via
    * multiplyHigh, then 2^64 ≡ 8 (mod M). */
  @inline private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // exact: a, b positive < 2^62
    val lo = a * b                   // wrapped low 64 bits
    modM(modM((hi << 3) + (lo >>> 61)) + (lo & Mod))
  }

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, window: Int): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < window || window <= 0) return -1L
    var pow = 1L // B^(window-1) mod M
    var i = 0
    while (i < window - 1) { pow = mulMod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = modM(mulMod(h, Base) + (bytes(i) & 0xFF)); i += 1 }
    var min = h
    i = window
    while (i < n) {
      h = modM(h + Mod - mulMod(bytes(i - window) & 0xFF, pow)) // drop left byte
      h = modM(mulMod(h, Base) + (bytes(i) & 0xFF))             // take right byte
      if (h < min) min = h
      i += 1
    }
    min
  }
}
