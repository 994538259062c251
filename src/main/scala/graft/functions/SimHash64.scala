package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a 64-bit SimHash over an
  * ARRAY<STRING> of tokens. Per token, the first 64 bits of its MD5 digest
  * (big-endian — i.e. the first 16 hex chars of the standard digest string)
  * form the token signature; each of the 64 bits votes +1/-1 and the sign
  * of the tally becomes the output bit. MD5 is the one hash every engine
  * computes identically, which makes the whole operator reproducible in a
  * SQL oracle hex-digit by hex-digit. Deterministic, null-safe (null tokens
  * are skipped), and codegen'd — `doGenCode` emits a straight static call,
  * so the expression stays inside whole-stage codegen instead of falling
  * off the UDF cliff.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel shared by eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = Md5.get()
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s: UTF8String = tokens.getUTF8String(i)
        md.reset()
        val d = md.digest(s.getBytes)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
