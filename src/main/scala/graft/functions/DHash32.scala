package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: 32-bit perceptual difference hash (dHash)
  * of a BINARY column — the gradient-sign fingerprint media dedup banding
  * runs on (graft.multimodal.Multimodal). Pure byte math, so it belongs
  * in codegen rather than a typed mapPartitions (which would break
  * whole-stage codegen around every scan that computes it); a REAL
  * decoder pipeline would decode in mapPartitions first and then apply
  * this expression to the decoded pixel row. 32 gradient bits keep the
  * value positive in any engine's 64-bit integer — SQL-oracle-exact.
  */
case class DHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  // pin the contract at analysis time: dhash32(text) is a clean
  // AnalysisException, not a runtime ClassCastException in generated code
  // (ExpectsInputTypes would be the idiomatic spelling, but its
  // AbstractDataType signature is private[sql])
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dhash32 requires BINARY input, got ${child.dataType.catalogString}")
  override def prettyName: String = "dhash32"

  override protected def nullSafeEval(input: Any): Any =
    DHash32.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DHash32 =
    copy(child = newChild)
}

object DHash32 {

  /** Static kernel shared by eval and generated code: sign of the
    * "brightness" gradient between 33 evenly-sampled byte positions. */
  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    var h = 0L
    var prev = bytes(0) & 0xFF
    var i = 1
    while (i <= 32) {
      val cur = bytes((i * (n - 1)) / 32) & 0xFF
      if (cur > prev) h |= 1L << (i - 1)
      prev = cur
      i += 1
    }
    h
  }
}
