package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expressions for the product-quantization hot path:
  * nearest-anchor code assignment and the per-query ADC lookup table.
  *
  * Both kernels quantize the ARRAY<FLOAT> embedding to integers
  * (floor(x * 1024), the repo-wide exact representation) and then run the
  * numSub x kAnchors x subDim squared-difference loop as a tight static
  * Java loop. The DataFrame formulations of this loop were measured over
  * 20k rows at the 10x soak scale: unbound HOFs 25 s/pass, let-bound
  * zip_with/aggregate 7 s/pass, let-bound flat element_at arithmetic
  * 34 s/pass (every term an interpreted Expression.eval), plain-projection
  * arithmetic 40 s/pass (CollapseProject re-inlines the array alias).
  * The native kernel is ~0.1 s/pass and stays inside whole-stage codegen
  * (`doGenCode` emits one static call). Arithmetic is identical to the
  * SQL oracle's: all intermediates exact integers, argmin ties to the
  * smaller anchor index.
  *
  * Anchors are carried as Seq[Seq[Long]] (value equality keeps Expression
  * semantic-equals sane) and flattened once per executor into a primitive
  * matrix.
  */
abstract class PqKernelExpression extends UnaryExpression {
  def anchors: Seq[Seq[Long]]
  def numSub: Int

  @transient protected lazy val anchorMatrix: Array[Array[Long]] =
    anchors.map(_.toArray).toArray

  protected def checkShape(): Unit = {
    require(anchors.nonEmpty && anchors.head.nonEmpty, "empty PQ codebook")
    require(anchors.head.length % numSub == 0,
      s"dims ${anchors.head.length} not divisible by $numSub subspaces")
  }
}

/** codes[m] = argmin_j of the exact integer sub-distance (ties -> smaller
  * j) between subspace m of the quantized embedding and anchor j. */
case class PqAssignCodes(child: Expression, anchors: Seq[Seq[Long]],
    numSub: Int) extends PqKernelExpression {
  checkShape()
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_assign_codes"

  override protected def nullSafeEval(input: Any): Any =
    PqAssign.codes(input.asInstanceOf[ArrayData], anchorMatrix, numSub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("pqAnchors", anchorMatrix, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqAssign.codes($c, $mat, $numSub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignCodes =
    copy(child = newChild)
}

/** Flat ADC lookup table of a query vector: entry m*kAnchors + j is the
  * exact integer sub-distance between subspace m and anchor j. */
case class PqQueryLut(child: Expression, anchors: Seq[Seq[Long]],
    numSub: Int) extends PqKernelExpression {
  checkShape()
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_query_lut"

  override protected def nullSafeEval(input: Any): Any =
    PqAssign.lut(input.asInstanceOf[ArrayData], anchorMatrix, numSub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("pqAnchors", anchorMatrix, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqAssign.lut($c, $mat, $numSub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqQueryLut =
    copy(child = newChild)
}

object PqAssign {

  /** floor(x*1024) quantization of an ARRAY<FLOAT>, as primitive longs. */
  private def quantize(emb: ArrayData): Array[Long] = {
    val n = emb.numElements()
    val qe = new Array[Long](n)
    var i = 0
    while (i < n) {
      qe(i) = math.floor(emb.getFloat(i).toDouble * 1024.0).toLong
      i += 1
    }
    qe
  }

  /** Static kernel shared by eval and generated code. */
  def codes(emb: ArrayData, anchors: Array[Array[Long]], numSub: Int): ArrayData = {
    val qe = quantize(emb)
    val sub = anchors(0).length / numSub
    val out = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      val off = m * sub
      var best = Long.MaxValue
      var bestJ = 0
      var j = 0
      while (j < anchors.length) {
        val a = anchors(j)
        var d = 0L
        var i = 0
        while (i < sub) {
          val x = qe(off + i) - a(off + i)
          d += x * x
          i += 1
        }
        if (d < best) { best = d; bestJ = j } // strict <: ties keep smaller j
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Static kernel shared by eval and generated code. */
  def lut(emb: ArrayData, anchors: Array[Array[Long]], numSub: Int): ArrayData = {
    val qe = quantize(emb)
    val sub = anchors(0).length / numSub
    val out = new Array[Long](numSub * anchors.length)
    var m = 0
    while (m < numSub) {
      val off = m * sub
      var j = 0
      while (j < anchors.length) {
        val a = anchors(j)
        var d = 0L
        var i = 0
        while (i < sub) {
          val x = qe(off + i) - a(off + i)
          d += x * x
          i += 1
        }
        out(m * anchors.length + j) = d
        j += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }
}
