package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 0-based lookup into a broadcast
  * `Array[Long]`, returning 0L (a sentinel the callers reserve for "no
  * entry") when the index is out of range.
  *
  * Exists for dictionary-indexed side tables that are collected once on
  * the driver and probed per row — the small-to-large ladder's
  * binary-capture -> unary-sub-capture maps (CindEngine.allCindsSmallToLarge).
  * Versus folding the array into the plan as a `lit(Array[Long])` +
  * `element_at` (the first implementation): a literal array is serialized
  * into EVERY task's plan for every stage that probes it, and at the 100 TB
  * target the capture dictionary can reach millions of entries — megabytes
  * of Literal inside each probe expression and its codegen constant pool.
  * The broadcast ships the longs once per executor and the expression holds
  * only the handle (`.value` resolves executor-locally), same pattern as
  * [[DictEncodeIds]] / [[BloomMightContain]]. Codegen'd: the probe stays a
  * direct static call inside whole-stage codegen.
  */
case class BroadcastArrayGet(child: Expression, arr: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bcast_array_get"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case LongType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"bcast_array_get needs a LONG index, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    BroadcastArrayGet.get(arr.value, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcast = ctx.addReferenceObj("arrBcast", arr, classOf[Broadcast[_]].getName)
    val data = ctx.addMutableState("long[]", "bcastArr",
      v => s"$v = (long[]) $bcast.value();")
    defineCodeGen(ctx, ev, c => s"graft.functions.BroadcastArrayGet.get($data, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastArrayGet =
    copy(child = newChild)
}

object BroadcastArrayGet {
  /** Static kernel shared by eval and generated code. */
  def get(a: Array[Long], i: Long): Long =
    if (i < 0L || i >= a.length) 0L else a(i.toInt)
}
