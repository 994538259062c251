package graft.plans

import graft.functions.SimHash64
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst integration: registers graft's native expressions so they are
  * callable from SQL text, not only the Scala DSL. Install with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.simhash64)
    ext.injectFunction(GraftExtensions.rollingHashMin)
    ext.injectFunction(GraftExtensions.dhash32)
  }
}

object GraftExtensions {
  val simhash64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (children: Seq[Expression]) => SimHash64(children.head))

  /** `dhash32(blob)` — 32-bit perceptual difference hash of a BINARY
    * column (media near-dup fingerprint). */
  val dhash32: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dhash32"),
    new ExpressionInfo(classOf[graft.functions.DHash32].getName, "dhash32"),
    (children: Seq[Expression]) => graft.functions.DHash32(children.head))

  /** `rolling_hash_min(text, window)` — window must be an integer literal
    * (it parameterizes the generated code, like a window frame size). */
  val rollingHashMin: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash_min"),
    new ExpressionInfo(classOf[graft.functions.RollingHashMin].getName, "rolling_hash_min"),
    (children: Seq[Expression]) => graft.functions.RollingHashMin(children.head,
      children(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"rolling_hash_min window must be an integer literal, got $other")
      }))
}
