package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression encoding an ARRAY<LONG> of 64-bit capture
  * hashes into the ARRAY<LONG> of their dictionary IDs, dropping hashes
  * absent from the dictionary (= infrequent captures).
  *
  * This is the map-side half of the join-line encoding after the r13
  * reshape (reference ConditionCompressor, rdfind transformations/
  * ConditionCompressor + CreateHashes — compression applied BEFORE the
  * expensive exchanges): the join lines are grouped over 8-byte capture
  * hashes instead of (code, v1, v2) string structs, so the dictionary
  * ships as two parallel long arrays — hashes sorted ascending, IDs in the
  * matching slots — and each probe is a binary search. Two flat primitive
  * arrays serialize/broadcast far cheaper than a boxed hash map at
  * multi-million-capture dictionary sizes, and the probe has no boxing at
  * all. Codegen'd: `doGenCode` emits one static call, keeping the rewrite
  * inside whole-stage codegen.
  *
  * EXACTNESS: a hash→ID mapping is only sound when no two frequent
  * captures share a hash; the caller (CindEngine.encodedJoinLines) checks
  * exactly that against the dictionary and aborts on collision — the
  * reference's own CheckHashCollisions contract (programs, A15).
  */
case class HashDictEncodeIds(child: Expression,
    sortedHashes: Broadcast[Array[Long]], ids: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_dict_encode_ids"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"hash_dict_encode_ids needs ARRAY<LONG>, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    HashDictEncodeIds.encode(sortedHashes.value, ids.value,
      input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hB = ctx.addReferenceObj("hashesBcast", sortedHashes,
      classOf[Broadcast[_]].getName)
    val iB = ctx.addReferenceObj("idsBcast", ids, classOf[Broadcast[_]].getName)
    val hs = ctx.addMutableState("long[]", "dictHashes",
      v => s"$v = (long[]) $hB.value();")
    val is = ctx.addMutableState("long[]", "dictIds",
      v => s"$v = (long[]) $iB.value();")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashDictEncodeIds.encode($hs, $is, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashDictEncodeIds =
    copy(child = newChild)
}

object HashDictEncodeIds {
  /** Static kernel shared by eval and generated code: binary-search each
    * hash in the sorted dictionary, emit the ID on hit, drop on miss. */
  def encode(hashes: Array[Long], ids: Array[Long], arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      val idx = java.util.Arrays.binarySearch(hashes, arr.getLong(i))
      if (idx >= 0) { out(k) = ids(idx); k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}
