package graft.scale

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries summary buffer: parallel arrays SORTED BY TOKEN so reduce
  * can binary-search and merge can zip — never longer than `cap` after
  * [[MisraGries.trim]]. */
final case class MgBuf(tokens: Array[String], counts: Array[Long])

/** Mergeable Misra-Gries heavy-hitter sketch (Agarwal et al., "Mergeable
  * Summaries", PODS'12): a capacity-`cap` counter set whose undercount
  * after any sequence of reduces/merges is at most N/(cap+1), N the total
  * stream weight. Consequently every item with true frequency >
  * N/(cap+1) is GUARANTEED present in the final summary — the candidate
  * superset a two-phase exact heavy-hitters query needs.
  *
  * Shape on Spark: used as an ungrouped typed Aggregator, each task
  * folds its partition into a local O(cap) buffer (partial aggregation),
  * buffers merge pairwise (sum counts, then subtract the (cap+1)-th
  * largest and drop non-positives — the paper's merge), and ONE summary
  * row reaches the driver. The long vocabulary tail never shuffles.
  */
final class MisraGries(cap: Int)
    extends Aggregator[String, MgBuf, Array[(String, Long)]] {
  require(cap > 0, "cap must be positive")

  override def zero: MgBuf = MgBuf(Array.empty, Array.empty)

  /** Enforce the capacity: subtract the (cap+1)-th largest count from
    * every counter and keep the strictly positive ones (<= cap remain:
    * the cut element itself drops to zero). */
  private def trim(b: MgBuf): MgBuf = {
    if (b.tokens.length <= cap) return b
    val sorted = b.counts.clone()
    java.util.Arrays.sort(sorted)
    val cut = sorted(sorted.length - (cap + 1)) // (cap+1)-th largest
    val n = b.counts.count(_ > cut)
    val ts = new Array[String](n); val cs = new Array[Long](n)
    var i = 0; var o = 0
    while (i < b.tokens.length) {
      if (b.counts(i) > cut) { ts(o) = b.tokens(i); cs(o) = b.counts(i) - cut; o += 1 }
      i += 1
    }
    MgBuf(ts, cs)
  }

  override def reduce(b: MgBuf, token: String): MgBuf = {
    val p = java.util.Arrays.binarySearch(b.tokens.asInstanceOf[Array[AnyRef]],
      token, null)
    if (p >= 0) { b.counts(p) += 1; b } // in-place: buffer is task-local
    else {
      val ins = -p - 1
      val n = b.tokens.length
      val ts = new Array[String](n + 1); val cs = new Array[Long](n + 1)
      System.arraycopy(b.tokens, 0, ts, 0, ins)
      System.arraycopy(b.counts, 0, cs, 0, ins)
      ts(ins) = token; cs(ins) = 1L
      System.arraycopy(b.tokens, ins, ts, ins + 1, n - ins)
      System.arraycopy(b.counts, ins, cs, ins + 1, n - ins)
      trim(MgBuf(ts, cs))
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    val n = a.tokens.length + b.tokens.length
    val ts = new Array[String](n); val cs = new Array[Long](n)
    var i = 0; var j = 0; var o = 0
    while (i < a.tokens.length || j < b.tokens.length) {
      val c =
        if (i >= a.tokens.length) 1
        else if (j >= b.tokens.length) -1
        else a.tokens(i).compareTo(b.tokens(j))
      if (c < 0) { ts(o) = a.tokens(i); cs(o) = a.counts(i); i += 1 }
      else if (c > 0) { ts(o) = b.tokens(j); cs(o) = b.counts(j); j += 1 }
      else {
        ts(o) = a.tokens(i); cs(o) = a.counts(i) + b.counts(j); i += 1; j += 1
      }
      o += 1
    }
    trim(MgBuf(java.util.Arrays.copyOf(ts, o), java.util.Arrays.copyOf(cs, o)))
  }

  override def finish(b: MgBuf): Array[(String, Long)] =
    b.tokens.zip(b.counts)

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Array[(String, Long)]] =
    Encoders.kryo[Array[(String, Long)]]
}
