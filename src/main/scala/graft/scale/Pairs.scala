package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared map-side pair fan-out over per-group sorted distinct arrays —
  * the candidate generator the frequent-itemset miner (basket pairs) and
  * the predicate co-occurrence marginal both run after collapsing their
  * fact to one array per group. */
object Pairs {

  /** All unordered (a, b) pairs from a sorted distinct array, a < b;
    * empty output for arrays of size < 2 (and NULL for a NULL array).
    * Index pairs + element_at, NOT transform-over-slice: slice copies
    * the array tail per element, and at the 6M-row basket soak that
    * O(w²) allocation made pair generation 3x slower than this
    * O(1)-probe form (49 -> 17 s; BASELINE.md round-10). The outer
    * index list is guarded total because sequence(1, size-1) on a
    * 1-element array DESCENDS ([1, 0]) instead of being empty — an
    * unfiltered caller would crash or emit corrupt pairs. */
  def unorderedPairs(arr: Column): Column =
    flatten(transform(
      when(size(arr) >= 2, sequence(lit(1), size(arr) - 1))
        .otherwise(expr("array()").cast("array<int>")),
      i => transform(sequence(i + 1, size(arr)), j =>
        struct(element_at(arr, i).as("a"), element_at(arr, j).as("b")))))
}
