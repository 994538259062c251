package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared map-side pair fan-out over per-group sorted distinct arrays —
  * the candidate generator the frequent-itemset miner (basket pairs) and
  * the predicate co-occurrence marginal both run after collapsing their
  * fact to one array per group. */
object Pairs {

  /** All unordered (a, b) pairs from a sorted distinct array of >= 2
    * elements, a < b. Index pairs + element_at, NOT transform-over-slice:
    * slice copies the array tail per element, and at the 6M-row basket
    * soak that O(w²) allocation made pair generation 3x slower than this
    * O(1)-probe form (49 -> 17 s; BASELINE.md round-10). Callers MUST
    * filter size >= 2 first: sequence(1, size-1) on a 1-element array
    * DESCENDS ([1, 0]) instead of being empty. */
  def unorderedPairs(arr: Column): Column =
    flatten(transform(sequence(lit(1), size(arr) - 1), i =>
      transform(sequence(i + 1, size(arr)), j =>
        struct(element_at(arr, i).as("a"), element_at(arr, j).as("b")))))
}
