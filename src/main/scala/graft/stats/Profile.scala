package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling over an arbitrary table — the
  * generalization of the reference's counting programs (CountConditions /
  * CountDistinctValues, rdfind-algorithm programs) from the fixed triple
  * schema to any relation: the first step a pipeline runs against an
  * unknown 100 TB input.
  *
  * One aggregation job for the whole profile: all per-column aggregates
  * (null counts, exact distinct counts, min/max) land in a single
  * `agg(...)`, which Spark plans as ONE scan + one Expand-based shuffle
  * (the standard multi-distinct plan — each row is replicated once per
  * distinct-counted column, the unavoidable cost of EXACT multi-column
  * distincts in one pass; swap to approx_count_distinct if a profile of a
  * 100 TB table may be approximate). The per-column result rows come from
  * unpivoting the single aggregate row driver-side (6 values per column —
  * constant size), never from per-column jobs.
  */
object Profile {

  /** Profile the given columns:
    * (column_name, n_rows, n_nulls, n_distinct, min_val, max_val).
    * min/max are rendered as strings AFTER aggregating on the native type
    * (so numeric columns order numerically, not lexicographically).
    * Restrict to integer/string/date columns when bit-exact cross-engine
    * rendering matters — float formatting is engine-specific.
    *
    * `approx = true` swaps exact distinct counts for HyperLogLog++
    * (`approx_count_distinct`, ~2% relative error): the Expand replication
    * disappears, so the profile of a 100 TB table costs ONE plain scan +
    * aggregation — the right default when the count only feeds a
    * cardinality decision (broadcast or not, dictionary or not). */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    def distinctAgg(c: String) =
      if (approx) approx_count_distinct(col(c), rsd = 0.02).as(s"nd_$c")
      else count_distinct(col(c)).as(s"nd_$c")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        distinctAgg(c),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one output row per profiled column (stack keeps this a
    // single-row local transform — no extra job)
    val arms = cols.map(c =>
      struct(lit(c).as("column_name"), col("n_rows"),
        col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val")))
    one.select(explode(array(arms: _*)).as("p")).select(col("p.*"))
  }
}
