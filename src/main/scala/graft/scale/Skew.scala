package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic skew utilities — the salting patterns the CIND engine applies
  * in specialized form (join-line slicing, CindEngine.SplitThreshold)
  * exposed for arbitrary relations. Both are result-identical to their
  * naive counterparts (spec-pinned); what they change is the WORK SHAPE:
  * a hub key's rows spread over `salts` tasks instead of serializing one.
  */
object Skew {

  /** Inner equi-join where `left` is large and skewed on `key` and `right`
    * is mid-sized (too big to broadcast, small enough to replicate
    * `salts`x). Each left row's salt mixes its content hash with a
    * per-row uniform component (monotonically_increasing_id — stable
    * within a run): content hash alone would send fully-duplicate rows of
    * a hub key to ONE salt, re-creating exactly the skew the salt exists
    * to spread. The right side replicates once per salt value; the join
    * key becomes (key, salt) — a hub key's rows now land in `salts`
    * different partitions. AQE's skew-join split handles sort-merge skew
    * at runtime, but only at partition granularity AFTER a shuffle exists;
    * explicit salting also covers the aggregation that often follows the
    * join (the (key, salt) grouping pre-splits it). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col) :+ monotonically_increasing_id(): _*),
        lit(salts)).cast("int"))
    val saltedRight = right.crossJoin(
      right.sparkSession.range(salts).select(col("id").cast("int").as("_salt")))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop(saltedRight(key)).drop("_salt")
  }

  /** Distinct-set aggregation per key, skew-safe: groupBy(key, salt)
    * collects partial sets, a second groupBy(key) unions them. A plain
    * `collect_set` funnels every hub-key row through ONE task buffer; the
    * two-phase shape bounds each task at ~|hub| / salts rows. Both
    * shuffles are map-side combinable. Output: (key, `values` ARRAY,
    * sorted for determinism). */
  def saltedCollectSet(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df
      .withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(valueCol)).as("_part"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("_part")))))
        .as("values"))
  }
}
