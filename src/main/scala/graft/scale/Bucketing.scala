package graft.scale

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a relation ONCE at write time so
  * every later equi-join/aggregation on the bucket keys runs WITHOUT an
  * Exchange. This is the storage-level answer to "reuse a partitioning
  * across stages" — at 100 TB the dominant cost of repeated joins on the
  * same key (e.g. doc_id across curation stages) is re-shuffling the big
  * relation every query; two tables bucketed the same way sort-merge-join
  * directly off their files. The spec pins the plan property (no
  * ShuffleExchange between bucketed scans and the join).
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. Bucket
    * count is a LAYOUT CONTRACT, not a tuning knob: joins co-locate only
    * between tables with the same count on the same keys. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty && numBuckets > 0, "keys and a positive bucket count required")
    df.write.mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True iff the executed plan of `df` contains no SHUFFLE exchange —
    * the property bucketed co-located joins buy. Broadcast exchanges
    * don't count: they move the small side, not the bucketed relation
    * (and the planner rightly disables bucketed scans when it picks a
    * broadcast join instead). */
  def isExchangeFree(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    !s.contains("Exchange hashpartitioning") &&
      !s.contains("Exchange rangepartitioning") &&
      !s.contains("Exchange RoundRobinPartitioning")
  }
}
