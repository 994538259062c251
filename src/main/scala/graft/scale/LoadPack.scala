package graft.scale

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Greedy load-based bin-packing — the explicit, deterministic placement
  * tool the reference ships as its LoadBasedPartitioner (P3,
  * operators/LoadBasedPartitioner.scala:14-53): assign weighted keys to
  * the least-loaded of n bins, heaviest key first (the classic LPT
  * heuristic, makespan <= 4/3 · OPT).
  *
  * In this engine AQE + join-line slicing replace load-based partitioning
  * for SHUFFLES at runtime; the explicit packer is the deterministic
  * fallback the reference kept it for — when slice counts are
  * mis-estimated, or when a STABLE physical placement is the point
  * (writing n balanced files keyed by group, pinning expensive keys away
  * from each other). The weight relation is per-KEY (one row per distinct
  * key), so collecting it is metadata-scale by construction — the data
  * itself never touches the driver.
  */
object LoadPack {

  /** LPT packing: heaviest key first into the currently-least-loaded bin.
    * Ties (equal weights / equal loads) break by key order, so the
    * placement is deterministic across runs. */
  def pack(weights: Seq[(String, Long)], bins: Int): Map[String, Int] = {
    require(bins > 0, "bins must be positive")
    val loads = new Array[Long](bins)
    val out = Map.newBuilder[String, Int]
    // sort: weight DESC, key ASC — deterministic LPT order
    weights.sortBy { case (k, w) => (-w, k) }.foreach { case (k, w) =>
      var best = 0
      var i = 1
      while (i < bins) { if (loads(i) < loads(best)) best = i; i += 1 }
      loads(best) += w
      out += (k -> best)
    }
    out.result()
  }

  /** Repartition `df` into exactly `bins` partitions with per-key loads
    * (row counts) balanced by [[pack]]. Unlike `repartition(n, col)`,
    * whose hash can land two heavy keys in one partition, the bin id IS
    * the partition id — a custom `Partitioner` pins placement exactly
    * (the one job Catalyst cannot express, hence the RDD drop-down; rows
    * round-trip through the partitioner untouched). Keys absent from the
    * weighting pass (rows arriving after the count) fall back to bin
    * hash(key) % bins. */
  def repartitionByLoad(df: DataFrame, key: String, bins: Int): DataFrame = {
    val spark = df.sparkSession
    val weights = df.groupBy(key).agg(count(lit(1)).as("w"))
      .collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).toSeq
    val assignment = pack(weights, bins)
    val bcast = spark.sparkContext.broadcast(assignment)
    val keyIdx = df.schema.fieldIndex(key)
    val part = new Partitioner {
      override def numPartitions: Int = bins
      override def getPartition(k: Any): Int = k.asInstanceOf[Int]
    }
    val packed = df.rdd
      .map { row =>
        val k = String.valueOf(row.get(keyIdx))
        val bin = bcast.value.getOrElse(k, math.floorMod(k.hashCode, bins))
        (bin, row)
      }
      .partitionBy(part)
      .map(_._2)
    spark.createDataFrame(packed, df.schema)
  }

  /** Max bin load of a packing under the given weights — the makespan the
    * LPT bound applies to; exposed for tests and capacity planning. */
  def makespan(weights: Seq[(String, Long)], assignment: Map[String, Int],
      bins: Int): Long = {
    val loads = new Array[Long](bins)
    weights.foreach { case (k, w) => loads(assignment(k)) += w }
    loads.max
  }
}
