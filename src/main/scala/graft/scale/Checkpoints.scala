package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Shared lifecycle helper for localCheckpoint()ed relations used inside
  * bounded iterative loops (dedup connected components, k-core peel). */
object Checkpoints {

  /** Free a localCheckpoint()ed DataFrame's blocks. They live at the RDD
    * level (MEMORY_AND_DISK), invisible to the CacheManager, so
    * Dataset.unpersist is a no-op on them — without this a long cluster
    * loop accumulates one materialized copy per iteration until
    * ContextCleaner GC. The checkpointed RDD is the LogicalRDD leaf of
    * the returned frame's plan. Single-shot checkpoints that outlive the
    * operator (e.g. collocations' count relation) must NOT call this —
    * ContextCleaner reclaims those once the caller releases the result. */
  def drop(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
