package graft.core

import org.apache.spark.sql.Dataset

/** Cache hygiene for library entry points that persist intermediates.
  *
  * The discovery/dedup builders persist internal relations (shingle
  * indexes, capture dictionaries, rule tables) because several downstream
  * consumers — often eagerly-built broadcast exchanges — would otherwise
  * recompute the same lineage in parallel. Left alone, those persisted
  * partitions accumulate across library calls until someone runs
  * `spark.catalog.clearCache()` (round-2 advice). The contract here:
  * materialize the COMPACT result relation into the cache, release every
  * internal intermediate, and hand the caller exactly one cached handle —
  * the returned Dataset — to `unpersist()` when they are done with it.
  *
  * Results funneled through this helper are decision/summary relations
  * (CINDs, near-dup pairs, overlap counts, histograms): orders of magnitude
  * smaller than their inputs, so caching them is noise. Lineage is kept
  * (persist, not checkpoint), so evicted or lost cache blocks recompute
  * instead of failing the job at cluster scale.
  */
private[graft] object CacheOps {
  def cacheResult[T](result: Dataset[T], internal: Seq[Dataset[_]]): Dataset[T] = {
    val out = result.persist()
    out.count() // materialize: internal caches are fully consumed after this
    internal.foreach(_.unpersist())
    out
  }
}
