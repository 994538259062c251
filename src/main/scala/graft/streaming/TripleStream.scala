package graft.streaming

import graft.cind.CindEngine
import graft.rdf.TripleSource
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Streaming side of the CIND statistics pipeline.
  *
  * The reference is batch-only; at continuous-ingest scale the frequency
  * profile (condition counts — the pruning input of discovery, reference
  * FrequentConditionPlanner.scala:291-311) is naturally maintained as a
  * stateful streaming aggregation and snapshotted into each batch
  * discovery run. Because the batch operators are declarative
  * (explode + groupBy + count, no RDD/collect), the SAME plan runs under
  * Structured Streaming unchanged — these are thin facades plus the spec
  * (`TripleStreamSpec`) pinning batch/stream parity across micro-batches.
  */
object TripleStream {

  /** Streaming N-Triples source: a text file stream (new files appear in
    * `path`) parsed with the exact batch parser — comment filter, quoted
    * literals, N-Quads 4th-term tolerance included. */
  def readTriplesStream(spark: SparkSession, path: String): DataFrame =
    TripleSource.parseNTriples(spark.readStream.textFile(path))

  /** Incremental condition counts over a streaming (subj, pred, obj)
    * relation: the batch `CindEngine.conditionCounts` plan as a stateful
    * streaming aggregation (run with update/complete output mode). The
    * state store is hash-partitioned on (cond_code, v1, v2) — the same
    * key the batch shuffle uses. */
  def conditionCounts(triples: DataFrame): DataFrame =
    CindEngine.conditionCounts(triples)

  /** Parse a stream of raw N-Triples lines (e.g. from a socket/queue
    * source) with the batch parser. */
  def parseLines(lines: Dataset[String]): DataFrame =
    TripleSource.parseNTriples(lines)

  /** Continuous CIND discovery over a triple stream: each micro-batch
    * appends to a parquet snapshot and full batch discovery re-runs on the
    * accumulated snapshot, handing the result to `onSnapshot`.
    *
    * Why snapshot-recompute and not incremental state: a CIND is a GLOBAL
    * property — one new triple can break an inclusion certified by
    * millions (dep support grows; co-count does not) — so exact
    * incremental maintenance degenerates to keeping every
    * (capture, value) pair in the state store, i.e. the batch engine's
    * working set held hostage in streaming state. The scalable shape is
    * the frequency profile as true incremental state ([[conditionCounts]])
    * plus periodic full discovery over the accumulated columnar snapshot —
    * which is exactly what foreachBatch expresses: the batch plan (with
    * all its pruning/broadcast/skew machinery) runs unchanged per trigger.
    * Parity with one-shot batch discovery is spec-pinned. */
  def discoverSnapshots(triples: DataFrame, minSupport: Int,
      snapshotDir: String, checkpointDir: String)(
      onSnapshot: (Dataset[graft.cind.CindRow], Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    triples.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(snapshotDir)
        val snapshot = batch.sparkSession.read.parquet(snapshotDir)
        onSnapshot(CindEngine.allCinds(snapshot, minSupport), batchId)
      }
      .start()
}
