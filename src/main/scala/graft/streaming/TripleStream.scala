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
}
