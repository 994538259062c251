package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class HashedDoc(doc_id: Long, content_hash: String)

/** One streaming SimHash near-dup hit (ids normalized: a < b). */
final case class SimhashPairHit(doc_id_a: Long, doc_id_b: Long, hamming: Int)

/** Per-(band, bucket) membership state: parallel (doc_id, simhash) lists. */
final case class BucketMembers(ids: List[Long], sigs: List[Long])

/** Streaming exact deduplication with custom state: the first document per
  * content hash passes, every later duplicate (same batch or any later
  * batch) is dropped. State per key is a single boolean via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset stateful-operator
  * surface; at scale state is hash-partitioned across executors and backed
  * by the state store, so the seen-set never lives on one machine.
  */
object StreamingDedup {

  /** (doc_id, text) stream -> first-seen documents as (doc_id, content_hash). */
  def firstSeen(docs: DataFrame): Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .as[HashedDoc]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (hash: String, rows: Iterator[HashedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic pick within the arriving micro-batch
            Iterator.single(rows.minBy(_.doc_id))
          })
  }

  /** [[firstSeen]] with BOUNDED state: on an unbounded stream the plain
    * variant keeps one state entry per content hash forever — state grows
    * with all-time distinct content. Here each hash's entry carries an
    * event-time TTL (timeout = the LATEST event time in the first-seen
    * micro-batch + ttl, clamped above the current watermark, fired once the
    * watermark passes it), so state size is bounded by the distinct hashes
    * arriving within one TTL window. The documented tradeoff: a duplicate
    * arriving more than `ttl` after its original is re-admitted as new —
    * the standard bounded-state dedup contract (same as any windowed
    * dedup / dropDuplicatesWithinWatermark). `docs` must carry an event
    * timestamp `ts`; `watermarkDelay` bounds lateness as usual — rows
    * strictly behind the watermark are dropped by the engine before they
    * reach the group function (spec-pinned). */
  def firstSeenTtl(docs: DataFrame, ttl: String,
      watermarkDelay: String = "0 seconds"): Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    val ttlMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    val ttlMillis = org.apache.spark.sql.catalyst.util.IntervalUtils
      .getDuration(ttlMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    docs
      // project BEFORE the watermark: a projection that re-derives the
      // event-time column after withWatermark would drop the watermark tag
      .select(col("doc_id"), col("ts").cast("timestamp").as("ts"),
        md5(col("text")).as("content_hash"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (hash: String, rows: Iterator[(Long, java.sql.Timestamp, String)],
            state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove() // TTL passed: forget the hash, bound the store
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // duplicate within TTL: suppressed, TTL NOT refreshed
          } else {
            val batch = rows.toArray
            state.update(true)
            // the timeout must sit strictly beyond the current watermark or
            // setTimeoutTimestamp throws and kills the whole query: a first
            // arrival already more than ttl behind the watermark (late data
            // admitted by a generous watermarkDelay) clamps to watermark+1ms
            // — it expires at the next trigger, the closest legal encoding
            // of "already expired"
            val raw = batch.iterator.map(_._2.getTime).max + ttlMillis
            state.setTimeoutTimestamp(
              math.max(raw, state.getCurrentWatermarkMs() + 1))
            val first = batch.minBy(_._1)
            Iterator.single(HashedDoc(first._1, hash))
          })
  }

  /** Streaming NEAR-duplicate pairs: SimHash banding as stateful stream
    * intake. Each arriving document's 64-bit SimHash splits into 4x16-bit
    * bands; state lives per (band, bucket) — exactly the batch banding's
    * bucket relation, hash-partitioned across executors — and holds the
    * (doc_id, simhash) list of that bucket's members. A new arrival emits
    * one pair per in-bucket member within Hamming <= maxHamming, exact
    * from the stored signatures alone (no shingle sets, 16 bytes/doc/band
    * of state), then joins the bucket. Pigeonhole completeness (distance
    * <= 3 forces agreement on >= 1 band) carries over verbatim, so the
    * emitted pair SET equals [[graft.dedup.Dedup.simhashPairs]] on the
    * same documents regardless of arrival order — pairs are normalized
    * (min, max) and a pair matching in several bands emits once per
    * matching band; callers dedup after materialization exactly like the
    * batch path's `.distinct()`. Unbounded streams bound state with the
    * same event-time-TTL pattern as [[firstSeenTtl]] (omitted here: the
    * driver feeds bounded corpora). */
  def simhashPairsStream(docs: DataFrame,
      maxHamming: Int = 3): Dataset[SimhashPairHit] = {
    require(maxHamming <= 3,
      s"4x16-bit banding is complete only for Hamming distance <= 3 (pigeonhole); " +
        s"maxHamming=$maxHamming would silently miss pairs — add bands instead")
    import docs.sparkSession.implicits._
    graft.dedup.Dedup.simhashSignatures(docs)
      .select(col("doc_id"), col("simhash"), posexplode(
        array((0 until 4).map(b =>
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bucket")))
      .as[(Long, Long, Int, Long)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, Long), rows: Iterator[(Long, Long, Int, Long)],
            state: GroupState[BucketMembers]) => {
          var members = state.getOption.getOrElse(BucketMembers(Nil, Nil))
          val out = List.newBuilder[SimhashPairHit]
          rows.foreach { case (docId, sig, _, _) =>
            members.ids.lazyZip(members.sigs).foreach { (id, sg) =>
              if (id != docId) {
                val h = java.lang.Long.bitCount(sg ^ sig)
                if (h <= maxHamming)
                  out += SimhashPairHit(math.min(id, docId),
                    math.max(id, docId), h)
              }
            }
            members = BucketMembers(docId :: members.ids, sig :: members.sigs)
          }
          state.update(members)
          out.result().iterator
        })
  }
}
