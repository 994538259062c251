package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextAnalysis

/** Per-shard Misra-Gries state: the bounded summary arrays, the shard's
  * total token weight, and a version bumped per micro-batch (the sink
  * accumulates one row per update; the LATEST version is the live
  * summary). */
final case class MgShardState(tokens: Array[String], counts: Array[Long],
    n: Long, ver: Long)

/** One emitted shard summary (arrays as Seqs for the row encoder). */
final case class MgShardOut(shard: Int, ver: Long, tokens: Seq[String],
    counts: Seq[Long], n: Long)

/** Per-shard KMV state: the k smallest distinct hash values seen by this
  * shard, plus the version bump (latest row per shard is live). */
final case class KmvShardState(vs: Array[Long], ver: Long)

/** One emitted KMV shard summary. */
final case class KmvShardOut(shard: Int, ver: Long, vs: Seq[Long])

/** Per-(group, shard) quantile-sketch state: rows seen, the shard's
  * current sampling level, and the survivor (value, coin) pairs. */
final case class QsShardState(n: Long, level: Int, vs: Array[Long],
    hs: Array[Long], ver: Long)

/** One emitted quantile-sketch shard summary. */
final case class QsShardOut(g: String, shard: Int, ver: Long, n: Long,
    level: Int, vs: Seq[Long], hs: Seq[Long])

/** STREAMING text sketches — the online halves of the batch
  * sketch-then-recount operators in [[graft.text.TextAnalysis]]. */
object StreamingText {

  /** Streaming KMV (k-minimum-values) sketch intake: the fourth mergeable
    * sketch run ONLINE. Hash values partition over `numShards` state
    * cells by pmod (shards hold DISJOINT value ranges, so the batch-side
    * merge is a plain union, no dedup); each micro-batch folds its share
    * into the shard's k smallest distinct values — state is EXACTLY
    * k·numShards longs, bounded for any stream length, unlike a
    * groupBy(v) streaming distinct whose state grows with the vocabulary.
    * Update mode; take the latest version per shard. */
  def kmvSketchStream(docs: DataFrame, k: Int = 64,
      numShards: Int = 8): Dataset[KmvShardOut] = {
    import docs.sparkSession.implicits._
    require(k >= 2 && numShards > 0, "need k >= 2 and at least one shard")
    docs.select(explode(TextAnalysis.shingles(col("text"))).as("sh"))
      .select(TextAnalysis.kmvHash(col("sh")).as("v"))
      .select(col("v"), pmod(col("v"), lit(numShards)).cast("int").as("shard"))
      .as[(Long, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[(Long, Int)],
            state: GroupState[KmvShardState]) => {
          val st = state.getOption.getOrElse(KmvShardState(Array.empty, 0L))
          val merged = (st.vs.toSet ++ rows.map(_._1)).toArray.sorted.take(k)
          val next = KmvShardState(merged, st.ver + 1)
          state.update(next)
          Iterator.single(KmvShardOut(shard, next.ver, merged.toIndexedSeq))
        })
  }

  /** Streaming Misra-Gries heavy-hitter intake: the mergeable-summary
    * sketch ([[graft.scale.MisraGries]]) run ONLINE across micro-batches.
    * Tokens hash-partition over `numShards` state cells
    * (`flatMapGroupsWithState` keyed by shard), each micro-batch folds its
    * share into the shard's bounded `cap`-counter summary — the SAME
    * reduce the batch aggregator uses — and emits the updated summary
    * with a bumped version (Update mode; take the latest per shard).
    *
    * The per-shard guarantee composes: every occurrence of a token lands
    * in ONE shard, and that shard's undercount is at most
    * N_shard/(cap+1) <= N/(cap+1), so any token with true corpus
    * frequency > N/(cap+1) survives in its shard's summary — the union
    * of shard candidate sets is a superset of every true heavy hitter,
    * exactly what the exact batch-side recount needs. State is
    * numShards x O(cap) — constant, never vocabulary-sized — and shards
    * spread across executors like any keyed state. */
  /** Streaming Count-Min intake: the (d, cell) coordinate stream runs
    * through a plain STREAMING AGGREGATION — state is exactly the sketch
    * relation (at most depth x width keyed counts, bounded by geometry,
    * never by the stream), merged across micro-batches by the engine's
    * own sum-combine; complete-mode output IS the live sketch. The
    * estimate tail is batch-side and shared with the batch query, so the
    * stream-built sketch answers with the same oracle. */
  def cmsCellsStream(docs: DataFrame, depth: Int = 4,
      width: Int = 1024): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .select(TextAnalysis.cmsCoords(col("token"), depth, width))
      .groupBy("d", "cell").agg(count(lit(1)).as("n"))

  /** Streaming HyperLogLog intake: the (register, rho) stream through a
    * complete-mode streaming MAX aggregation — state is the 2^p register
    * relation itself (bounded by precision, never by the stream), and
    * max-merge across micro-batches is exactly HLL's merge operator.
    * Absent registers surface as rho 0 in the driver's final fill. */
  def hllRegistersStream(docs: DataFrame, p: Int = 10): DataFrame =
    TextAnalysis.hllPairs(docs, p)
      .groupBy("register").agg(max("rho").as("max_rho"))

  /** Streaming quantile-sketch intake: the hash-rank subsample summary
    * ([[graft.stats.Profile.quantileSketch]]) run ONLINE. Rows
    * (group, value, key) shard over `numShards` state cells by the coin's
    * HIGH bits — the level filter tests the LOW bits, so shard routing and
    * survival stay independent (sharding by pmod would funnel every
    * level>=3 survivor into shard 0). Each micro-batch folds its share
    * into the shard's survivor set; when survivors exceed `cap` the shard
    * compacts — level += 1, survivors re-filtered by one more coin bit —
    * so state is numShards x O(cap) for ANY stream length, and the final
    * shard state is arrival-order-independent: survivors-at-level-j of
    * the full set only grow with prefixes, so the final level is exactly
    * the least j whose full survivor set fits cap. Update mode; take the
    * latest version per (group, shard). The batch-side tail re-filters the
    * union UP to the batch's global level (sample nesting) and answers
    * with the batch query's oracle. */
  def quantileSketchStream(rows: DataFrame, cap: Int = 512,
      numShards: Int = 8): Dataset[QsShardOut] = {
    import rows.sparkSession.implicits._
    require(cap >= 16 && numShards > 0, "degenerate sketch geometry")
    rows
      .select(col("g"), col("v").cast("long").as("v"),
        graft.stats.Profile.sketchCoin(col("k")).as("h"))
      .select(col("g"), col("v"), col("h"),
        pmod(shiftrightunsigned(col("h"), 20), lit(numShards))
          .cast("int").as("shard"))
      .as[(String, Long, Long, Int)]
      .groupByKey(r => (r._1, r._4))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (String, Int), it: Iterator[(String, Long, Long, Int)],
            state: GroupState[QsShardState]) => {
          val st = state.getOption
            .getOrElse(QsShardState(0L, 0, Array.empty, Array.empty, 0L))
          var n = st.n
          var level = st.level
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var i = 0
          while (i < st.vs.length) { buf += ((st.vs(i), st.hs(i))); i += 1 }
          def mask = (1L << level) - 1
          it.foreach { case (_, v, h, _) =>
            n += 1
            if ((h & mask) == 0L) {
              buf += ((v, h))
              while (buf.length > cap) {
                level += 1
                buf.filterInPlace(p => (p._2 & mask) == 0L)
              }
            }
          }
          val next = QsShardState(n, level, buf.map(_._1).toArray,
            buf.map(_._2).toArray, st.ver + 1)
          state.update(next)
          Iterator.single(QsShardOut(key._1, key._2, next.ver, n, level,
            next.vs.toIndexedSeq, next.hs.toIndexedSeq))
        })
  }

  def mgSummaryStream(docs: DataFrame, cap: Int = 512,
      numShards: Int = 8): Dataset[MgShardOut] = {
    import docs.sparkSession.implicits._
    require(numShards > 0, "need at least one shard")
    val mg = new graft.scale.MisraGries(cap)
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .select(col("token"),
        pmod(hash(col("token")), lit(numShards)).cast("int").as("shard"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[(String, Int)],
            state: GroupState[MgShardState]) => {
          val st = state.getOption
            .getOrElse(MgShardState(Array.empty, Array.empty, 0L, 0L))
          var buf = graft.scale.MgBuf(st.tokens, st.counts)
          var n = st.n
          rows.foreach { case (t, _) => buf = mg.reduce(buf, t); n += 1 }
          val next = MgShardState(buf.tokens, buf.counts, n, st.ver + 1)
          state.update(next)
          Iterator.single(MgShardOut(shard, next.ver,
            buf.tokens.toIndexedSeq, buf.counts.toIndexedSeq, n))
        })
  }
}
