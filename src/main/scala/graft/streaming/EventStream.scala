package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Side-tagged row of the streaming as-of union (side 1 = left, 0 = right). */
final case class AsOfTagged(key: Long, ts: java.sql.Timestamp, side: Int,
    id: Long, v: Double)

/** Streaming as-of output: left row + latest preceding right (None when no
  * right row precedes). */
final case class AsOfOut(id: Long, key: Long, ts: java.sql.Timestamp,
    asof_ts: Option[java.sql.Timestamp], asof_v: Option[Double])

/** Per-key as-of state: lefts awaiting maturity + candidate rights. */
final case class AsOfBuf(lefts: List[AsOfTagged], rights: List[AsOfTagged])

/** Stage-tagged funnel event (stage is the 0-based index into the stage
  * sequence). */
final case class FunnelEv(user_id: Long, ts: java.sql.Timestamp, stage: Int)

/** Per-user funnel state: events not yet matured by the watermark +
  * per-stage qualifying times (epoch-MICROS, -1 = not yet reached). */
final case class FunnelBuf(pending: List[FunnelEv], quals: List[Long])

/** One funnel progression: user reached `stage` (1-based) at `qts`. */
final case class FunnelHit(user_id: Long, stage: Int, qts: java.sql.Timestamp)

/** One event of the streaming rolling-stats input. */
final case class RollEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
    value: Double)

/** Per-user rolling state: events not yet matured by the watermark + the
  * last (frame-1) MATURED values, oldest first — the prefix every future
  * event's frame starts from. */
final case class RollBuf(pending: List[RollEv], tail: List[Double])

/** Rolling-stats output row (avg_raw is rounded by the caller's select so
  * stream and batch share the same `round` evaluation). */
final case class RollOut(event_id: Long, user_id: Long, n_window: Long,
    avg_raw: Double, max_value: Double)

/** One event of the streaming transition-matrix input. */
final case class TransEv(user_id: Long, ts: java.sql.Timestamp,
    event_id: Long, event_type: String)

/** Per-user transition state: not-yet-matured events + the LAST matured
  * event_type (all the history a first-order chain needs). */
final case class TransBuf(pending: List[TransEv], last: Option[String])

/** One emitted transition; the caller counts pairs batch-side. */
final case class TransOut(prev_type: String, next_type: String, user_id: Long)

/** One gap-fill stream input row (value already in integer cents). */
final case class GapEv(event_type: String, ts: java.sql.Timestamp, vc: Long)

/** Per-type gap-fill state: the next bucket to emit (-1 before the first
  * observation), the carried LOCF cents, and the open buckets' partial
  * (n, cents) sums — bounded by the watermark window over the bucket
  * width, never by the stream. */
final case class GapBuf(nextBucket: Long, lastCents: Long,
    pending: Map[Long, (Long, Long)])

/** One emitted gap-fill bucket (mirrors the batch gapFill row). */
final case class GapOut(event_type: String, bucket_start: Long,
    n_events: Long, filled: Boolean, last_cents: Long)

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). The transforms are
  * batch/stream agnostic: the same plan runs on a bounded DataFrame (the
  * driver's batch oracle path) and on a readStream/MemoryStream source with
  * a watermark (EventStreamSpec proves batch/stream parity).
  */
object EventStream {

  /** 5-minute tumbling-window counts per event type. `events.ts` must be a
    * TIMESTAMP column; output (bucket_start epoch-seconds, event_type,
    * n_events). */
  def windowedCounts(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("event_type"), col("n_events"))
  }

  /** STREAM-STATIC enrichment join + windowed rollup — the dimension-
    * attach every event pipeline runs before aggregating: each event
    * joins the small static (event_type → category, weight) table and
    * the stream aggregates per (5-min window, category). The static side
    * broadcasts (in streaming, Spark re-plans the broadcast per
    * micro-batch, so a slowly-refreshed dimension is picked up without
    * restarting the query — the canonical enrichment deployment); the
    * join is LEFT so unmapped types land in 'other' with weight 0 rather
    * than silently dropping events. Money is cents-exact
    * (round(value·100) · weight). Output: (bucket_start epoch-seconds,
    * category, n_events, weighted_cents). */
  def enrichedWindowTotals(events: DataFrame, dim: DataFrame,
      watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .join(broadcast(dim), Seq("event_type"), "left")
      .select(col("ts"),
        coalesce(col("category"), lit("other")).as("category"),
        (round(col("value") * 100).cast("long") *
          coalesce(col("weight"), lit(0L))).as("wcents"))
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("category"))
      .agg(count(lit(1)).as("n_events"), sum("wcents").as("weighted_cents"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("category"), col("n_events"), col("weighted_cents"))
  }

  /** 5-minute tumbling-window DISTINCT-USER counts — the "active users
    * per window" panel. Exact distinct via dedup-then-count: a first
    * aggregation to (window, user) rows, a second to the per-window user
    * count — never a count-distinct Expand over the event stream. In
    * streaming this is a CHAINED STATEFUL pair (two stateful aggregations
    * in one append-mode query — supported since Spark 3.4's multiple
    * stateful operators; the first agg's state is the in-flight windows'
    * distinct user sets, the second finalizes when the watermark closes
    * the window). Output (bucket_start epoch-seconds, n_users). */
  def windowedUserCounts(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"), col("n_users"))
  }

  /** Hopping (sliding) window counts per event type: 10-minute windows
    * advancing every 5 minutes, so each event lands in exactly
    * size/slide = 2 overlapping windows. Uses the native `window(col,
    * size, slide)` generator — Spark expands the window set map-side
    * (epoch-aligned starts, the same alignment the tumbling variant
    * uses) and the aggregation stays a hash aggregate with map-side
    * combine; the only shuffle is the groupBy, exactly as in
    * [[windowedCounts]]. Output (bucket_start epoch-seconds,
    * event_type, n_events). */
  def hoppingCounts(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("event_type"), col("n_events"))
  }

  /** Trending event types: the top-`k` types per 5-minute window by
    * count — windowed counts + rank-per-window, which Spark compiles to
    * WindowGroupLimit (each partition keeps at most k rows BEFORE the
    * exchange). The rank partition is one window bucket, whose row count
    * is the event-type vocabulary — dimension-bounded at any scale.
    * Output: (bucket_start, rank, event_type, n_events). */
  def trendingTypes(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket_start")
      .orderBy(col("n_events").desc, col("event_type"))
    windowedCounts(events, watermark = false)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-user sessionization with a 30-minute gap, via the session_window
    * native operator: (user_id, session_start, n_events). */
  def sessions(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"))
  }

  /** Ordered conversion funnel: stage k counts the users whose FIRST
    * qualifying stage-k event occurs at-or-after their stage-(k-1)
    * qualifying time (stage 1 qualifies unconditionally) — events in the
    * wrong order do NOT count. Relational shape: per stage one equi-join
    * on the user against the previous stage's per-user qualifying times
    * plus a min aggregation — no per-user event-sequence materialization,
    * no windows; every step is a map-side-combinable aggregate over a
    * hash join on user_id. Output: (stage, event_type, n_users). */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    stageCounts(funnelAnchors(events, stages, None), stages)
  }

  /** The ONE anchor ladder shared by [[funnel]], [[funnelWindowed]] and
    * [[funnelTimes]]: per stage, the user's EARLIEST qualifying instant at
    * or after the previous stage's anchor — with the optional max-gap
    * bound riding the join residual. One user-keyed join per stage against
    * the shrinking previous-anchor relation, combinable min. Keeping one
    * copy is the same drift guard as the shared split coin: a ladder fix
    * (tie-breaking, dedup) cannot silently miss a sibling. */
  private def funnelAnchors(events: DataFrame, stages: Seq[String],
      maxGapUs: Option[Long]): Seq[DataFrame] = {
    var prev: DataFrame = null
    stages.zipWithIndex.map { case (st, i) =>
      val ev = events.filter(col("event_type") === st)
      val q =
        if (i == 0) ev.groupBy("user_id").agg(min("ts").as("qts"))
        else {
          val inGap = maxGapUs.fold(lit(true))(g =>
            unix_micros(col("ts")) - unix_micros(col("pts")) <= g)
          ev.join(prev.select(col("user_id"), col("qts").as("pts")), "user_id")
            .filter(col("ts") >= col("pts") && inGap)
            .groupBy("user_id").agg(min("ts").as("qts"))
        }
      prev = q
      q
    }
  }

  /** Per-stage user counts over [[funnelAnchors]] output. */
  private def stageCounts(anchors: Seq[DataFrame],
      stages: Seq[String]): DataFrame =
    anchors.zip(stages).zipWithIndex.map { case ((q, st), i) =>
      q.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(st).as("event_type"),
          col("n_users"))
    }.reduce(_.unionAll(_))

  /** TIME-CONSTRAINED funnel — each step must follow the previous stage's
    * anchor within `maxGapSec` (the product-analytics semantic: a click a
    * week after the view is not THAT view's conversion). Same ordered
    * first-occurrence anchor ladder as [[funnel]] — per stage one
    * user-keyed join against the (users-at-previous-stage)-sized anchor
    * relation plus a combinable min — with the gap bound riding the join
    * residual; anchors still take the EARLIEST qualifying instant, so a
    * user can convert late at step 2 yet still qualify at step 3 only
    * within the window of that late anchor. Deterministic integer
    * comparisons on epoch micros in both engines.
    * Output: (stage, event_type, n_users). */
  def funnelWindowed(events: DataFrame, stages: Seq[String],
      maxGapSec: Long = 3600L): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    require(maxGapSec > 0, "gap bound must be positive")
    stageCounts(
      funnelAnchors(events, stages, Some(maxGapSec * 1000000L)), stages)
  }

  /** Funnel conversion LATENCY: for users who reach stage i+1, the time
    * from their stage-i anchor to the stage-i+1 anchor (the same ordered
    * first-occurrence anchors [[funnel]] counts — min ts at or after the
    * previous stage's anchor), reported per transition as exact
    * epoch-micros integer stats (n, sum, min, max — the float mean is the
    * caller's division). Same per-stage user-join ladder as the funnel;
    * one extra per-transition aggregate. Output:
    * (stage_from, stage_to, n_users, sum_delta_us, min_delta_us,
    * max_delta_us). */
  def funnelTimes(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "need at least two funnel stages")
    val anchors = funnelAnchors(events, stages, None)
    anchors.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      a.select(col("user_id"), col("qts").as("ats"))
        .join(b.select(col("user_id"), col("qts").as("bts")), "user_id")
        .select((unix_micros(col("bts")) - unix_micros(col("ats"))).as("d"))
        .agg(count(lit(1)).as("n_users"), sum("d").as("sum_delta_us"),
          min("d").as("min_delta_us"), max("d").as("max_delta_us"))
        .select(lit(i + 1).as("stage_from"), lit(i + 2).as("stage_to"),
          col("n_users"), col("sum_delta_us"), col("min_delta_us"),
          col("max_delta_us"))
    }.reduce(_.unionAll(_))
  }

  /** Per-user event-type transition matrix (the first-order Markov view
    * of user behavior): for every consecutive pair of events of one user
    * in time order, count occurrences and distinct users per
    * (prev_type, next_type) cell. One shuffle total for the sequencing —
    * the lag window partitions by user — and the distinct-user count is
    * the dedup-then-count two-phase (group on (cell, user) first), never
    * a count-distinct Expand over the full pair stream. Ordering ties
    * break on event_id so the sequence is deterministic under equal
    * timestamps. Output: (prev_type, next_type, n_transitions, n_users). */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("prev_type", "next_type")
      .agg(sum("n").as("n_transitions"), count(lit(1)).as("n_users"))
  }

  /** Top event paths: the k most frequent `depth`-step event-type
    * sequences across all users (path mining — which journeys dominate
    * the product). Per user, events order by (ts, event_id) and each
    * position anchors one path of the next `depth` types via lead();
    * paths spanning a user boundary never form because the window
    * partitions by user. Count + distinct-user support per path, then a
    * deterministic top-k by (count desc, path asc) — planned as
    * TakeOrderedAndProject, never a global sort. One window shuffle on
    * user, one aggregation shuffle on path.
    * Output: (rank, path, n_occurrences, n_users). */
  def topPaths(events: DataFrame, depth: Int = 3, k: Int = 20): DataFrame = {
    require(depth >= 2, "a path needs at least two steps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = (1 until depth).map(i =>
      lead(col("event_type"), i).over(w).as(s"_s$i"))
    val paths = events
      .select(col("user_id") +: col("event_type").as("_s0") +: steps: _*)
      .filter(col(s"_s${depth - 1}").isNotNull)
      .select(col("user_id"),
        concat_ws(">", (0 until depth).map(i => col(s"_s$i")): _*).as("path"))
    val counted = paths
      .groupBy("path", "user_id").agg(count(lit(1)).as("n"))
      .groupBy("path")
      .agg(sum("n").as("n_occurrences"), count(lit(1)).as("n_users"))
      .orderBy(col("n_occurrences").desc, col("path"))
      .limit(k)
    counted.select(
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_occurrences").desc, col("path"))).cast("long").as("rank"),
      col("path"), col("n_occurrences"), col("n_users"))
  }

  /** Retention cohorts: users cohort by their FIRST active epoch-day;
    * cell (cohort_day, day_offset) counts the cohort's users active
    * `day_offset` days later. The standard activation/retention matrix,
    * shaped for scale: activity first dedups to (user, day) — one hash
    * aggregate, the only row-count-sized shuffle — then the per-user min
    * reuses that partitioning, the cohort join is keyed on user, and the
    * final cell count is a plain count over already-distinct rows (never
    * a count-distinct Expand). Output: (cohort_day, day_offset, n_users). */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val first = active.groupBy("user_id").agg(min("day").as("cohort_day"))
    active.join(first, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Value OUTLIERS per event type: events whose value exceeds the
    * type's exact percentile threshold — the monitoring primitive behind
    * "alert on anomalous spend/latency". Values fix to milli-integers
    * (floor(value·1000) — engine-agnostic) and the threshold is the exact
    * rank-at-floor((n−1)·pct/100) value computed by COUNTING over the
    * type's distinct values (the [[graft.stats.Profile.quantiles]]
    * shape): one hash aggregation to the (type, value) histogram, a
    * cumulative window over each type's DISTINCT values (bounded by value
    * cardinality, never row count), a tiny per-type threshold relation
    * broadcast back, and a map-side filter. No global sort, no per-type
    * full ranking. Output: strictly-above rows
    * (event_id, event_type, value_milli, thr_milli). */
  def valueOutliers(events: DataFrame, pct: Int = 99): DataFrame = {
    require(pct >= 1 && pct <= 99, "pct in 1..99")
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(col("event_id"), col("event_type"),
      floor(col("value") * 1000).cast("long").as("value_milli"))
    val hist = ev.groupBy("event_type", "value_milli").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("value_milli")
    val cum = hist.withColumn("cum", sum("cnt").over(w))
    val thr = cum
      .join(ev.groupBy("event_type").agg(count(lit(1)).as("n")), "event_type")
      .filter(col("cum") >= floor((col("n") - 1) * pct / 100.0) + 1)
      .groupBy("event_type").agg(min("value_milli").as("thr_milli"))
    ev.join(broadcast(thr), "event_type")
      .filter(col("value_milli") > col("thr_milli"))
      .select("event_id", "event_type", "value_milli", "thr_milli")
  }

  /** Sliding-window mean-shift changepoint scores over the per-type
    * event-rate series: bucket events into `bucketSec` windows, then for
    * every bucket with `w` populated buckets on BOTH sides, score the
    * level shift as sum(next w) − sum(previous w). A spike or drop in a
    * type's rate shows up as a large |shift| centered on the change —
    * the deterministic two-sample precursor to CUSUM (whose running
    * reset-max is a recursion neither SQL engine expresses; the
    * symmetric-window form is exactly reproducible in both).
    *
    * Scale: one hash-agg shuffle reduces the event stream to the
    * (type, bucket) rate relation — bounded by types × time buckets,
    * never row count; the scoring window partitions by type and is
    * serial only in a type's BUCKET count (a 100 TB year of hourly
    * buckets is 8,760 rows per type). Frames span populated buckets
    * (empty buckets don't emit rows — both engines see the same
    * relation).
    * Output: (event_type, bucket_start, n_events, before_sum,
    * after_sum, shift), rows where both frames are full. */
  def changepoints(events: DataFrame, bucketSec: Long = 3600,
      w: Int = 6): DataFrame = {
    require(w >= 1, "window must span at least one bucket")
    import org.apache.spark.sql.expressions.Window
    val rate = events
      .select(col("event_type"),
        (floor(unix_timestamp(col("ts")) / bucketSec) * bucketSec)
          .cast("long").as("bucket_start"))
      .groupBy("event_type", "bucket_start").agg(count(lit(1)).as("n_events"))
    val ord = Window.partitionBy("event_type").orderBy("bucket_start")
    val before = ord.rowsBetween(-w, -1)
    val after = ord.rowsBetween(1, w)
    rate
      .withColumn("before_sum", sum("n_events").over(before))
      .withColumn("after_sum", sum("n_events").over(after))
      .withColumn("nb", count(lit(1)).over(before))
      .withColumn("na", count(lit(1)).over(after))
      .filter(col("nb") === w && col("na") === w)
      .select(col("event_type"), col("bucket_start"), col("n_events"),
        col("before_sum"), col("after_sum"),
        (col("after_sum") - col("before_sum")).as("shift"))
  }

  /** Gap-filled time series with forward-fill — the resample step every
    * monitoring/feature pipeline runs before a model sees the series:
    * per-type bucket counts, a complete bucket SPINE from the global
    * [min, max] bucket range (one broadcast bounds row + a per-type
    * `sequence` explode — the spine is NEVER a shuffle, it generates
    * map-side on the types relation), missing buckets re-enter as
    * (n_events = 0, filled = true), and the value column forward-fills
    * (LOCF: `last(_, ignoreNulls)` over the per-type ordered window —
    * the observation carried until the next one, -1 before any). The
    * window partitions by type: spine length is bounded by the time
    * range over the bucket width, dimension-scale per type at any event
    * volume. Output: (event_type, bucket_start, n_events, filled,
    * last_cents). */
  def gapFill(events: DataFrame, bucketSec: Long = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = events
      .select(col("event_type"),
        (floor(unix_timestamp(col("ts")) / bucketSec) * bucketSec)
          .cast("long").as("bucket_start"),
        (round(col("value") * 100)).cast("long").as("vc"))
      .groupBy("event_type", "bucket_start")
      .agg(count(lit(1)).as("n"), sum("vc").as("cents"))
    val bounds = c.agg(min("bucket_start").as("lo"), max("bucket_start").as("hi"))
    val spine = events.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(bucketSec)))
          .as("bucket_start"))
    val w = Window.partitionBy("event_type").orderBy("bucket_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(c, Seq("event_type", "bucket_start"), "left")
      .select(col("event_type"), col("bucket_start"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.as("filled"),
        coalesce(last(col("cents"), ignoreNulls = true).over(w), lit(-1L))
          .as("last_cents"))
  }

  /** STREAMING gap-fill — [[gapFill]]'s per-type resample run as a
    * watermark-driven state machine, the one stateful shape the rest of
    * the stream suite doesn't exercise: rows only ACCUMULATE state; the
    * emission clock is the WATERMARK itself (every bucket whose end the
    * watermark passes emits exactly once, observed or not — missing
    * buckets emit as filled zero rows purely from the timer, no input
    * row ever carries them). Per type the state is (next bucket to emit,
    * carried LOCF cents, open buckets' partial sums) — bounded by the
    * watermark window over the bucket width; an event-time timeout
    * re-fires on every watermark advance so gaps keep emitting while the
    * type is silent. A bucket [s, s+step) is mature when s+step <= wm
    * (every possible ts in it is strictly behind the watermark — the
    * suite's maturity convention). Emission starts at the type's FIRST
    * observed bucket (a stream cannot know the global min the batch
    * spine uses — the oracle mirrors this). Output rows match [[gapFill]]
    * except that per-type spines begin at their own first bucket. */
  def gapFillStream(events: DataFrame, bucketSec: Long = 300): Dataset[GapOut] = {
    import events.sparkSession.implicits._
    val step = bucketSec * 1000L // state math in millis (watermark units)
    events
      .select(col("event_type"), col("ts").cast("timestamp").as("ts"),
        round(col("value") * 100).cast("long").as("vc"))
      .withWatermark("ts", "0 seconds")
      .as[GapEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[GapEv], state: GroupState[GapBuf]) => {
          val st = state.getOption.getOrElse(GapBuf(-1L, -1L, Map.empty))
          val incoming = if (state.hasTimedOut) Nil else rows.toList
          var pending = st.pending
          var nextBucket = st.nextBucket
          incoming.foreach { e =>
            val b = Math.floorDiv(e.ts.getTime, step) * step
            val (n, c) = pending.getOrElse(b, (0L, 0L))
            pending = pending.updated(b, (n + 1, c + e.vc))
            if (nextBucket == -1L || b < nextBucket) nextBucket = b
          }
          val wm = state.getCurrentWatermarkMs()
          var lastCents = st.lastCents
          val out = scala.collection.mutable.ArrayBuffer.empty[GapOut]
          if (nextBucket != -1L) {
            while (nextBucket + step <= wm) {
              val hit = pending.get(nextBucket)
              hit.foreach { case (_, c) => lastCents = c }
              out += GapOut(key, nextBucket / 1000L, hit.fold(0L)(_._1),
                hit.isEmpty, lastCents)
              pending = pending - nextBucket
              nextBucket += step
            }
          }
          if (nextBucket == -1L && pending.isEmpty) state.remove()
          else {
            state.update(GapBuf(nextBucket, lastCents, pending))
            // wake on every watermark advance: gaps must keep emitting
            // even while this type sees no rows at all
            state.setTimeoutTimestamp(wm + 1)
          }
          out.iterator
        })
  }

  /** Range join: each left row gets the ranges [lo, hi) that contain
    * `valueCol`. Spark plans a plain `lo <= v AND v < hi` join as
    * BroadcastNestedLoopJoin — fine for a literal band table, quadratic
    * death once the range table is large. Scalable shape instead:
    * ranges EXPLODE into fixed-width buckets (a range spans
    * ceil(len/width) buckets), both sides equi-join on the bucket id —
    * a hash join Spark shuffles/broadcasts like any other — and the
    * exact containment predicate filters the survivors. Cost is
    * O(|left| + Σ range_len/width) join rows instead of |left|x|ranges|.
    * `bucketWidth` trades fan-out for selectivity: ~ the median range
    * length is right.
    *
    * Inner semantics (unmatched left rows drop); ranges may overlap —
    * a row matches each containing range. Output: left.* + the range
    * table's payload columns. */
  def rangeJoin(left: DataFrame, ranges: DataFrame, valueCol: String,
      lo: String = "lo", hi: String = "hi",
      bucketWidth: Double = 1.0): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // empty ranges would make sequence() run DESCENDING (start > stop)
    // and fabricate buckets — they can match nothing, drop them first
    val bucketed = ranges.filter(col(hi) > col(lo)).withColumn("_b",
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
        // hi is EXCLUSIVE: an integral hi/width needs no bucket of its own,
        // but any fractional part does — use ceil(hi/width)-1 via negation
        (-floor(-col(hi) / bucketWidth)).cast("long") - 1)))
    left
      .withColumn("_b", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(bucketed, Seq("_b"))
      .filter(col(lo) <= col(valueCol) && col(valueCol) < col(hi))
      .drop("_b")
  }

  /** STREAMING funnel — the watermarked per-user state machine computing
    * exactly [[funnel]]'s semantics online: a user reaches stage k at the
    * FIRST stage-k event at-or-after their stage-(k-1) qualifying time.
    * Out-of-order arrival is handled the same way as [[asOfJoinStream]]:
    * events buffer per user until the watermark passes them (no earlier
    * event can still arrive — the engine drops rows at-or-behind the
    * watermark), then matured events fold into the stage times in
    * event-time order, which makes each "first at-or-after" decision
    * final the moment it is taken. State is BOUNDED: matured events
    * leave immediately (only the per-stage times persist — one long per
    * stage) and the pending list holds at most one watermark window. An
    * event-time timeout re-visits users with buffered events on every
    * watermark advance, so quiet users still flush.
    *
    * Emits one [[FunnelHit]] per (user, stage) the moment the stage
    * becomes reached — the per-user progression log; the funnel COUNTS
    * are a trivial downstream aggregation of these hits (batch-side in
    * the bounded driver, or a streaming agg in production).
    * Comparisons are in epoch-micros (the events table's precision). */
  def funnelStream(events: DataFrame, stages: Seq[String],
      watermarkDelay: String = "0 seconds"): Dataset[FunnelHit] = {
    require(stages.nonEmpty, "at least one funnel stage")
    import events.sparkSession.implicits._
    val idx = typedLit(stages.zipWithIndex.toMap)
    events
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        element_at(idx, col("event_type")).as("stage"))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        funnelStep(stages.length))
  }

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def funnelStep(nStages: Int)(key: Long, rows: Iterator[FunnelEv],
      state: GroupState[FunnelBuf]): Iterator[FunnelHit] = {
    val st = state.getOption.getOrElse(FunnelBuf(Nil, List.fill(nStages)(-1L)))
    val incoming = if (state.hasTimedOut) Nil else rows.toList
    val wm = state.getCurrentWatermarkMs()
    // STRICTLY below: the engine still admits rows with ts == wm in a
    // later micro-batch, so maturing at the boundary could emit before an
    // equal-ts sibling arrives; ts == wm stays pending until wm advances
    val (mature, pending) = (st.pending ++ incoming)
      .partition(_.ts.getTime < wm)
    val quals = st.quals.toArray
    val out = List.newBuilder[FunnelHit]
    // event-time order makes each first-at-or-after decision final: the
    // first qualifying stage-k event seen IS the minimum qualifying one
    mature.sortBy(e => (micros(e.ts), e.stage)).foreach { e =>
      val k = e.stage
      if (quals(k) < 0 &&
          (k == 0 || (quals(k - 1) >= 0 && micros(e.ts) >= quals(k - 1)))) {
        quals(k) = micros(e.ts)
        out += FunnelHit(key, k + 1, e.ts)
      }
    }
    // the quals vector must OUTLIVE the pending buffer: dropping it once a
    // user is quiet would re-emit stages if the user returns. Per-user
    // steady state is nStages longs — the same footprint as any per-user
    // streaming aggregation.
    state.update(FunnelBuf(pending, quals.toList))
    if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1)
    out.result().iterator
  }

  /** Interval join (lookback enrichment): each left row pairs with EVERY
    * right row sharing its key whose time lies in
    * `[left.ts - lookback, left.ts]` — clicks to the views that preceded
    * them, alerts to the metrics window that explains them. Unlike
    * [[asOfJoin]] (latest-one), this is the all-matches variant, and it
    * maps DIRECTLY onto joins Spark already executes well:
    *
    *   - batch: an equi-join on (key, lookback-width time bucket) with
    *     the exact band as a post-join filter — never a nested-loop
    *     range join, and a HOT key's pairs split across its time buckets
    *     instead of serializing through one hash partition (each left
    *     row explodes into the two buckets its window can touch; a
    *     qualifying pair meets exactly once, in the right row's bucket);
    *   - streaming (`watermark = true`): Spark's native STREAM-STREAM
    *     inner join. Both sides get watermarks and the join condition
    *     carries the explicit time band, which is what lets the engine
    *     bound the buffered state (a right row is dropped once the
    *     left watermark passes `right.ts + lookback`). This is the
    *     production CDC-enrichment shape; [[graft.streaming.StreamDriver
    *     .intervalJoinStreamed]] drives it end-to-end on bounded data.
    *
    * Input shapes: left (id, key, ts), right (key, ts, v); ties at both
    * band edges MATCH (closed interval). Output: (id, key, ts, r_ts, v),
    * one row per qualifying pair. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lookback: String = "10 minutes", watermark: Boolean = false,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    if (watermark) {
      val l = left.withWatermark("ts", watermarkDelay)
        .select(col("id"), col("key").as("_lk"), col("ts").as("_lts"))
      val r = right.withWatermark("ts", watermarkDelay)
        .select(col("key").as("_rk"), col("ts").as("_rts"), col("v"))
      l.join(r, col("_lk") === col("_rk") &&
          col("_rts") >= col("_lts") - expr(s"INTERVAL $lookback") &&
          col("_rts") <= col("_lts"))
        .select(col("id"), col("_lk").as("key"), col("_lts").as("ts"),
          col("_rts").as("r_ts"), col("v"))
    } else {
      // SKEW-SAFE batch shape: the plain (key) equi-join serializes a hot
      // key — ALL its rows meet in one hash partition regardless of time.
      // Band time into lookback-width buckets instead (the rangeJoin
      // trick): each right row keys by its bucket, each left row explodes
      // into the EXACTLY TWO buckets its closed [ts-lookback, ts] window
      // can touch, and the join key becomes (key, bucket) — a hot key's
      // pairs split across as many partitions as it spans time buckets,
      // and each qualifying pair meets exactly once (in the right row's
      // own bucket), so no dedup is needed. Bucket ids are bucket-START
      // micros from pure long arithmetic (x - pmod(x, w)): floor-aligned
      // for any sign, never a float division that could misround near a
      // boundary. The interval width folds to a constant at planning.
      val w = expr(
        s"unix_micros(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL $lookback)")
      def bstart(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        c - pmod(c, w)
      val l = left
        .select(col("id"), col("key").as("_lk"), col("ts").as("_lts"),
          unix_micros(col("ts")).as("_lus"))
        .withColumn("_b", explode(sequence(
          bstart(col("_lus") - w), bstart(col("_lus")), w)))
      val r = right.select(col("key").as("_rk"), col("ts").as("_rts"),
        col("v"), bstart(unix_micros(col("ts"))).as("_rb"))
      l.join(r, col("_lk") === col("_rk") && col("_b") === col("_rb") &&
          col("_rts") >= col("_lts") - expr(s"INTERVAL $lookback") &&
          col("_rts") <= col("_lts"))
        .select(col("id"), col("_lk").as("key"), col("_lts").as("ts"),
          col("_rts").as("r_ts"), col("v"))
    }
  }

  /** As-of join: each left row gets the LATEST right row with the same key
    * and right.ts <= left.ts (an enrichment/point-in-time lookup — prices
    * to trades, last page view to a click). Spark has no native as-of
    * join; the naive shapes are a range join (quadratic per key) or a
    * per-left-row subquery (unusable). Spark-first shape instead:
    * UNION the two sides with a side tag and compute
    * `last(right payload, ignoreNulls)` over ONE window partitioned by key
    * and ordered by (ts, side) — a single shuffle on the key, linear work
    * per partition, and partitioned-window parallelism at any key
    * cardinality (never a global window).
    *
    * Contract: `right` must be unique per (key, ts) — pre-aggregate if
    * not, or which duplicate wins is engine-dependent (DuckDB's ASOF JOIN,
    * the oracle, has the same ambiguity). Ties right.ts == left.ts MATCH
    * (side order sorts the right row first, mirroring ASOF's `>=`).
    *
    * Output: left.* plus `asof_<p>` for each payload column (null when no
    * right row precedes the left row). */
  /** STREAM-STREAM as-of join — the watermarked two-stream variant of
    * [[asOfJoin]] (batch-parity spec-pinned). Spark's built-in
    * stream-stream joins cannot express "latest right at-or-before", so
    * this is custom state over a side-tagged UNION of the two streams,
    * keyed by the join key:
    *
    *   - both sides buffer per key; a LEFT row matures once the watermark
    *     passes its event time — at that point no right row at-or-before
    *     it can still arrive, so its answer is final (the engine drops
    *     rows at-or-behind the watermark before they reach the operator);
    *   - matured lefts emit joined to the latest buffered right with
    *     right.ts <= left.ts (ties match, like the batch contract);
    *   - state is BOUNDED: matured lefts leave, and of the rights behind
    *     the watermark only the single LATEST one survives (it alone can
    *     still be the answer for a pending left) — per key the state is
    *     one right + one in-flight watermark window of rows;
    *   - an event-time timeout re-visits keys with pending lefts on every
    *     watermark advance, so quiet keys still flush.
    *
    * Input shapes: left (id, key, ts), right (key, ts, v); output
    * [[AsOfOut]]. Same contract as the batch operator: right unique per
    * (key, ts). */
  def asOfJoinStream(left: DataFrame, right: DataFrame,
      watermarkDelay: String = "0 seconds"): Dataset[AsOfOut] = {
    import left.sparkSession.implicits._
    val l = left.select(col("key").cast("long").as("key"),
      col("ts").cast("timestamp").as("ts"), lit(1).as("side"),
      col("id").cast("long").as("id"), lit(0.0).as("v"))
    val r = right.select(col("key").cast("long").as("key"),
      col("ts").cast("timestamp").as("ts"), lit(0).as("side"),
      lit(-1L).as("id"), col("v").cast("double").as("v"))
    l.unionByName(r)
      .withWatermark("ts", watermarkDelay)
      .as[AsOfTagged]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        asOfStep)
  }

  private def asOfStep(key: Long, rows: Iterator[AsOfTagged],
      state: GroupState[AsOfBuf]): Iterator[AsOfOut] = {
    val st = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
    val incoming = if (state.hasTimedOut) Nil else rows.toList
    val lefts = st.lefts ++ incoming.filter(_.side == 1)
    val rights = (st.rights ++ incoming.filter(_.side == 0)).sortBy(_.ts.getTime)
    val wm = state.getCurrentWatermarkMs()
    // strictly below the watermark: rows at ts == wm may still gain
    // equal-ts siblings in later micro-batches (same convention as every
    // stateful operator here)
    val (mature, pending) = lefts.partition(_.ts.getTime < wm)
    val out = mature.sortBy(l => (l.ts.getTime, l.id)).map { l =>
      val m = rights.takeWhile(_.ts.getTime <= l.ts.getTime).lastOption
      AsOfOut(l.id, key, l.ts, m.map(_.ts), m.map(_.v))
    }
    val (behind, inFlight) = rights.partition(_.ts.getTime < wm)
    val kept = behind.lastOption.toList ::: inFlight
    if (pending.isEmpty && kept.isEmpty) state.remove()
    else {
      state.update(AsOfBuf(pending, kept))
      // wake on the next watermark advance so pending lefts flush even if
      // this key never sees another row (legal: wm + 1 > watermark)
      if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1)
    }
    out.iterator
  }

  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rStruct = struct(payload.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val lTagged = left.select(col(key).as("_k"), col(ts).as("_ts"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rTagged = right.select(col(key).as("_k"), col(ts).as("_ts"),
      lit(0).as("_side"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_l.$c").as(c)) ++
        payload.map(p => col(s"_asof.$p").as(s"asof_$p")): _*)
  }

  /** SKEW-SAFE as-of join — [[asOfJoin]] with the per-key window split by
    * `bucket`-width time buckets, for the hot-key regime where one key's
    * whole timeline would otherwise sort through a single window
    * partition. Three bounded pieces, result-identical (spec-pinned on a
    * single-hot-key fixture):
    *
    *   1. WITHIN-bucket as-of: the same union-tag last() window,
    *      partitioned by (key, bucket) — a hot key's rows split across
    *      its time buckets;
    *   2. bucket summaries: the LAST right per (key, bucket) via a
    *      struct-max AGGREGATE (no window), one row per occupied bucket;
    *   3. CARRY-IN: for every (key, bucket) present on either side, the
    *      latest summary from any EARLIER bucket — a window over the
    *      distinct-bucket relation, whose per-key partition is bounded
    *      by time-span / bucket width, never by row count.
    *
    * A left row takes its within-bucket match when one exists, else its
    * bucket's carry-in. Bucket ids are bucket-start micros from pure
    * long arithmetic (x − pmod(x, w)). Same contract as [[asOfJoin]]:
    * `right` unique per (key, ts); ties right.ts == left.ts match. */
  def asOfJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: Seq[String],
      bucket: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = expr(
      s"unix_micros(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL $bucket)")
    def bstart(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      { val us = unix_micros(c); us - pmod(us, w) }
    val rStruct = struct(payload.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val lTagged = left.select(col(key).as("_k"), col(ts).as("_ts"),
      bstart(col(ts)).as("_b"), lit(1).as("_side"),
      lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rTagged = right.select(col(key).as("_k"), col(ts).as("_ts"),
      bstart(col(ts)).as("_b"), lit(0).as("_side"),
      lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val u = lTagged.unionByName(rTagged)
    val wIn = Window.partitionBy("_k", "_b").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = u
      .withColumn("_asof_in", last(col("_r"), ignoreNulls = true).over(wIn))
      .filter(col("_side") === 1)
    // one row per occupied (key, bucket): the bucket's LAST right. struct
    // max orders by _ts first; rights are unique per (key, ts) by contract
    val sums = rTagged.groupBy("_k", "_b")
      .agg(max(struct(col("_ts"), col("_r"))).as("_last"))
    val wCarry = Window.partitionBy("_k").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.select("_k", "_b").distinct()
      .join(sums, Seq("_k", "_b"), "left")
      .withColumn("_carry", max(col("_last")).over(wCarry))
      .select("_k", "_b", "_carry")
    within.join(carry, Seq("_k", "_b"), "left")
      .withColumn("_asof", coalesce(col("_asof_in"), col("_carry._r")))
      .select(left.columns.map(c => col(s"_l.$c").as(c)) ++
        payload.map(p => col(s"_asof.$p").as(s"asof_$p")): _*)
  }

  /** Last-touch attribution — for every conversion event, the user's most
    * recent NON-conversion event at or before the conversion's timestamp,
    * counted only when it falls inside `lookback`; conversions with no
    * in-window touch land in the `(none)` row. Composes [[asOfJoin]]
    * (union-tag + ONE partitioned window — no per-conversion probe join
    * ever): touches are first reduced to one row per (user, ts) with the
    * highest-event_id winner (arg-max by a struct max, making the as-of
    * contract's "right unique per (key, ts)" hold deterministically),
    * then the as-of result is checked against the lookback. The
    * latest-overall-then-check is equivalent to latest-within-window:
    * any touch inside the window is ≥ every touch outside it, so if the
    * latest is outside, the window is empty. Revenue stays integer cents.
    * Output: (attr_type, n_conversions, value_cents). */
  def attribution(events: DataFrame, conversion: String = "purchase",
      lookback: String = "1 hour"): DataFrame = {
    val conv = events.filter(col("event_type") === conversion)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("value_cents"))
    val touch = events.filter(col("event_type") =!= conversion)
      .groupBy(col("user_id"), col("ts"))
      .agg(max(struct(col("event_id"), col("event_type"))).as("_t"))
      .select(col("user_id"), col("ts"), col("_t.event_type").as("touch_type"))
    val lb = expr(s"INTERVAL $lookback")
    asOfJoin(conv, touch, "user_id", "ts", Seq("touch_type", "ts"))
      .withColumn("attr_type",
        when(col("asof_ts") > col("ts") - lb, col("asof_touch_type"))
          .otherwise(lit("(none)")))
      .groupBy("attr_type")
      .agg(count(lit(1)).as("n_conversions"),
        sum("value_cents").as("value_cents"))
  }

  /** User-growth curve — per time bucket, how many users appear for the
    * FIRST time ever, plus the cumulative total: the canonical adoption
    * chart. Naive cumulative-distinct over time is quadratic (each day
    * re-distincts its whole prefix); first-seen decomposition makes it
    * two aggregates — min(ts) per user (map-side-combinable; the shuffle
    * carries one row per user), a bucket histogram, then one cumulative
    * window over the BUCKET relation, bounded by time span / bucket
    * width, never by users or events. All integer micros.
    * Output: (bucket_us, new_users, cum_users). */
  def userGrowth(events: DataFrame, bucket: String = "1 day"): DataFrame = {
    val w = expr(
      s"unix_micros(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL $bucket)")
    events.groupBy("user_id").agg(min(unix_micros(col("ts"))).as("fus"))
      .groupBy((col("fus") - pmod(col("fus"), w)).as("bucket_us"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum("new_users").over(
        org.apache.spark.sql.expressions.Window.orderBy("bucket_us")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)))
  }

  /** Half-life-decayed event counts — the "what's hot NOW" statistic
    * (each event contributes 2^(−age/halfLife); an hour-old event at a
    * 1-hour half-life counts half) — computed INTEGER-EXACT: the decay
    * exponent k = ⌊age/halfLife⌋ is a whole number, so each weight is
    * the BIGINT 2^(maxAge−k) (events older than maxAge half-lives weigh
    * 0) and the per-type sum is exact integer addition in any engine —
    * no float summation order to disagree about; the display value just
    * rescales by 2^maxAge. Reference time = max event ts, a one-row
    * broadcast (the same scalar-subquery shape as the threshold
    * queries). Pure map-side weighting + one aggregate: the 100 TB plan
    * is the scan. Output: (event_type, n_events, decayed_scaled,
    * decayed). */
  def decayedCounts(events: DataFrame, halfLife: String = "1 hour",
      maxAge: Int = 40): DataFrame = {
    require(maxAge >= 1 && maxAge <= 62, "maxAge half-lives in 1..62")
    val hl = expr(
      s"unix_micros(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL $halfLife)")
    val ref = events.agg(max(unix_micros(col("ts"))).as("ref_us"))
    events.select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .crossJoin(broadcast(ref))
      .withColumn("k",
        floor((col("ref_us") - col("ts_us")).cast("double") / hl).cast("long"))
      .withColumn("w",
        when(col("k") <= maxAge,
          pow(lit(2.0), lit(maxAge) - col("k")).cast("long"))
          .otherwise(lit(0L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("w").as("decayed_scaled"),
        round(sum("w") / pow(lit(2.0), maxAge), 6).as("decayed"))
  }

  /** Hour-of-day seasonal baseline with per-day deviation — the "is
    * Tuesday 3am traffic abnormal for 3am" report behind seasonality-
    * aware alerting. ONE map-side-combinable exchange collapses the fact
    * to (event_type, day, hour) counts; the baseline (per-type-and-hour
    * totals) and the per-type active-day counts are aggregates OF THAT
    * calendar-bounded relation — the fact table is scanned exactly once
    * at any scale, and both lookups broadcast back into it. Buckets are
    * TZ-free integer arithmetic on epoch micros (`div`), so the SQL
    * oracle replicates them exactly; the deviation is the integer-exact
    * scaled ratio of the day's count to the hour's per-day average:
    * dev_e3 = 1000 * n_events * n_days div hour_total (floor division in
    * both engines). Events are post-epoch in this domain, so truncating
    * div equals floor div. Output: (event_type, day, hr, n_events,
    * hour_total, n_days, dev_e3). */
  def seasonalBaseline(events: DataFrame): DataFrame =
    seasonalFromCounts(events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("unix_micros(ts) div 3600000000 % 24").as("hr"))
      .groupBy("event_type", "day", "hr")
      .agg(count(lit(1)).as("n_events")))

  /** The baseline/deviation tail of [[seasonalBaseline]] over an already-
    * aggregated (event_type, day, hr, n_events) relation — shared with
    * the STREAMING twin, whose engine produces the same counts online.
    * The counts MATERIALIZE once (localCheckpoint): the baseline and
    * active-day aggregates otherwise re-derive them from the fact — the
    * audited plan showed three event scans for one. Single-shot
    * checkpoint, reclaimed by ContextCleaner when the caller releases
    * the result (the iterative loops drop superseded blocks eagerly;
    * a one-shot operator cannot drop what its output still reads). */
  private[graft] def seasonalFromCounts(counts: DataFrame): DataFrame = {
    val cnt = counts.localCheckpoint()
    val base = cnt.groupBy("event_type", "hr")
      .agg(sum("n_events").as("hour_total"))
    val days = cnt.select("event_type", "day").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_days"))
    cnt.join(broadcast(base), Seq("event_type", "hr"))
      .join(broadcast(days), Seq("event_type"))
      .select(col("event_type"), col("day"), col("hr"), col("n_events"),
        col("hour_total"), col("n_days"),
        expr("1000 * n_events * n_days div hour_total").as("dev_e3"))
  }

  /** Lagged cross-correlation moments between two event-type series —
    * "do purchases follow clicks, and at what delay". The fact collapses
    * in ONE exchange to per-(type, bucket) counts; a zero-filled bucket
    * spine (generated map-side from one broadcast bounds row, the
    * gapFill pattern) makes missing hours count as 0 rather than vanish;
    * then every lag 0..maxLag reads the y-series through ONE window pass
    * (all `lead` offsets share the single sort) and per-lag sums are a
    * combinable aggregate. The window is global-order but the relation
    * is CALENDAR-bounded (hours between first and last event — ~9k rows
    * per year even at 100 TB of events), the same documented trade as
    * revenueDeciles. Outputs are raw BIGINT moments plus the cleared-
    * denominator numerator num = n*Σxy − Σx*Σy (positive = x leads y
    * co-movement); callers divide by the variance terms downstream —
    * emitting moments keeps every value integer-exact across engines.
    * Output per lag: (lag, n, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
    * num). */
  def laggedXcorr(events: DataFrame, typeA: String, typeB: String,
      maxLag: Int = 3, bucketSec: Long = 3600): DataFrame = {
    require(maxLag >= 0, "maxLag >= 0")
    import org.apache.spark.sql.expressions.Window
    val usPerBucket = bucketSec * 1000000L
    val cnt = events.filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) div $usPerBucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val a = cnt.filter(col("event_type") === typeA)
      .select(col("bucket"), col("n").as("x"))
    val b = cnt.filter(col("event_type") === typeB)
      .select(col("bucket"), col("n").as("y"))
    val spine = cnt.agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val series = spine.join(a, Seq("bucket"), "left")
      .join(b, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    val w = Window.orderBy("bucket")
    // leads materialize as plain window columns FIRST (Spark rejects
    // window expressions inside a generator), then explode re-shapes
    val withLeads = series.select(col("x") +:
      (0 to maxLag).map(l => lead(col("y"), l).over(w).as(s"_y$l")): _*)
    val leads = array((0 to maxLag).map(l =>
      struct(lit(l.toLong).as("lag"), col(s"_y$l").as("yl"))): _*)
    withLeads.select(col("x"), explode(leads).as("p"))
      .filter(col("p.yl").isNotNull)
      .groupBy(col("p.lag").as("lag"))
      .agg(count(lit(1)).as("n"), sum("x").as("sum_x"),
        sum(col("p.yl")).as("sum_y"), sum(col("x") * col("p.yl")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("p.yl") * col("p.yl")).as("sum_yy"))
      .withColumn("num", expr("n * sum_xy - sum_x * sum_y"))
  }

  /** Per-user rolling-frame statistics — the "is this event unusual for
    * THIS user" signal feeding rate limiting and anomaly review: over the
    * user's last `frame` events (event-count frame, ordered by ts with
    * event_id as the total-order tiebreak), the window population, the
    * running mean of `value` (rounded to 6 dp — the two engines sum the
    * <= `frame` doubles in the same frame order, rounding absorbs the
    * last-ulp) and the running max. Output:
    * (event_id, user_id, n_window, avg_value, max_value).
    *
    * Shape: ONE shuffle on user_id, then a sorted per-partition pass —
    * the frame is bounded, so state per row is O(frame). Per-user history
    * never collects anywhere; skew is bounded by the hottest user's
    * event count, same as any per-entity timeline analytic. */
  def rollingUserStats(events: DataFrame, frame: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(frame >= 1, "frame must be positive")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(frame - 1), Window.currentRow)
    events.select(col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_window"),
      round(avg(col("value")).over(w), 6).as("avg_value"),
      max(col("value")).over(w).as("max_value"))
  }

  /** STREAMING [[rollingUserStats]]: the same per-user bounded frame as a
    * watermarked flatMapGroupsWithState machine. An event's stats depend
    * only on events at or before it in (ts, event_id) order, so an event
    * emits once the watermark passes its ts (every frame predecessor has
    * then arrived); per-user state is O(frame + in-flight window): the
    * pending events plus the last frame-1 MATURED values. The frame sum
    * runs oldest-to-newest — the exact order the batch window's
    * re-evaluated avg uses — so stream equals batch bit-for-bit (the
    * caller applies the same `round`). Late data beyond the watermark is
    * dropped by the engine, the standard streaming contract. A user's
    * frame-1-value tail outlives its pending events (future events need
    * the prefix); on unbounded user cardinality, bound the store with an
    * event-time TTL exactly as [[StreamingDedup.firstSeenTtl]] does. */
  def rollingStream(events: DataFrame, frame: Int = 5,
      watermarkDelay: String = "0 seconds"): Dataset[RollOut] = {
    require(frame >= 1, "frame must be positive")
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermarkDelay)
      .as[RollEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        rollingStep(frame))
  }

  /** STREAMING [[transitions]]: the Markov pair stream as a watermarked
    * per-user state machine. State is O(pending + 1): the not-yet-matured
    * events plus the LAST matured event_type (the only history a
    * first-order transition needs). Events mature in (ts, event_id) order
    * once the watermark passes them — the same deterministic sequence the
    * batch lag window uses — and each matured event emits its
    * (prev_type, next_type) pair; the caller aggregates pairs to the
    * transition matrix batch-side (counts commute with arrival order).
    * The retained last-type outlives pending events (future events need
    * it); unbounded user cardinality bounds the store with an event-time
    * TTL exactly as [[StreamingDedup.firstSeenTtl]] does. */
  def transitionsStream(events: DataFrame,
      watermarkDelay: String = "0 seconds"): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[TransEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(transStep)
  }

  private def transStep(key: Long, rows: Iterator[TransEv],
      state: GroupState[TransBuf]): Iterator[TransOut] = {
    val st = state.getOption.getOrElse(TransBuf(Nil, None))
    val incoming = if (state.hasTimedOut) Nil else rows.toList
    val all = (st.pending ++ incoming).sortBy(e => (e.ts.getTime, e.event_id))
    val wm = state.getCurrentWatermarkMs()
    // strictly below the watermark (equal-ts rows may still arrive)
    val (mature, pending) = all.partition(_.ts.getTime < wm)
    var last = st.last
    val out = mature.flatMap { e =>
      val r = last.map(p => TransOut(p, e.event_type, key))
      last = Some(e.event_type)
      r
    }
    if (pending.isEmpty && last.isEmpty) state.remove()
    else {
      state.update(TransBuf(pending, last))
      if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1)
    }
    out.iterator
  }

  private def rollingStep(frame: Int)(key: Long, rows: Iterator[RollEv],
      state: GroupState[RollBuf]): Iterator[RollOut] = {
    val st = state.getOption.getOrElse(RollBuf(Nil, Nil))
    val incoming = if (state.hasTimedOut) Nil else rows.toList
    val all = (st.pending ++ incoming).sortBy(e => (e.ts.getTime, e.event_id))
    val wm = state.getCurrentWatermarkMs()
    // strictly below the watermark (equal-ts rows may still arrive)
    val (mature, pending) = all.partition(_.ts.getTime < wm)
    var tail = st.tail
    val out = mature.map { e =>
      val win = tail :+ e.value // oldest..current, size <= frame
      tail = win.takeRight(frame - 1)
      RollOut(e.event_id, key, win.size.toLong, win.sum / win.size, win.max)
    }
    if (pending.isEmpty && tail.isEmpty) state.remove()
    else {
      state.update(RollBuf(pending, tail))
      // wake on the next watermark advance so pending events flush even if
      // this user never sees another row
      if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1)
    }
    out.iterator
  }
}
