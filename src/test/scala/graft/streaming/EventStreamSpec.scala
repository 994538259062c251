package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, user_id: Long, event_type: String)

class EventStreamSpec extends SparkSpec {

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  val rows = Seq(
    Ev(ts(0), 1, "click"), Ev(ts(1), 2, "click"), Ev(ts(2), 1, "view"),
    Ev(ts(6), 1, "click"), Ev(ts(7), 3, "click"), Ev(ts(40), 1, "click"))

  test("stream and batch windowed counts agree (batch/stream parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = EventStream.windowedCounts(rows.toDF(), watermark = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val mem = MemoryStream[Ev]
    val q = EventStream.windowedCounts(mem.toDF(), watermark = true)
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("wc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(streamed == batch)
    assert(batch.exists { case (_, t, n) => t == "click" && n == 2 })
  }

  test("enrichedWindowTotals: stream-static dim join, defaults, parity") {
    import spark.implicits._
    val evs = Seq(
      (ts(0), "click", 1.50), (ts(1), "purchase", 10.00),
      (ts(2), "mystery", 99.99), // unmapped -> other, weight 0
      (ts(6), "click", 2.00))
    val dim = Seq(("click", "engagement", 1L), ("purchase", "revenue", 5L))
    val batch = EventStream.enrichedWindowTotals(
        evs.toDF("ts", "event_type", "value"),
        dim.toDF("event_type", "category", "weight"), watermark = false)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val base = ts(0).getTime / 1000
    assert(batch == Set(
      (base, "engagement", 1L, 150L),   // 1.50 * 100 * 1
      (base, "revenue", 1L, 5000L),     // 10.00 * 100 * 5
      (base, "other", 1L, 0L),          // unmapped type absorbed, not dropped
      (base + 300, "engagement", 1L, 200L)))
    // engine twin: same rows through the watermarked append-mode path
    val streamed = StreamDriver.enrichedStreamed(spark, evs, dim)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == batch)
  }

  test("streaming dedup keeps first-seen content across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.firstSeen(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    mem.addData((3L, "aaa"), (1L, "aaa"), (2L, "bbb")) // in-batch dup: keep min id
    q.processAllAvailable()
    mem.addData((4L, "aaa"), (5L, "ccc")) // cross-batch dup: drop 4
    q.processAllAvailable()
    val kept = spark.table("dd").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(kept == Set(1L, 2L, 5L))
  }

  test("streaming simhash pairs equal the batch banding under any batch split") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    // make sure the fixture HAS near-dups: append light token edits of a
    // few docs (drop the last token) — Hamming of the 64-bit sigs stays
    // small for most, and exact pairs are whatever the batch op says
    val edited = docs.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        regexp_replace(col("text"), " \\S+$", "").as("text"))
    val corpus = docs.unionByName(edited)
    val want = graft.dedup.Dedup.simhashPairs(corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(want.nonEmpty, "fixture must contain at least one near-dup pair")
    val all = corpus.orderBy("doc_id").as[(Long, String)].collect().toSeq
    for (nBatches <- Seq(1, 3)) {
      val batches = all.grouped(math.max(1, (all.size + nBatches - 1) / nBatches)).toSeq
      val got = StreamDriver.simhashPairsStreamed(spark, batches).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"stream/batch divergence at $nBatches batches: " +
        s"missed=${want -- got} extra=${got -- want}")
    }
    // reversed arrival order: same set (pairs normalize to (min, max))
    val gotRev = StreamDriver.simhashPairsStreamed(spark,
      Seq(all.reverse)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotRev == want)
  }

  test("sessions split on 30-minute gaps") {
    import spark.implicits._
    val s = EventStream.sessions(rows.toDF(), watermark = false)
      .filter(col("user_id") === 1).collect()
    assert(s.length == 2) // 10:00-10:06 block and 10:40 block
    assert(s.map(_.getLong(2)).sorted.toSeq == Seq(1L, 3L))
  }

  test("hoppingCounts: every event lands in exactly two overlapping windows") {
    import spark.implicits._
    val out = EventStream.hoppingCounts(rows.toDF(), watermark = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // total window-memberships = 2x the event count
    assert(out.map(_._3).sum == 2L * rows.size)
    // the event at 10:00 is in the windows starting 09:55 and 10:00
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    val clickWins = out.filter(_._2 == "click").map(_._1).toSet
    assert(clickWins.contains(t0) && clickWins.contains(t0 - 300))
    // window starts are 5-minute aligned
    assert(out.forall(_._1 % 300 == 0))
  }

  test("intervalJoin: all matches inside the closed lookback band, edges match") {
    import spark.implicits._
    val lefts = Seq((10L, 1L, ts(30)), (11L, 2L, ts(30)))
      .toDF("id", "key", "ts")
    val rights = Seq(
      (1L, ts(20), 1.0), // in band for left 10
      (1L, ts(30), 2.0), // tie at the upper edge: matches
      (1L, ts(19), 3.0), // ts(30) - 11min: outside a 10-minute lookback
      (1L, ts(31), 4.0), // after the left: never matches
      (2L, ts(25), 5.0)) // other key
      .toDF("key", "ts", "v")
    val out = EventStream.intervalJoin(lefts, rights, "10 minutes")
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toSet
    assert(out == Set((10L, 1.0), (10L, 2.0), (11L, 5.0)))
    // lower edge is closed: exactly lookback ago still matches
    val edge = EventStream.intervalJoin(lefts,
      Seq((1L, ts(20), 9.0)).toDF("key", "ts", "v"), "10 minutes")
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toSet
    assert(edge == Set((10L, 9.0)))
  }

  test("intervalJoin: single-hot-key fixture equals the brute-force band, pairs unique") {
    import spark.implicits._
    // ONE key carries every row — the shape whose plain key-equi-join
    // serializes; the time-bucketed join must return exactly the brute
    // force's pairs, each once (a pair meets only in its right's bucket)
    val lefts = (0 until 60).map(i => (100L + i, 7L, ts(i))).toDF("id", "key", "ts")
    val rights = (0 until 60).map(i => (7L, ts(i), i.toDouble)).toDF("key", "ts", "v")
    val out = EventStream.intervalJoin(lefts, rights, "10 minutes").collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    val expect = for {
      li <- 0 until 60; ri <- 0 until 60
      if ri <= li && ri >= li - 10 // closed [ts - 10min, ts] band, minute grid
    } yield (100L + li, ri.toDouble)
    assert(out.length == expect.length, "each qualifying pair appears exactly once")
    assert(out.toSet == expect.toSet)
  }

  test("asOfJoinBucketed: result-identical to asOfJoin on a single-hot-key timeline") {
    import spark.implicits._
    // ONE key, rows spanning many 1-minute buckets, with empty-bucket
    // gaps (carry-in must cross them), a right exactly on a bucket edge,
    // and lefts before any right (null match)
    val lefts = (0 until 120).map(i => (i.toLong, 7L, ts(i)))
      .toDF("id", "key", "ts")
    val rights = Seq(5, 6, 60, 61, 62, 100).zipWithIndex
      .map { case (m, j) => (7L, ts(m), j.toDouble) }
      .toDF("key", "ts", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(_.getTime),
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue())))
      .sortBy(_._1).toSeq
    val plain = rows(EventStream.asOfJoin(lefts, rights, "key", "ts", Seq("ts", "v")))
    val bucketed = rows(EventStream.asOfJoinBucketed(
      lefts, rights, "key", "ts", Seq("ts", "v"), "1 minute"))
    assert(bucketed == plain)
    // sanity: pre-first-right lefts are null; post-gap lefts carry in
    assert(plain.take(5).forall(_._2.isEmpty))
    assert(plain(90)._3.contains(4.0))  // minute 90: latest right is m=62
  }

  test("retentionCohorts: first-day cohorts, per-day dedup, offset cells") {
    import spark.implicits._
    def at(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00")
    val ev = Seq(
      // user 1: days 0 and 2 (two events day 0 -> dedup to one active-day)
      (1L, at(0, 1)), (1L, at(0, 5)), (1L, at(2, 3)),
      // user 2: days 0 and 1
      (2L, at(0, 2)), (2L, at(1, 2)),
      // user 3: first seen day 1, active day 2
      (3L, at(1, 9)), (3L, at(2, 9)))
      .toDF("user_id", "ts")
    val r = EventStream.retentionCohorts(ev).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    val day0 = at(0, 0).getTime / 1000 / 86400
    assert(r == Map(
      (day0, 0L) -> 2L, (day0, 1L) -> 1L, (day0, 2L) -> 1L,
      (day0 + 1, 0L) -> 1L, (day0 + 1, 1L) -> 1L))
  }

  test("transitions: per-user time order, event_id tiebreak, distinct users") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view -> click -> view  (equal ts on the last two: id order)
      (1L, ts(0), 10L, "view"), (1L, ts(1), 11L, "click"), (1L, ts(1), 12L, "view"),
      // user 2: view -> click
      (2L, ts(0), 20L, "view"), (2L, ts(5), 21L, "click"),
      // user 3: single event -> no transitions
      (3L, ts(2), 30L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = EventStream.transitions(ev).collect()
      .map(x => ((x.getString(0), x.getString(1)), (x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(
      ("view", "click") -> ((2L, 2L)),   // users 1 and 2
      ("click", "view") -> ((1L, 1L))))  // user 1 only (tiebreak on event_id)
  }

  test("asOfJoin: latest preceding right row per key, ties match, no-match is null") {
    import spark.implicits._
    val left = Seq( // (id, user, ts)
      (1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 5L), (4L, 2L, 10L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq( // (user, ts, v): user 1 has prices at 5, 10, 15
      (1L, 5L, 50.0), (1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("user_id", "ts", "v")
    val r = EventStream.asOfJoin(left, right, "user_id", "ts", Seq("ts", "v"))
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(3)).map(_.asInstanceOf[Long]),
         Option(x.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(r(1L) == ((Some(10L), Some(100.0)))) // tie ts=10 matches (>=)
    assert(r(2L) == ((Some(15L), Some(150.0)))) // latest preceding, not first
    assert(r(3L) == ((Some(5L), Some(50.0))))
    assert(r(4L) == ((None, None)))             // user 2 has no right rows
  }

  test("funnel: order matters, wrong-order users do not convert") {
    import spark.implicits._
    val ev = Seq( // (user, ts, type)
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full funnel
      (2L, 10L, "view"), (2L, 20L, "click"),                        // stops at click
      (3L, 20L, "click"), (3L, 30L, "view"),                        // wrong order
      (4L, 10L, "view"), (4L, 10L, "click"), (4L, 9L, "purchase"))  // tie counts; early purchase doesn't
      .toDF("user_id", "ts", "event_type")
    val r = EventStream.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(x => x.getInt(0) -> x.getLong(2)).toMap
    assert(r(1) == 4L) // users 1..4 all viewed
    assert(r(2) == 3L) // 1, 2, 4 clicked at/after their first view; 3 did not
    assert(r(3) == 1L) // only user 1 purchased after clicking
  }

  test("rangeJoin: bucketized join equals the brute-force theta join") {
    import spark.implicits._
    val left = (0 until 200).map(i => (i.toLong, i * 0.37 % 25)).toDF("id", "v")
    val ranges = Seq((0.0, 3.0, "a"), (2.5, 7.25, "b"), (7.25, 7.25, "empty"),
      (6.0, 20.0, "c"), (24.9, 25.1, "d")).toDF("lo", "hi", "tier")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1))
    val brute = left.join(ranges, col("lo") <= col("v") && col("v") < col("hi"))
      .select(col("id"), col("tier")).collect().map(key).toSet
    for (w <- Seq(0.5, 1.0, 7.0, 100.0)) {
      val got = EventStream.rangeJoin(left, ranges, "v", bucketWidth = w)
        .select(col("id"), col("tier")).collect().map(key).toSet
      assert(got == brute, s"width=$w")
    }
    assert(!brute.exists(_._2 == "empty")) // empty range matches nothing
  }

  test("asOfJoin keeps every left row and column") {
    import spark.implicits._
    val left = Seq((1L, 7L, 3L, "x")).toDF("event_id", "user_id", "ts", "extra")
    val out = EventStream.asOfJoin(left,
      Seq((7L, 1L, 1.0)).toDF("user_id", "ts", "v"), "user_id", "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "extra", "asof_v"))
    assert(out.count() == 1)
  }

  test("rollingUserStats: bounded frame per user, ts order, event_id tiebreak") {
    import spark.implicits._
    // user 1: values 1..4 at minutes 0..3 (minute 1 has TWO events — the
    // event_id tiebreak orders them); user 2 is independent
    val ev = Seq(
      (10L, ts(0), 1L, 1.0), (11L, ts(1), 1L, 2.0), (12L, ts(1), 1L, 3.0),
      (13L, ts(2), 1L, 4.0), (20L, ts(0), 2L, 100.0))
      .toDF("event_id", "ts", "user_id", "value")
    val r = EventStream.rollingUserStats(ev, frame = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(10L) == ((1L, 1.0, 1.0)))
    assert(r(11L) == ((2L, 1.5, 2.0)))
    assert(r(12L) == ((3L, 2.0, 3.0)))
    assert(r(13L) == ((3L, 3.0, 4.0)))  // frame slides: events 11,12,13
    assert(r(20L) == ((1L, 100.0, 100.0)))
  }

  test("rollingStream through the engine equals the batch window bit-for-bit") {
    import spark.implicits._
    // values chosen so averages are NOT exactly representable — the parity
    // claim is about bit-identical double sums, not round numbers; minute 1
    // carries a same-ts tie broken by event_id
    val ev = Seq(
      (10L, ts(0), 1L, 0.1), (11L, ts(1), 1L, 0.2), (12L, ts(1), 1L, 0.7),
      (13L, ts(2), 1L, 0.3), (14L, ts(3), 1L, 1.1), (15L, ts(4), 1L, 0.4),
      (20L, ts(0), 2L, 3.3), (21L, ts(5), 2L, 4.7))
    val batch = EventStream.rollingUserStats(
        ev.toDF("event_id", "ts", "user_id", "value"), frame = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val streamed = StreamDriver.rollingStreamed(spark,
        ev.map { case (id, t, u, v) => (u, t, id, v) }, frame = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(streamed == batch)
    assert(batch.size == 8) // every event emitted exactly once
  }

  test("topPaths: per-user sequences, boundary paths never form, deterministic rank") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click > view > buy > click
      (1L, ts(0), 1L, "click"), (2L, ts(1), 1L, "view"),
      (3L, ts(2), 1L, "buy"), (4L, ts(3), 1L, "click"),
      // user 2: click > view > buy  (one path only)
      (5L, ts(0), 2L, "click"), (6L, ts(1), 2L, "view"), (7L, ts(2), 2L, "buy"),
      // user 3: two events — no 3-path; must NOT borrow user 1's events
      (8L, ts(7), 3L, "view"), (9L, ts(8), 3L, "buy"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = EventStream.topPaths(ev, depth = 3, k = 10).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, "click>view>buy", 2L, 2L),
      (2L, "view>buy>click", 1L, 1L)))
  }

  test("funnelTimes: anchor-to-anchor latency, converting users only") {
    import spark.implicits._
    // user 1 converts a>b in 2 min; user 2 in 5 min; user 3 never reaches b;
    // user 1's later 'a' must not move its anchor (min ts rule)
    val ev = Seq(
      (ts(0), 1L, "a"), (ts(2), 1L, "b"), (ts(3), 1L, "a"),
      (ts(1), 2L, "a"), (ts(6), 2L, "b"),
      (ts(0), 3L, "a"))
      .toDF("ts", "user_id", "event_type")
    val r = EventStream.funnelTimes(ev, Seq("a", "b")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getInt(0) == 1 && row.getInt(1) == 2)
    assert(row.getLong(2) == 2L)                       // users 1 and 2
    assert(row.getLong(3) == 7L * 60 * 1000000L)       // 2 min + 5 min
    assert(row.getLong(4) == 2L * 60 * 1000000L)
    assert(row.getLong(5) == 5L * 60 * 1000000L)
  }

  test("windowedUserCounts: chained stateful pair equals batch dedup-then-count") {
    import spark.implicits._
    // user 1 twice in one window (dedup), three users over two windows
    val ev = Seq(
      (ts(0), 1L), (ts(1), 1L), (ts(2), 2L),   // window 10:00: users {1, 2}
      (ts(6), 1L), (ts(7), 3L))                // window 10:05: users {1, 3}
    val batch = EventStream.windowedUserCounts(
        ev.toDF("ts", "user_id"), watermark = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.map(_._2) == Set(2L)) // both windows count exactly 2 users
    val streamed = StreamDriver.windowUsersStreamed(spark, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("valueOutliers: exact per-type percentile threshold, strictly-above flags") {
    import spark.implicits._
    // type A: 10 values 1..10 (milli 1000..10000). p50 target rank =
    // floor(9*50/100)+1 = 5 -> threshold 5000; flags = 6..10 (5 rows).
    // type B: constant values -> threshold = the value, nothing strictly above
    val ev = ((1L to 10L).map(i => (i, "A", i.toDouble)) ++
      (11L to 14L).map(i => (i, "B", 7.0)))
      .toDF("event_id", "event_type", "value")
    val r = EventStream.valueOutliers(ev, 50).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r.map(_._1).sorted.sameElements(6L to 10L))
    assert(r.forall { case (_, t, v, thr) => t == "A" && thr == 5000L && v > thr })
  }

  test("gapFill: complete spine, zero-filled gaps, LOCF value carry") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // type a: buckets 0 and 900 populated (600 and 300 are gaps);
    // type b: only bucket 300 — its spine still spans the GLOBAL range
    val ev = Seq(
      (1L, 10L, "a", ts(10), 1.00), (2L, 11L, "a", ts(20), 2.00),
      (3L, 12L, "a", ts(950), 5.00),
      (4L, 13L, "b", ts(310), 7.00))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val r = EventStream.gapFill(ev, 300).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getBoolean(3), x.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(r == Seq(
      ("a", 0L, 2L, false, 300L),   // 100 + 200 cents
      ("a", 300L, 0L, true, 300L),  // gap: zero-filled, value carried
      ("a", 600L, 0L, true, 300L),
      ("a", 900L, 1L, false, 500L),
      ("b", 0L, 0L, true, -1L),     // before b's first observation
      ("b", 300L, 1L, false, 700L),
      ("b", 600L, 0L, true, 700L),
      ("b", 900L, 0L, true, 700L)))
  }

  test("changepoints: symmetric frames, full-frame rows only, exact shift") {
    import spark.implicits._
    // one type, minute buckets, w=2. Rates per bucket 0..6:
    // 1,1,1,5,5,5,5 (a level shift at bucket 3). Full frames exist for
    // buckets 2..4: b2 before=1+1=2 after=5+5=10 shift=8;
    // b3 before=1+1=2 after=5+5=10 shift=8; b4 before=1+5=6 after=10.
    val ev = (0 to 6).flatMap { b =>
      val n = if (b < 3) 1 else 5
      (1 to n).map(i => (Timestamp.valueOf(f"2024-01-01 10:$b%02d:00"), "A", i))
    }.toDF("ts", "event_type", "x")
    val r = EventStream.changepoints(ev, bucketSec = 60L, w = 2)
      .orderBy("bucket_start").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(r.length == 3)
    assert(r(0) == ((base + 120, 1L, 2L, 10L, 8L)))
    assert(r(1) == ((base + 180, 5L, 2L, 10L, 8L)))
    assert(r(2) == ((base + 240, 5L, 6L, 10L, 4L)))
  }

  test("transitionsStream equals batch transitions across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq(
      (1L, ts(0), 1L, "click"), (2L, ts(1), 1L, "view"), (3L, ts(2), 1L, "buy"),
      (4L, ts(0), 2L, "view"), (5L, ts(1), 2L, "view"),
      (6L, ts(3), 1L, "click"), (7L, ts(4), 2L, "click"), (8L, ts(5), 2L, "view"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
    val batch = EventStream.transitions(
        ev.toDF("event_id", "ts", "user_id", "event_type")
          .selectExpr("user_id", "ts", "event_id", "event_type"))
      .collect().map(key).toSet
    // two ts-ordered micro-batches: user state (the last matured type)
    // must carry across the batch boundary at minute 2/3
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventStream.transitionsStream(
        mem.toDF().toDF("user_id", "ts", "event_id", "event_type"))
      .writeStream.format("memory").queryName("ts_parity").outputMode("append").start()
    val rows = ev.map { case (id, t, u, et) => (u, t, id, et) }
    mem.addData(rows.filter(_._2.getTime <= ts(2).getTime))
    q.processAllAvailable()
    mem.addData(rows.filter(_._2.getTime > ts(2).getTime))
    q.processAllAvailable()
    mem.addData((Long.MinValue, ts(59), -1L, "_")) // mature everything
    q.processAllAvailable()
    mem.addData((Long.MinValue, ts(59), -2L, "_")) // fire timeouts
    q.processAllAvailable()
    val streamed = spark.table("ts_parity")
      .filter(col("user_id") =!= Long.MinValue)
      .groupBy("prev_type", "next_type", "user_id").agg(count(lit(1)).as("n"))
      .groupBy("prev_type", "next_type")
      .agg(sum("n").as("n_transitions"), count(lit(1)).as("n_users"))
      .collect().map(key).toSet
    q.stop()
    assert(streamed == batch)
    // the boundary transition itself (user 1: buy@2 -> click@3) was emitted
    assert(batch.exists { case (p, n, _, _) => p == "buy" && n == "click" })
  }

  test("topPaths: same-timestamp ties order by event_id") {
    import spark.implicits._
    val ev = Seq( // all at the same instant: sequence = event_id order
      (1L, ts(0), 1L, "a"), (2L, ts(0), 1L, "b"), (3L, ts(0), 1L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = EventStream.topPaths(ev, depth = 3, k = 10).collect()
    assert(r.length == 1 && r.head.getString(1) == "a>b>c")
  }

  test("userGrowth: first-seen buckets only, cumulative total") {
    import spark.implicits._
    def day(d: Int, m: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-0$d 10:$m%02d:00")
    val ev = Seq(
      (day(1, 0), 1L), (day(1, 5), 2L), (day(1, 9), 1L),  // users 1,2 on day 1
      (day(2, 0), 1L),                                    // user 1 again: NOT new
      (day(3, 0), 3L))                                    // user 3 on day 3
      .toDF("ts", "user_id")
    val r = EventStream.userGrowth(ev, "1 day").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq.sortBy(_._1)
    assert(r.map(x => (x._2, x._3)) == Seq((2L, 2L), (1L, 3L)))
    assert(r.map(_._1).distinct.size == 2)   // day 2 has no bucket row
  }

  test("decayedCounts: dyadic weights halve per half-life, old events weigh zero") {
    import spark.implicits._
    def hrs(h: Int): Timestamp =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600_000L)
    val ev = Seq(
      (1L, hrs(50), 1L, "a", 0.0),   // ref (newest): k=0, weight 2^40
      (2L, hrs(49), 1L, "a", 0.0),   // k=1, weight 2^39
      (3L, hrs(48), 2L, "b", 0.0),   // k=2, weight 2^38
      (4L, hrs(0), 2L, "b", 0.0))    // k=50 > maxAge=40 -> weight 0
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventStream.decayedCounts(ev, "1 hour", 40).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r == Map(
      "a" -> ((2L, (1L << 40) + (1L << 39), 1.5)),
      "b" -> ((2L, 1L << 38, 0.25))))
  }

  test("attribution: last touch inside lookback, equal-ts touch counts, (none) bucket") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click@0, view@5, purchase@6 -> attributes to view (latest)
      (1L, ts(0), 1L, "click", 0.0), (2L, ts(5), 1L, "view", 0.0),
      (3L, ts(6), 1L, "purchase", 10.0),
      // user 2: touch at the SAME instant as the purchase -> counts
      (4L, ts(10), 2L, "click", 0.0), (5L, ts(10), 2L, "purchase", 20.0),
      // user 3: latest touch outside the 10-minute lookback -> (none)
      (6L, ts(0), 3L, "view", 0.0), (7L, ts(20), 3L, "purchase", 5.0),
      // user 4: no touch at all -> (none)
      (8L, ts(30), 4L, "purchase", 1.5),
      // user 2 again: two touches at one instant -> max event_id wins
      (9L, ts(40), 2L, "view", 0.0), (10L, ts(40), 2L, "click", 0.0),
      (11L, ts(41), 2L, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventStream.attribution(ev, "purchase", "10 minutes").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(
      "view" -> ((1L, 1000L)),     // user 1
      "click" -> ((2L, 2200L)),    // user 2 twice (equal-ts + id-10 click)
      "(none)" -> ((2L, 650L))))   // users 3 and 4
  }

  test("funnelWindowed: a step outside the gap does not convert; late anchors re-open it") {
    import spark.implicits._
    val evs = Seq(
      // user 1: view@0, click@30m (in gap), purchase@55m = 25m after the
      // click anchor (in gap) -> full conversion
      (ts(0), 1L, "view"), (ts(30), 1L, "click"), (ts(55), 1L, "purchase"),
      // user 2: view@0, only click 2h later (OUT at 1h gap) -> stage 1 only
      (new Timestamp(ts(0).getTime + 2 * 3600 * 1000L), 2L, "click"),
      (ts(0), 2L, "view"),
      // user 3: view@0 and a purchase 2h later but NO click at all ->
      // stage 1 only (the ladder cannot skip a stage)
      (ts(0), 3L, "view"),
      (new Timestamp(ts(0).getTime + 2 * 3600 * 1000L), 3L, "purchase"))
      .toDF("ts", "user_id", "event_type")
    val r = EventStream.funnelWindowed(evs,
        Seq("view", "click", "purchase"), 3600L)
      .collect().map(x => x.getInt(0) -> x.getLong(2)).toMap
    // q1 = {1,2,3}; q2 = {1} (user 2's click is out of gap, user 3 never
    // clicks); q3 = {1}
    assert(r == Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
    // the unbounded funnel admits user 2's late click
    val plain = EventStream.funnel(evs, Seq("view", "click", "purchase"))
      .collect().map(x => x.getInt(0) -> x.getLong(2)).toMap
    assert(plain(2) == 2L)
  }

  test("seasonalBaseline: per-hour baseline, integer deviation ratio") {
    import spark.implicits._
    // epoch-anchored timestamps: day/hr indexes are TZ-free by construction
    def at(day: Int, hour: Int, m: Int): Timestamp =
      new Timestamp((((day.toLong * 24 + hour) * 60 + m) * 60) * 1000L)
    val evs = (Seq.fill(2)(at(0, 0, 1)) ++ Seq.fill(4)(at(1, 0, 2)) ++
      Seq.fill(3)(at(0, 1, 3))).map(t => (t, "a")) :+ ((at(0, 2, 0), "b"))
    val df = evs.toDF("ts", "event_type")
    val r = EventStream.seasonalBaseline(df).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)) ->
        ((x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6)))).toMap
    assert(r(("a", 0L, 0L)) == ((2L, 6L, 2L, 666L)))   // 1000*2*2 div 6
    assert(r(("a", 1L, 0L)) == ((4L, 6L, 2L, 1333L)))
    assert(r(("a", 0L, 1L)) == ((3L, 3L, 2L, 2000L)))  // hour seen one day
    assert(r(("b", 0L, 2L)) == ((1L, 1L, 1L, 1000L)))
    assert(r.size == 4)
  }

  test("laggedXcorr: zero-filled spine, exact per-lag moments") {
    import spark.implicits._
    def hb(h: Int, m: Int) = new Timestamp((h * 3600L + m * 60L) * 1000L)
    // clicks x = [2, 0, 1] over hour buckets 0..2 (bucket 1 is a GAP that
    // must zero-fill, not vanish); purchases y = [1, 3, 0]
    val evs = Seq.fill(2)((hb(0, 1), "click")) ++ Seq((hb(2, 1), "click")) ++
      Seq((hb(0, 2), "purchase")) ++ Seq.fill(3)((hb(1, 2), "purchase"))
    val df = evs.toDF("ts", "event_type")
    val r = EventStream.laggedXcorr(df, "click", "purchase", 3).collect()
      .map(x => x.getLong(0) -> x).toMap
    val l0 = r(0L) // pairs (2,1) (0,3) (1,0)
    assert((l0.getLong(1), l0.getLong(2), l0.getLong(3), l0.getLong(4),
      l0.getLong(5), l0.getLong(6), l0.getLong(7)) ==
      ((3L, 3L, 4L, 2L, 5L, 10L, -6L)))
    val l1 = r(1L) // pairs (2,3) (0,0)
    assert((l1.getLong(1), l1.getLong(4), l1.getLong(7)) == ((2L, 6L, 6L)))
    val l2 = r(2L) // pair (2,0)
    assert((l2.getLong(1), l2.getLong(2), l2.getLong(4)) == ((1L, 2L, 0L)))
    assert(!r.contains(3L)) // lag 3 has no overlap -> no row
  }
}
