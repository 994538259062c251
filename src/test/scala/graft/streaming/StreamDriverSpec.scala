package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** Pins the StreamDriver harness itself — the sentinel mechanics that turn
  * the unbounded stream operator into a bounded driver query: every left
  * emits exactly once (matured by the sentinel watermark advance, timeouts
  * included), sentinels never leak into the output, and the no-preceding-
  * right case surfaces as nulls. The operator's join semantics are pinned
  * separately in StreamAsOfSpec; the events_asof_stream driver query
  * checks the whole path against the DuckDB ASOF oracle. */
class StreamDriverSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asOfStreamed: every left emits once; sentinels invisible; no-match is null") {
    val lefts = Seq(
      (1L, 10L, ts(100)), // after r@50 -> matches 1.0
      (2L, 10L, ts(40)),  // before any right -> null
      (3L, 10L, ts(200)), // after r@150 -> matches 2.0
      (4L, 99L, ts(120))  // key with NO rights at all -> null (timeout path)
    )
    val rights = Seq((10L, ts(50), 1.0), (10L, ts(150), 2.0))
    val out = StreamDriver.asOfStreamed(spark, lefts, rights)
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(3)).map(_.getTime / 1000),
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue())))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some(50L), Some(1.0)),
      (2L, None, None),
      (3L, Some(150L), Some(2.0)),
      (4L, None, None)))
  }

  test("funnelStreamed: stage hits match the batch funnel; wrong order never converts") {
    import spark.implicits._
    val stages = Seq("view", "click", "purchase")
    val events = Seq(
      // user 1: full ordered conversion
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: click BEFORE first view -> stuck at stage 1
      (2L, ts(10), "click"), (2L, ts(20), "view"),
      // user 3: tie — click at exactly the view time qualifies (>=)
      (3L, ts(40), "view"), (3L, ts(40), "click"),
      // user 4: purchase before click -> reaches stage 2 only
      (4L, ts(5), "view"), (4L, ts(6), "purchase"), (4L, ts(9), "click"),
      // fed OUT OF ORDER inside the batch: the state machine must sort
      (5L, ts(90), "purchase"), (5L, ts(70), "click"), (5L, ts(50), "view"))
    val hits = StreamDriver.funnelStreamed(spark, events, stages)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(hits == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (3L, 1), (3L, 2),
      (4L, 1), (4L, 2), (5L, 1), (5L, 2), (5L, 3)))
    // counts equal the batch funnel on the same fixture
    val batch = EventStream.funnel(
        events.toDF("user_id", "ts", "event_type"), stages)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    val streamed = (1 to 3).map(k => k -> hits.count(_._2 == k).toLong).toMap
    assert(streamed == batch)
  }

  test("intervalJoinStreamed: stream-stream join equals the batch intervalJoin") {
    import spark.implicits._
    // deterministic fixture: keys with several in-band rights, none, and
    // edge-exact matches (band is [ts - 60s, ts], closed)
    val lefts = (0 until 20).map(i => (i.toLong, (i % 4).toLong, ts(100 + 7L * i)))
    val rights = (0 until 30).map(j => ((j % 5).toLong, ts(90 + 5L * j), j / 10.0))
    val streamed = StreamDriver.intervalJoinStreamed(spark, lefts, rights, "60 seconds")
      .collect().map(r => (r.getLong(0), r.getTimestamp(3).getTime, r.getDouble(4))).toSet
    val batch = EventStream.intervalJoin(
        lefts.toDF("id", "key", "ts"), rights.toDF("key", "ts", "v"), "60 seconds")
      .collect().map(r => (r.getLong(0), r.getTimestamp(3).getTime, r.getDouble(4))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // a key absent on the right contributes nothing (inner semantics)
    assert(!batch.exists(_._1 % 4 == 3) || rights.exists(_._1 == 3L))
  }

  test("asOfStreamed matches the batch asOfJoin on a shared fixture") {
    import spark.implicits._
    // deterministic pseudo-random fixture, keys with and without rights
    val lefts = (1 to 60).map { i =>
      (i.toLong, (i % 7).toLong, ts(100 + (i * 37) % 500)) }
    val rights = (1 to 25).map { j =>
      ((j % 5).toLong, ts(80 + (j * 53) % 500), j / 10.0) }
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
    val streamed = StreamDriver.asOfStreamed(spark, lefts, rights)
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(_.getTime),
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue()))).toSet
    val batch = EventStream.asOfJoin(
        lefts.toDF("id", "key", "ts"), rights.toDF("key", "ts", "v"),
        "key", "ts", Seq("ts", "v"))
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(_.getTime),
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.doubleValue()))).toSet
    assert(streamed == batch)
  }

  test("windowCountsStreamed: append-mode windows equal the batch aggregation") {
    import spark.implicits._
    // events across three 5-minute buckets, two types, one empty bucket gap
    val evs = Seq(
      (ts(10), "view"), (ts(20), "click"), (ts(290), "view"),   // bucket 0
      (ts(310), "view"),                                        // bucket 300
      (ts(910), "click"), (ts(915), "click"))                   // bucket 900
    val got = StreamDriver.windowCountsStreamed(spark, evs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.windowedCounts(
        evs.toDF("ts", "event_type"), watermark = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(got == Set((0L, "view", 2L), (0L, "click", 1L),
      (300L, "view", 1L), (900L, "click", 2L)))
  }

  test("sessionsStreamed: append-mode session_window equals the batch sessions") {
    import spark.implicits._
    // user 1: two sessions split by a 40-min gap; user 2: one session; a
    // third user whose single event is the last to arrive (timeout path)
    val evs = Seq(
      (1L, ts(0)), (1L, ts(600)), (1L, ts(600 + 2400 + 1800)),
      (2L, ts(100)), (2L, ts(1500)),
      (3L, ts(5000)))
    val got = StreamDriver.sessionsStreamed(spark, evs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventStream.sessions(
        evs.toDF("user_id", "ts"), watermark = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(got == Set((1L, 0L, 2L), (1L, 4800L, 1L),
      (2L, 100L, 2L), (3L, 5000L, 1L)))
  }

  test("hoppingCountsStreamed: overlapping windows finalize, equals batch") {
    import spark.implicits._
    // minutes 0, 2, 7: buckets are 5-minute slides of 10-minute windows
    val evs = Seq(
      (ts(0), "view"), (ts(120), "view"), (ts(240), "click"), // wins -300, 0
      (ts(420), "view"))                                      // wins 0, 300
    val got = StreamDriver.hoppingCountsStreamed(spark, evs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.hoppingCounts(
        evs.toDF("ts", "event_type"), watermark = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == batch)
    assert(got == Set(
      (-300L, "view", 2L), (-300L, "click", 1L),
      (0L, "view", 3L), (0L, "click", 1L),
      (300L, "view", 1L)))
  }

  test("trendingTypes: top-k per window with count-desc, type tiebreak") {
    import spark.implicits._
    val evs = Seq(
      (ts(0), "a"), (ts(1), "a"), (ts(2), "b"), (ts(3), "b"),
      (ts(4), "c"), (ts(2), "d"))
    val df = EventStream.trendingTypes(evs.toDF("ts", "event_type"), 2)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val r = df.collect()
      .map(x => (x.getLong(3), x.getString(1), x.getLong(2))).toSeq
    // a=2, b=2, c=1, d=1 -> top-2 = a, b (tie at 2 breaks on type)
    assert(r == Seq((1L, "a", 2L), (2L, "b", 2L)))
  }

  test("cmsEstimatesStreamed equals the batch CMS on a collision-forcing sketch") {
    import spark.implicits._
    // tiny 2x8 sketch over a 60-token vocab: heavy collisions, so the
    // streamed cells must merge EXACTLY across batches to agree
    val docsSeq = (1L to 20L).map(i => (i, s"the tok$i the x$i y${i % 5}"))
    val batches = docsSeq.grouped(5).toSeq
    val got = StreamDriver.cmsEstimatesStreamed(spark, batches,
        depth = 2, width = 8, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val batch = graft.text.TextAnalysis.cmsEstimates(
        docsSeq.toDF("doc_id", "text"), depth = 2, width = 8, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == batch)
    assert(got.forall { case (_, exact, est) => est >= exact })
  }

  test("hllRegistersStreamed equals the batch registers (max-merge across batches)") {
    import spark.implicits._
    val docsSeq = (1L to 30L).map(i => (i, (1 to 20).map(j => s"t${i}_$j").mkString(" ")))
    val batches = docsSeq.grouped(7).toSeq
    val got = StreamDriver.hllRegistersStreamed(spark, batches, p = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = graft.text.TextAnalysis.hllRegisters(
        docsSeq.toDF("doc_id", "text"), p = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == batch && got.length == 64)
  }

  test("heavyHittersStreamed equals the batch heavy hitters, tail beyond the cap") {
    import spark.implicits._
    // "the" rides every doc (heavy); tok$i/x$i form a unique tail far
    // larger than the per-shard cap, so the online sketch genuinely
    // evicts; four micro-batches exercise the cross-batch state merge
    val docsSeq = (1L to 40L).map(i => (i, s"the tok$i the x$i"))
    val batches = docsSeq.grouped(10).toSeq
    val got = StreamDriver.heavyHittersStreamed(spark, batches,
        phi = 0.2, cap = 8, numShards = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = graft.text.TextAnalysis.heavyHitters(
        docsSeq.toDF("doc_id", "text"), 0.2, cap = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == batch)
    assert(got == Seq(("the", 80L)))
  }

  test("gapFillStreamed: watermark-clock emission, gaps from timeouts alone") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // type a goes silent after bucket 0 while type b's rows keep pushing
    // the watermark — a's buckets 300..900 must emit as filled rows from
    // the event-time TIMEOUT, no further a-row ever arrives
    val rows = Seq(
      ("a", ts(10), 1.00), ("a", ts(20), 2.00),
      ("b", ts(310), 7.00), ("b", ts(1190), 3.00))
    val got = StreamDriver.gapFillStreamed(spark, rows, 300)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getBoolean(3), x.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("a", 0L, 2L, false, 300L),
      ("a", 300L, 0L, true, 300L),
      ("a", 600L, 0L, true, 300L),
      ("a", 900L, 0L, true, 300L),
      ("b", 300L, 1L, false, 700L),
      ("b", 600L, 0L, true, 700L),
      ("b", 900L, 1L, false, 300L)))
    // parity with the batch operator on the shared span (per-type spine
    // from the type's own first bucket)
    import spark.implicits._
    val batch = graft.streaming.EventStream.gapFill(
        rows.zipWithIndex.map { case ((t, s, v), i) =>
          (i.toLong, i.toLong, t, s, v) }
          .toDF("event_id", "user_id", "event_type", "ts", "value"), 300)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getBoolean(3), x.getLong(4)))
      .filter { case (t, b, _, _, _) =>
        b >= (if (t == "a") 0L else 300L) } // drop pre-first spine rows
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == batch)
  }

  test("quantileSketchStreamed equals the batch sketch, compaction exercised") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two groups, 4000 rows each at cap 64 -> global level 6; per-shard
    // state (4 shards) must compact several times across the 4 batches,
    // and batch-split must not matter (order-independent final state)
    val rows = (1L to 8000L).map(i =>
      (if (i % 2 == 0) "a" else "b", i / 2, i.toString))
    val batches = rows.grouped(2000).toSeq
    val got = StreamDriver.quantileSketchStreamed(spark, batches,
        ps = Seq(50, 90), cap = 64, numShards = 4)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val batch = graft.stats.Profile.quantileSketch(
        rows.toDF("g", "v", "k"), "g", col("v"), col("k"),
        Seq(50, 90), cap = 64)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == batch)
    assert(got.forall(_._3 == 6L)) // the level the construction implies
    // a different batch split reaches the identical summary
    val got2 = StreamDriver.quantileSketchStreamed(spark,
        rows.grouped(3000).toSeq, ps = Seq(50, 90), cap = 64, numShards = 4)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got2 == batch)
  }

  test("kmvStreamed equals the corpus k smallest distinct shingle hashes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    // enough distinct shingles (> k) that shard state genuinely evicts,
    // fed across four micro-batches; duplicates across batches must not
    // double-enter any shard's set
    val docsSeq = (1L to 40L).map(i =>
      (i, (1 to 10).map(j => s"w${i}_$j").mkString(" ") + " common tail here"))
    val batches = docsSeq.grouped(10).toSeq
    val got = StreamDriver.kmvStreamed(spark, batches, k = 16, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = docsSeq.toDF("doc_id", "text")
      .select(explode(graft.text.TextAnalysis.shingles(col("text"))).as("sh"))
      .select(graft.text.TextAnalysis.kmvHash(col("sh")).as("v"))
      .distinct().orderBy("v").limit(16)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v) }.toSeq.sorted
    assert(got == want && got.length == 16)
  }

  test("seasonalStreamed equals the batch seasonal baseline; sentinel invisible") {
    import spark.implicits._
    // two days x three hours, plus a type seen one day only — exercises
    // hour totals, active-day counts, and the hour-window finalization
    def at(day: Int, hour: Int, m: Int) =
      new Timestamp((((day.toLong * 24 + hour) * 60 + m) * 60) * 1000L)
    val evs = Seq(
      (at(0, 0, 1), "a"), (at(0, 0, 40), "a"), (at(1, 0, 5), "a"),
      (at(0, 1, 10), "a"), (at(1, 1, 59), "a"), (at(1, 2, 30), "a"),
      (at(1, 3, 0), "b"))
    val got = StreamDriver.seasonalStreamed(spark, evs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val batch = EventStream.seasonalBaseline(evs.toDF("ts", "event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == batch && got.nonEmpty)
    assert(got.contains(("a", 0L, 0L, 2L, 3L, 2L, 1333L))) // 1000*2*2 div 3
    assert(!got.exists(_._1 == "__sentinel__"))
  }

  test("file sink resumes from checkpoint: state recovered, exactly-once files") {
    // the production contract behind the *_fsink queries: stop the query
    // after batch 1, start a NEW query on the SAME checkpoint + sink, feed
    // batch 2 — the dedup state must survive the restart (cross-restart
    // duplicates suppressed) and the committed files must hold each output
    // row exactly once (the sink's _spark_metadata transaction log)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("fsink_resume_")
    val data = base.resolve("data").toString
    val ckpt = base.resolve("ckpt").toString
    def start() = StreamingDedup.firstSeen(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("parquet").option("path", data)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    in.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa")) // in-batch dup: drop 3
    q1.processAllAvailable(); q1.stop()
    val q2 = start() // resumes from the checkpoint's offsets + state
    in.addData((4L, "bbb"), (5L, "ccc"), (6L, "aaa")) // 4,6 dup ACROSS restart
    q2.processAllAvailable(); q2.stop()
    val kept = spark.read.parquet(data).select("doc_id")
      .as[Long].collect().sorted.toSeq
    // exactly-once: each keeper once, restart replayed nothing, state held
    assert(kept == Seq(1L, 2L, 5L))
  }

  test("file SOURCE -> first-seen -> file sink: two-wave incremental pickup") {
    // the fully file-fed production pipeline (no MemoryStream): wave 2
    // lands in the watched directory AFTER wave 1 committed, so its
    // duplicates of wave-1 content can only be suppressed by the
    // checkpointed state — incremental pickup, not a re-read
    val wave1 = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")) // in-wave dup: 3
    val wave2 = Seq((4L, "bbb"), (5L, "ccc"), (6L, "aaa")) // cross-wave dups
    val got = StreamDriver.firstSeenFileSource(spark, Seq(wave1, wave2))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.map(_._1) == Set(1L, 2L, 5L))
    // content hashes match the batch md5 contract
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == Set((1L, h("aaa")), (2L, h("bbb")), (5L, h("ccc"))))
    // empty waves are skipped without committing anything
    val empty = StreamDriver.firstSeenFileSource(spark, Seq(Seq.empty))
    assert(empty.collect().isEmpty)
  }
}
