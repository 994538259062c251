package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cind.CindEngine
import graft.dedup.Dedup
import graft.pipeline.Curation
import graft.rdf.TripleSource
import graft.sim.Similarity

/** 10x scale soak (round-6 verdict item 5): run the three heaviest
  * pipelines once at ~sf1 — ~23M triples / 50k docs — and report wall
  * seconds plus shuffle-write volume, so the skew-slicing / probe-admission
  * / banding scale claims rest on an order-of-magnitude datapoint instead
  * of extrapolation from sf0.1.
  *
  * The sf1-scale inputs are DERIVED from the driver's sf0.1 fixtures
  * (TESTDATA.md ships sf<=0.1): ten shards of the sf0.1 relation, each
  * shard suffixing subj/obj (triples) or offsetting doc_id (documents).
  * Sharded triples scale the capture dictionary and join-line COUNT 10x
  * while keeping per-line width — the reference's own scaling behavior
  * (more conditions, not wider hubs). Identical cross-shard documents give
  * every doc a 10-clique of exact near-dups — the duplication-heavy shape
  * a web-scale corpus actually has.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.Soak /root/testdata/sf0.1'
  * Prints one JSON line per query: wall sec, total shuffle-write MB, and
  * the largest single-stage shuffle write (the would-be cluster bottleneck).
  */
object Soak {

  private final class ShuffleTally extends SparkListener {
    @volatile var totalWrite = 0L
    @volatile var maxStageWrite = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        val w = m.shuffleWriteMetrics.bytesWritten
        totalWrite += w
        if (w > maxStageWrite) maxStageWrite = w
      }
    }
    def reset(): Unit = { totalWrite = 0L; maxStageWrite = 0L }
  }

  /** Streaming state tally (round-12, VERDICT r11 item 5): a global
    * StreamingQueryListener recording, across every micro-batch of the
    * soaked query, the peak state-store row count / memory and the final
    * event-time watermark vs the max observed event time — the numbers
    * that decide whether state is bounded at a decade. Progress events
    * are async like the stage bus; [[run]]'s quiet-poll covers both. */
  private final class StreamTally
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    @volatile var maxStateRows = 0L
    @volatile var maxStateMem = 0L
    @volatile var lastWatermark = ""
    @volatile var lastMaxEventTime = ""
    @volatile var nBatches = 0L
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      nBatches += 1
      val rows = p.stateOperators.map(_.numRowsTotal).sum
      val mem = p.stateOperators.map(_.memoryUsedBytes).sum
      if (rows > maxStateRows) maxStateRows = rows
      if (mem > maxStateMem) maxStateMem = mem
      val et = p.eventTime
      if (et != null) {
        val wm = et.get("watermark")
        if (wm != null) lastWatermark = wm
        val mx = et.get("max")
        if (mx != null) lastMaxEventTime = mx
      }
    }
    def reset(): Unit = {
      maxStateRows = 0L; maxStateMem = 0L
      lastWatermark = ""; lastMaxEventTime = ""; nBatches = 0L
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shards = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // sf10 lesson (BASELINE.md round-11): Spark's ObjectHashAggregate
    // falls back to SORT-BASED aggregation after only 128 distinct keys
    // per partition (spark.sql.objectHashAggregate.sortBased
    // .fallbackThreshold default). For typed-Aggregator pipelines with
    // CAP-BOUNDED buffers (the CIND hybrid) that external sort wrote
    // ~60 GB of spill at 232M triples and blew the box's disk budget —
    // raising the threshold keeps the agg in the hash regime (~700k
    // dependents x ~200 B per partition = GBs of heap). But it is a
    // SCALPEL, not a default: applied globally it also pins the
    // UNBOUNDED join-line array buffers of the count-match path in
    // memory, which OOM'd a 96 GB heap at 74M triples (both failure
    // modes measured this round). Opt-in per family via
    // SPARK_GRAFT_OBJ_AGG_FALLBACK; unset keeps Spark's default.
    val objAggThreshold = sys.env.get("SPARK_GRAFT_OBJ_AGG_FALLBACK")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
    objAggThreshold.foreach(v => builder.config(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    // opt-in shuffle codec swap (SPARK_GRAFT_SHUFFLE_CODEC=zstd): the
    // sf10 CIND attempts die on SCRATCH DISK, not CPU — zstd's better
    // ratio over lz4 trades compression cycles for the binding resource
    sys.env.get("SPARK_GRAFT_SHUFFLE_CODEC").foreach(v =>
      builder.config("spark.io.compression.codec", v))
    // encode-regime selector for the CIND families (see CindEngine
    // .dictEncodeMaxBroadcastRows): 0 forces the shuffle-join encode
    // (no driver dict collect), a large value pins the broadcast
    // hash-map encode. CAUTION measured r12: the fallback's
    // collect_list regroup has UNBOUNDED array buffers — combining it
    // with SPARK_GRAFT_OBJ_AGG_FALLBACK pins those in heap and OOMs
    // exactly like the count-match path the r11 scaladoc warns about.
    sys.env.get("SPARK_GRAFT_DICT_MAX_BCAST").foreach(v =>
      builder.config("spark.graft.cind.dictEncodeMaxBroadcastRows", v))
    // A/B valve for the support-monotonicity evidence prune (r13): 0
    // disables, large forces — the lever's sign is measured, not assumed
    sys.env.get("SPARK_GRAFT_SUPPORT_PRUNE_MAX").foreach(v =>
      builder.config("spark.graft.cind.supportPruneMaxIds", v))
    val spark = builder
      .config("spark.ui.enabled", "false")
      // soak logs want the CIND encode-regime decision (library default: quiet)
      .config("spark.graft.cind.verbose", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.log.level", "WARN")
      .getOrCreate()
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val streamTally = new StreamTally
    spark.streams.addListener(streamTally)

    // ---- sharded sf1-scale inputs, materialized once so query timings
    // measure the pipelines, not the input expansion
    val shardIds = spark.range(shards).select(col("id").cast("int").as("shard"))
    // SPARK_GRAFT_SOAK_NOPERSIST=1 skips the input cache: at sf10 the
    // persisted 232M-triple relation alone writes ~50 GB of storage
    // blocks — more than half the box's scratch — while re-deriving it
    // per pass is a cheap columnar scan + crossJoin. Wall then includes
    // the re-derivation (documented with the soak row); scratch goes to
    // the shuffles, which are the thing being measured.
    val noPersist = sys.env.get("SPARK_GRAFT_SOAK_NOPERSIST").contains("1")
    val triples0 = TripleSource.derive(spark, sfDir)
      .crossJoin(shardIds)
      .select(concat(col("subj"), lit("#"), col("shard")).as("subj"),
        col("pred"),
        concat(col("obj"), lit("#"), col("shard")).as("obj"))
    // lazy like emb1 below: the event-stream families never touch the
    // triple or document relations, and at 100 shards the upfront
    // derive+count alone costs tens of minutes — built and counted only
    // when a selected family actually reads them
    lazy val triples1 = {
      val t = if (noPersist) triples0 else triples0.persist()
      System.err.println(s"soak triples: ${t.count()}")
      t
    }
    lazy val docs1 = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .crossJoin(shardIds)
        .withColumn("doc_id", col("doc_id") + col("shard").cast("long") * 10000000L)
        .drop("shard")
        .persist()
      System.err.println(s"soak docs: ${d.count()}")
      d
    }
    // identical vectors across shards: every embedding gains a 10-clique of
    // cosine-1.0 duplicates — the dedup-shaped load an ANN/near-dup pass
    // sees on a web-scale corpus (vec_id offsets are multiples of 100, so
    // the `% 100 === 0` query predicate keeps its per-shard meaning)
    // lazy: the default selection (count-match, s2l, minhash) and every
    // non-embedding run otherwise pays the 10x embeddings materialization
    // up front for nothing — built and counted only when an embedding
    // query (neardup/ivf) is actually selected
    lazy val emb1 = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .crossJoin(shardIds)
        .withColumn("vec_id", col("vec_id") + col("shard").cast("long") * 10000000L)
        .drop("shard")
        .persist()
      System.err.println(s"soak embeddings: ${e.count()}")
      e
    }

    // Timed sink is a noop WRITE, not count(): under count() Catalyst
    // prunes every column the final row-count doesn't need — for the
    // nested-aggregate profilers (functionalDeps, uniqueCombinations) that
    // deletes the distinct() and inner groupBy entirely, reading 3 s for a
    // pipeline whose materialization costs 23 s (measured, r9). The noop
    // sink forces the full result; an Observation recovers the row count
    // from the same single execution.
    def run(name: String, body: => DataFrame): Unit = {
      tally.reset()
      streamTally.reset()
      val obs = org.apache.spark.sql.Observation(name)
      val t0 = System.nanoTime()
      body.observe(obs, count(lit(1)).as("rows"))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = obs.get("rows").asInstanceOf[Long]
      // BOTH listener buses are ASYNC: a short job's stage-completed events
      // can still be in flight when the write returns (bogus 0-MB shuffle),
      // and the LAST micro-batch's progress event lands on the separate
      // StreamingQueryListener bus after the query stops (under-reported
      // n_batches/max_state_rows). Poll until BOTH tallies stop moving.
      var prev = (-1L, -1L, -1L)
      var spins = 0
      while ((tally.totalWrite, streamTally.nBatches,
          streamTally.maxStateRows) != prev && spins < 50) {
        prev = (tally.totalWrite, streamTally.nBatches, streamTally.maxStateRows)
        spins += 1; Thread.sleep(100)
      }
      val streamed =
        if (streamTally.nBatches == 0) ""
        else f""","n_batches":${streamTally.nBatches},""" +
          f""""max_state_rows":${streamTally.maxStateRows},""" +
          f""""max_state_mb":${streamTally.maxStateMem / 1e6}%.0f,""" +
          f""""watermark":"${streamTally.lastWatermark}",""" +
          f""""max_event_time":"${streamTally.lastMaxEventTime}""""
      println(f"""{"query":"$name","rows":$rows,"sec":$sec%.1f,""" +
        f""""shuffle_write_mb":${tally.totalWrite / 1e6}%.0f,""" +
        f""""max_stage_shuffle_mb":${tally.maxStageWrite / 1e6}%.0f""" +
        streamed + "}")
    }

    val which: Set[String] =
      sys.env.get("SPARK_GRAFT_SOAK_ONLY").map(_.split(",").toSet)
        .getOrElse(Set("count-match", "s2l", "minhash"))
    if (which("count-match"))
      run("cind_all_sf1", CindEngine.allCinds(triples1).toDF())
    if (which("count-match-bloomcaps"))
      // the two-pass line-formation shape (VERDICT r13 #7): instances
      // dedup + encode to ids MAP-SIDE before grouping, so the formation
      // exchange carries ids instead of string structs — the default-at-
      // scale A/B against the string-struct formation above
      run("cind_all_bloomcaps_sf1",
        CindEngine.allCinds(triples1, bloomCaptures = true).toDF())
    if (which("s2l"))
      run("cind_all_s2l_sf1", CindEngine.allCindsSmallToLarge(triples1).toDF())
    if (which("tworound"))
      // the pair-count sketch must be SIZED to the run's pair vocabulary
      // (shard-suffixed values make cross-shard captures distinct, so the
      // vocabulary grows ~linearly in shards): a 4M-capacity spectral
      // filter at sf10's ~tens-of-millions of pairs saturates its counting
      // cells and admits everything — still exact (round 2 recounts), but
      // it measures count-match + sketch overhead, not the tworound prune
      run("cind_all_tworound_sf1", CindEngine.allCindsTwoRound(triples1,
        expectedPairs = sys.env.get("SPARK_GRAFT_TWOROUND_EXPECTED_PAIRS")
          .map(_.toLong).getOrElse(4000000L)).toDF())
    if (which("hybrid"))
      run("cind_all_hybrid_sf1", CindEngine.allCindsHybrid(triples1).toDF())
    if (which("minhash"))
      run("dedup_minhash_pairs_sf1", Dedup.minhashLshPairs(docs1, 50))
    // ---- LLM-pipeline heavies at 10x (SPARK_GRAFT_SOAK_ONLY selects):
    // each duplicates the matching sf0.1 bench query's parameters exactly,
    // so the 10x reading divides by the floor for a clean scaling factor
    if (which("jaccard"))
      run("dedup_jaccard_pairs_sf1", Dedup.jaccardPairs(docs1, 50))
    if (which("clusters"))
      run("dedup_clusters_sf1", Dedup.duplicateClusters(docs1, 50))
    if (which("curate"))
      run("curate_docs_sf1", Curation.curate(docs1, 50))
    if (which("decon"))
      run("text_decontaminate_sf1", Curation.decontaminate(
        docs1.filter(col("doc_id") % 20 =!= 0), docs1.filter(col("doc_id") % 20 === 0)))
    if (which("neardup"))
      run("sim_near_dup_pairs_sf1",
        Similarity.cosineNearDupPairs(emb1, 0.95, dims = 64))
    if (which("ngram"))
      // cross-shard identical docs: EVERY window is shared 10 ways — the
      // worst-case dup-window density for the inverted hash join
      run("dedup_ngram_windows_sf1", Dedup.ngramWindowDups(docs1, 8))
    if (which("hh"))
      run("text_heavy_hitters_sf1",
        graft.text.TextAnalysis.heavyHitters(docs1, 0.005))
    if (which("bpe"))
      // 10x corpus, identical cross-shard docs -> the word-frequency
      // vocabulary is UNCHANGED; wall time should track the vocab, not
      // the corpus (the bpeTrain scaling claim, measured)
      run("text_bpe_train_sf1", graft.text.TextAnalysis.bpeTrain(docs1, 3))
    if (which("paragraphs"))
      // cross-shard identical docs: every chunk's election group has 10
      // members — the boilerplate-heavy shape the min-struct combine is for
      run("dedup_paragraphs_sf1", Dedup.paragraphDedup(docs1, 20))
    if (which("cross-source"))
      // sources repeat across shards, so the distinct (source, window)
      // relation stays sf0.1-sized while the input is 10x — the map-side
      // set-partial should absorb the duplication before the Exchange
      run("dedup_cross_source_sf1", Dedup.crossSourceOverlap(docs1, 7))
    if (which("spans"))
      // cross-shard identical docs: EVERY window is duplicated, so the
      // interval union runs over the densest possible per-doc dup stream
      // (one island covering each whole document) — worst case for the
      // doc-partitioned window, best case for span compression
      run("dedup_spans_sf1", Dedup.dupSpans(docs1, 8))
    if (which("containment"))
      // every doc has 9 exact copies cross-shard: the directed pair
      // stream is ~20x the undirected Jaccard result — stresses the
      // derive-both-directions union over the capped inverted index
      run("dedup_containment_sf1", Dedup.containmentPairs(docs1, 80))
    if (which("ivf"))
      run("sim_topk_ivf_sf1",
        Similarity.ivfTopK(emb1, col("vec_id") % 100 === 0, 10))
    if (which("pq"))
      // 10x collection AND 10x queries: the ADC stream is 100x the sf0.1
      // bench's — stresses the bounded-aggregator candidate stage (the
      // |queries| x n regime the window formulation could not shuffle)
      run("sim_topk_pq_sf1",
        Similarity.pqTopK(emb1, col("vec_id") % 100 === 0, 10))
    if (which("stream-simhash"))
      // 10x docs through the per-(band, bucket) state: cross-shard
      // identical docs put 10 members in every occupied bucket — each
      // arrival scans its bucket list, the hot-bucket regime for the
      // signature state (driver-fed batches, operator runs distributed)
      run("dedup_simhash_stream_sf1", {
        import spark.implicits._
        val all = docs1.select(col("doc_id"), col("text"))
          .orderBy("doc_id").as[(Long, String)].collect().toSeq
        val batches = all.grouped(math.max(1, (all.size + 3) / 4)).toSeq
        graft.streaming.StreamDriver.simhashPairsStreamed(spark, batches)
      })
    // ---- streaming surface at 10x. MemoryStream feeding is driver-fed by
    // design (the bounded fixture is collected, the operator under test
    // runs distributed), so these probe where the DRIVER-side bound cracks:
    // the collect + addData path, not the state machine.
    if (which("stream-curate"))
      run("curate_stream_sf1", {
        import spark.implicits._
        val all = docs1.select(col("doc_id"), col("text"))
          .orderBy("doc_id").as[(Long, String)].collect().toSeq
        val batches = all.grouped(math.max(1, (all.size + 3) / 4)).toSeq
        graft.streaming.StreamDriver.curateStreamed(spark, batches)
      })
    if (which("stream-asof")) {
      // events at 10x: shard user_id/event_id (the state dimension — 10x
      // keys through flatMapGroupsWithState), ts unchanged
      import spark.implicits._
      val events1 = graft.streaming.EventSource.events(spark, sfDir)
        .crossJoin(shardIds)
        .withColumn("user_id", col("user_id") + col("shard").cast("long") * 10000000L)
        .withColumn("event_id", col("event_id") + col("shard").cast("long") * 100000000L)
        .drop("shard")
        .persist()
      System.err.println(s"soak events: ${events1.count()}")
      run("events_asof_stream_sf1", {
        val clicks = events1.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
          .as[(Long, Long, java.sql.Timestamp)].collect().toSeq
        val views = events1.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("value").as("v"))
          .select(col("user_id"), col("ts"), col("v"))
          .as[(Long, java.sql.Timestamp, Double)].collect().toSeq
        graft.streaming.StreamDriver.asOfStreamed(spark, clicks, views)
      })
    }
    if (which("stream-rolling")) {
      // rolling state machine at 10x user keys: ts unchanged, user/event
      // ids sharded — 10x flatMapGroupsWithState keys, same frame width
      import spark.implicits._
      val events1 = graft.streaming.EventSource.events(spark, sfDir)
        .crossJoin(shardIds)
        .withColumn("user_id", col("user_id") + col("shard").cast("long") * 10000000L)
        .withColumn("event_id", col("event_id") + col("shard").cast("long") * 100000000L)
        .drop("shard")
        .persist()
      System.err.println(s"soak events: ${events1.count()}")
      run("events_rolling_stream_sf1", {
        val ev = events1
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSeq
        graft.streaming.StreamDriver.rollingStreamed(spark, ev, 5)
      })
    }
    if (which("stream-windowusers")) {
      // the CHAINED stateful pair (dedup agg -> window agg) at 1M events
      // and 10x user keys: the first aggregation's state is every open
      // window's distinct-user set — the larger of the two stores
      import spark.implicits._
      val events1 = graft.streaming.EventSource.events(spark, sfDir)
        .crossJoin(shardIds)
        .withColumn("user_id", col("user_id") + col("shard").cast("long") * 10000000L)
        .drop("shard")
        .persist()
      System.err.println(s"soak events: ${events1.count()}")
      run("events_window_users_stream_sf1", {
        val ev = events1.select(col("ts"), col("user_id"))
          .as[(java.sql.Timestamp, Long)].collect().toSeq
        graft.streaming.StreamDriver.windowUsersStreamed(spark, ev)
      })
    }
    if (which("stream-join")) {
      // NATIVE stream-stream interval join at 10x state keys
      import spark.implicits._
      val events1 = graft.streaming.EventSource.events(spark, sfDir)
        .crossJoin(shardIds)
        .withColumn("user_id", col("user_id") + col("shard").cast("long") * 10000000L)
        .withColumn("event_id", col("event_id") + col("shard").cast("long") * 100000000L)
        .drop("shard")
        .persist()
      System.err.println(s"soak events: ${events1.count()}")
      run("events_join_stream_sf1", {
        val clicks = events1.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
          .as[(Long, Long, java.sql.Timestamp)].collect().toSeq
        val views = events1.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("value"))
          .as[(Long, java.sql.Timestamp, Double)].collect().toSeq
        graft.streaming.StreamDriver.intervalJoinStreamed(
          spark, clicks, views, "4 hours")
      })
    }
    if (which("pagerank"))
      // cross-shard identical docs: every originally-unique window gains
      // df=10 -> 45 pairs per window through the capped self-join — the
      // densest edge regime the df cap admits
      run("text_pagerank_sf1", graft.graph.Graph.contentPageRank(docs1, 8, 80, 3))
    if (which("cms"))
      run("text_cms_estimates_sf1",
        graft.text.TextAnalysis.cmsEstimates(docs1, 4, 1024, 50))
    if (which("ivfpq-res"))
      // 10x collection and queries through the residual path: per-list
      // LUTs broadcast at nProbe x query count, ADC stays list-scoped
      run("sim_topk_ivfpq_res_sf1",
        Similarity.ivfPqResidualTopK(emb1, col("vec_id") % 100 === 0, 10))
    if (which("stream-hh"))
      // 10x docs through the sharded online sketch: per-shard state stays
      // O(cap); the recount tail is the batch aggregate
      run("text_heavy_hitters_stream_sf1", {
        import spark.implicits._
        val all = docs1.select(col("doc_id"), col("text"))
          .orderBy("doc_id").as[(Long, String)].collect().toSeq
        val batches = all.grouped(math.max(1, (all.size + 3) / 4)).toSeq
        graft.streaming.StreamDriver.heavyHittersStreamed(spark, batches)
      })
    if (which("warehouse")) {
      // warehouse suite at 10x: FACT tables shard with key-consistent
      // offsets (orderkey ties lineitem<->orders, custkey orders<->
      // customer, suppkey lineitem<->supplier), DIMS stay unsharded —
      // real warehouses grow facts, not nations. Dates/segments repeat
      // per shard, so every filter keeps its selectivity and each result
      // group reads exactly 10x its sf0.1 value (a built-in sanity
      // check). The point: at sf0.1 AQE broadcasts everything; here the
      // un-hinted big joins must flip to shuffled joins cleanly and the
      // rollup's Expand must not dominate.
      val OFF = 100000000L
      def sharded(table: String, keys: String*): DataFrame = {
        val d = spark.read.parquet(s"$sfDir/$table.parquet").crossJoin(shardIds)
        keys.foldLeft(d)((acc, k) =>
            acc.withColumn(k, col(k) + col("shard").cast("long") * OFF))
          .drop("shard").persist()
      }
      val cust1 = sharded("customer", "c_custkey")
      val ord1 = sharded("orders", "o_orderkey", "o_custkey")
      val li1 = sharded("lineitem", "l_orderkey", "l_suppkey", "l_partkey")
      val supp1 = sharded("supplier", "s_suppkey")
      val part1 = sharded("part", "p_partkey")
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      System.err.println(s"soak warehouse: ${li1.count()} lineitems, " +
        s"${ord1.count()} orders, ${cust1.count()} customers")
      import graft.stats.Analytics
      run("tpch_pricing_summary_sf1", Analytics.pricingSummary(li1, "2000-12-01"))
      run("tpch_top_orders_sf1",
        Analytics.topRevenueOrders(cust1, ord1, li1, "BUILDING", "1998-01-01", 10))
      run("tpch_region_revenue_sf1",
        Analytics.regionRevenue(cust1, ord1, li1, supp1, nation, region,
          "AFRICA", "1996-01-01", "1999-01-01"))
      run("tpch_revenue_rollup_sf1",
        Analytics.revenueRollup(cust1, ord1, li1, nation, region,
          "1996-01-01", "1999-01-01"))
      // the round-9 correlated-subquery family: join-on-aggregate shapes
      run("tpch_small_quantity_sf1",
        Analytics.smallQuantityRevenue(li1, part1, "Brand#23"))
      run("tpch_dominant_suppliers_sf1",
        Analytics.dominantSuppliers(li1, supp1, nation,
          "1996-01-01", "1997-01-01"))
      // the round-9 wide-report shapes: pivot is one aggregate of CASEs,
      // importance re-aggregates the per-part relation, the disjunction
      // is a broadcast join + one boolean
      run("tpch_priority_pivot_sf1", Analytics.priorityPivot(ord1, li1))
      run("tpch_important_parts_sf1", Analytics.importantParts(li1, 150))
      run("tpch_banded_revenue_sf1", Analytics.bandedRevenue(li1, part1))
    }
    if (which("stream-enrich")) {
      // stream-static enrichment at 10x stream volume: the broadcast dim
      // re-plans per micro-batch; window-agg state is bounded by open
      // windows x categories
      import spark.implicits._
      val events1 = graft.streaming.EventSource.events(spark, sfDir)
        .crossJoin(shardIds)
        .withColumn("event_id", col("event_id") + col("shard").cast("long") * 100000000L)
        .drop("shard")
        .persist()
      System.err.println(s"soak events: ${events1.count()}")
      run("events_enriched_stream_sf1", {
        val ev = events1.select(col("ts"), col("event_type"), col("value"))
          .as[(java.sql.Timestamp, String, Double)].collect().toSeq
        graft.streaming.StreamDriver.enrichedStreamed(spark, ev, Seq(
          ("click", "engagement", 1L), ("view", "engagement", 1L),
          ("purchase", "revenue", 5L), ("signup", "growth", 3L)))
      })
    }
    if (which("pathclosure"))
      // sharded triples = 10 DISJOINT graph copies: closure depth is
      // unchanged, every round's frontier is 10x — the semi-naive
      // delta's per-round shuffle must scale with the frontier
      run("rdf_path_transitive_sf1", graft.rdf.TripleStats.pathClosure(
        triples1, Seq("customer", "nation", "region")))
    if (which("lmbits"))
      // identical cross-shard docs: the bigram MODEL is unchanged (same
      // distinct bigrams, counts x10) while the corpus is 10x — wall
      // should track the doc-side join, never the model rebuild
      run("text_lm_bits_sf1", graft.text.TextAnalysis.lmBits(docs1))
    if (which("bm25"))
      run("text_bm25_sf1", graft.text.TextAnalysis.bm25TopK(docs1, Seq(
        1 -> Seq("dup", "merge"), 2 -> Seq("hash", "join", "table"),
        3 -> Seq("spark", "window"), 4 -> Seq("slow", "scan", "filter"))))
    if (which("incremental"))
      // shard offsets are multiples of 5, so the %5 delta predicate keeps
      // its per-shard meaning: every delta doc probes a corpus where its
      // near-dup group has 8 cross-shard members — the hot-bucket probe
      run("dedup_incremental_sf1",
        Dedup.incrementalDedup(docs1, col("doc_id") % 5 === 0, 50))
    if (which("scd")) {
      // 10x dimension through the MERGE: the open slice and the update
      // batch both shard; per-key work is constant
      val OFF = 100000000L
      val cust1 = spark.read.parquet(s"$sfDir/customer.parquet")
        .crossJoin(shardIds)
        .withColumn("c_custkey", col("c_custkey") + col("shard").cast("long") * OFF)
        .drop("shard").persist()
      System.err.println(s"soak scd: ${cust1.count()} customers")
      val cust = cust1.select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
      val current = cust.select(col("k"), col("v"),
        lit(0L).as("valid_from_us"), lit(-1L).as("valid_to_us"))
      val updates = cust.filter(col("k") % 7 === 0)
        .select(col("k"), (col("v") + 10000L).as("v"), lit(1000000L).as("ts_us"))
        .unionAll(cust.filter(col("k") % 11 === 0)
          .select(col("k"), col("v"), lit(2000000L).as("ts_us")))
      run("tpch_scd_customer_sf1", graft.stats.Analytics.scdMerge(current, updates))
    }
    if (which("colocated")) {
      // the bucketed write at 10x facts: measures the one-time layout
      // cost the co-located join amortizes (the join itself reads back
      // shuffle-free regardless of scale)
      val OFF = 100000000L
      def sharded(table: String, keys: String*): DataFrame = {
        val d = spark.read.parquet(s"$sfDir/$table.parquet").crossJoin(shardIds)
        keys.foldLeft(d)((acc, k) =>
            acc.withColumn(k, col(k) + col("shard").cast("long") * OFF))
          .drop("shard").persist()
      }
      val ord1 = sharded("orders", "o_orderkey")
      val li1 = sharded("lineitem", "l_orderkey")
      System.err.println(s"soak colocated: ${li1.count()} lineitems")
      run("tpch_colocated_join_sf1",
        graft.stats.Analytics.colocatedPriorityRevenue(ord1, li1))
    }
    if (which("fds")) {
      // FD/UCC discovery at 10x facts. Keys shard with offsets (stay
      // keys), categoricals keep their 3-5 value domains — the worst
      // case for the distinct-before-shuffle claim is exactly this mix:
      // the o_orderkey-LHS pairs contribute vocabulary ~= row count
      // (distinct barely collapses), the categorical-LHS pairs collapse
      // ~N:1. Shuffle volume should track Σ|π_{X,Y}|, not 12x rows.
      val OFF = 100000000L
      val ord1 = spark.read.parquet(s"$sfDir/orders.parquet")
        .crossJoin(shardIds)
        .withColumn("o_orderkey", col("o_orderkey") + col("shard").cast("long") * OFF)
        .withColumn("o_custkey", col("o_custkey") + col("shard").cast("long") * OFF)
        .drop("shard").persist()
      System.err.println(s"soak fds: ${ord1.count()} orders")
      val fdCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      run("profile_fds_sf1", graft.stats.Profile.functionalDeps(ord1, fdCols))
      run("profile_uniques_sf1", graft.stats.Profile.uniqueCombinations(ord1, fdCols))
      run("stats_degree_distribution_sf1",
        graft.rdf.TripleStats.degreeDistribution(triples1))
    }
    if (which("er")) {
      // 10x customers; the "#shard" suffix makes every base name a
      // 10-clique of cross-shard distance-1 neighbors ON TOP of the
      // within-shard digit pairs — the adversarial shape: hot wildcard
      // buckets (10 names share the shard-position key) and ~3.3M result
      // pairs (10 x 262.5k within-shard + 15k x C(10,2) cross-shard)
      val cust1 = spark.read.parquet(s"$sfDir/customer.parquet")
        .crossJoin(shardIds)
        .withColumn("c_custkey",
          col("c_custkey") + col("shard").cast("long") * 10000000L)
        .withColumn("c_name", concat(col("c_name"), lit("#"), col("shard")))
        .drop("shard").persist()
      System.err.println(s"soak er: ${cust1.count()} customers")
      run("er_name_pairs_sf1",
        Dedup.editNeighborPairs(cust1, "c_custkey", "c_name"))
    }
    if (which("wave2")) {
      // 10x events: shard offsets keep user timelines intact per shard
      // (user_id offset => 10x distinct users, same per-user density —
      // the growth regime a production stream actually has)
      val ev = graft.streaming.EventSource.events(spark, sfDir)
      val ev1 = ev.crossJoin(shardIds)
        .withColumn("user_id",
          col("user_id") + col("shard").cast("long") * 10000000L)
        .withColumn("event_id",
          col("event_id") + col("shard").cast("long") * 1000000000L)
        .drop("shard").persist()
      System.err.println(s"soak wave2: ${ev1.count()} events")
      run("events_attribution_sf1",
        graft.streaming.EventStream.attribution(ev1, "purchase", "1 hour"))
      run("events_user_growth_sf1",
        graft.streaming.EventStream.userGrowth(ev1, "1 day"))
      run("events_decayed_counts_sf1",
        graft.streaming.EventStream.decayedCounts(ev1, "1 hour", 40))
      // 10x docs, unchanged bigram vocabulary: the KN table and the MMR
      // candidate relations must stay vocabulary/candidate-sized
      run("text_kn_bigrams_sf1",
        graft.text.TextAnalysis.knBigrams(docs1, 100))
      run("sim_mmr_rerank_sf1", graft.sim.Similarity.mmrRerank(
        emb1, col("vec_id") % 1000 === 0, 5, 20, 70))
    }
    if (which("graph")) {
      // the round-9 iterative/graph family at 10x docs (VERDICT r9 #5).
      // Cross-shard identical docs: every originally-unique window gains
      // df=10 -> 45 pairs per window through the capped self-join, so the
      // edge relation is ~45x the sf0.1 one while nodes are 10x — the
      // densest regime the df cap admits, and the wedge join's worst case
      val d = docs1
      run("text_pagerank_sf1", graft.graph.Graph.contentPageRank(d, 8, 80, 3))
      run("text_communities_sf1", graft.graph.Graph.contentCommunities(d, 8, 80, 3))
      run("text_triangles_sf1", graft.graph.Graph.triangleCounts(
        d.select("doc_id"), graft.graph.Graph.windowEdges(d, 8, 80)))
    }
    if (which("bgp")) {
      // BGP panel on 10x triples. The generic triples1 sharding suffixes
      // EVERY obj, which empties literal-valued constraints (status='F'
      // never matches 'F#3') — here objs suffix only when the predicate
      // is an entity REF (structural joins stay shard-local, disjoint
      // copies), literals keep their raw values so every star/minus
      // filter keeps its selectivity and results read exactly 10x the
      // sf0.1 cardinality (built-in sanity check)
      import graft.rdf.TripleStats
      val refs = Seq("customer", "nation", "region", "part", "supplier")
      val triplesBgp = TripleSource.derive(spark, sfDir)
        .crossJoin(shardIds)
        .select(concat(col("subj"), lit("#"), col("shard")).as("subj"),
          col("pred"),
          when(col("pred").isin(refs: _*),
            concat(col("obj"), lit("#"), col("shard")))
            .otherwise(col("obj")).as("obj"))
        .persist()
      System.err.println(s"soak bgp triples: ${triplesBgp.count()}")
      run("rdf_bgp_star_sf1", TripleStats.bgpStar(triplesBgp,
        Seq(("status", "F"), ("priority", "1-URGENT")), "customer"))
      run("rdf_bgp_chain_sf1", TripleStats.bgpChain(triplesBgp,
        Seq("customer", "nation", "region", "name")))
      run("rdf_bgp_optional_sf1", TripleStats.bgpOptional(triplesBgp,
        Seq(), "part", "flag"))
      run("rdf_bgp_minus_sf1", TripleStats.bgpMinus(triplesBgp,
        Seq(("status", "F")), "customer", "priority", "1-URGENT"))
      run("rdf_char_sets_sf1", TripleStats.characteristicSets(triplesBgp))
      run("rdf_pred_cooccurrence_sf1", TripleStats.predicateCooccurrence(triplesBgp))
    }
    if (which("r10")) {
      // round-10 operators at 10x. lineitem shards with key offsets (the
      // warehouse recipe); the sketch's working relation must stay
      // cap-bounded per group while n grows 10x (level rises by ~3-4,
      // sample size unchanged — THE scale property of the design)
      val OFF = 100000000L
      val li1 = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .crossJoin(shardIds)
        .withColumn("l_orderkey", col("l_orderkey") + col("shard").cast("long") * OFF)
        .drop("shard").persist()
      System.err.println(s"soak r10: ${li1.count()} lineitems")
      run("profile_quantile_sketch_sf1", graft.stats.Profile.quantileSketch(
        li1, "l_returnflag", round(col("l_extendedprice") * 100),
        col("l_orderkey") * 10 + col("l_linenumber"), Seq(50, 90, 99), 512))
      val ord1 = spark.read.parquet(s"$sfDir/orders.parquet")
        .crossJoin(shardIds)
        .withColumn("o_orderkey", col("o_orderkey") + col("shard").cast("long") * OFF)
        .drop("shard").persist()
      System.err.println(s"soak r10: ${ord1.count()} orders")
      run("profile_zonemap_skip_sf1", graft.stats.Profile.zoneMapSkipping(
        ord1, "o_orderkey", round(col("o_totalprice") * 100),
        5000000L, 10000000L, 64))
      // 10x docs, cross-shard identical content: every test doc's
      // shingles hit 9 train copies — the densest eviction regime
      run("curate_leakage_split_sf1",
        graft.pipeline.Curation.leakageSplit(docs1, 10))
      run("text_vocab_growth_sf1",
        graft.stats.Profile.vocabGrowth(docs1, 10))
      // PIT join at 10x facts AND 10x dimension versions
      val cust1 = spark.read.parquet(s"$sfDir/customer.parquet")
        .crossJoin(shardIds)
        .withColumn("c_custkey", col("c_custkey") + col("shard").cast("long") * OFF)
        .drop("shard")
        .select(col("c_custkey").as("k"),
          round(col("c_acctbal") * 100).cast("long").as("v")).persist()
      val dim1 = graft.stats.Analytics.scdMerge(
        cust1.select(col("k"), col("v"), lit(0L).as("valid_from_us"),
          lit(-1L).as("valid_to_us")),
        cust1.filter(col("k") % 7 === 0)
          .select(col("k"), (col("v") + 10000L).as("v"), lit(1000000L).as("ts_us")))
      val facts1 = ord1.select(col("o_orderkey").cast("long").as("fact_id"),
        col("o_custkey").cast("long").as("k"),
        (pmod(col("o_orderkey"), lit(3)).cast("long") * 1000000L + 500000L)
          .as("ts_us"))
      // note: sharded orders reference UNSHARDED custkeys cross-shard —
      // ts resolution still exercises the version residual; unmatched
      // keys exit through the -1 sentinel like any orphan fact
      run("tpch_pit_join_sf1", graft.stats.Analytics.pitJoin(facts1, dim1))
      // gap fill at 10x event volume: the spine is TIME-range-bounded, so
      // 10x events change the counts, never the output cardinality
      val ev1 = graft.streaming.EventSource.events(spark, sfDir)
        .crossJoin(shardIds)
        .withColumn("event_id",
          col("event_id") + col("shard").cast("long") * 1000000000L)
        .drop("shard").persist()
      System.err.println(s"soak r10 events: ${ev1.count()}")
      run("events_gap_fill_sf1", graft.streaming.EventStream.gapFill(ev1, 300))
    }
    if (which("kmv")) {
      // sharded docs repeat content: input rows 10x, per-source shingle
      // vocabulary UNCHANGED — wall and shuffle should track the scan,
      // the sketch relations stay sources x k by construction
      run("text_kmv_distinct_sf1",
        graft.text.TextAnalysis.kmvDistinct(docs1, 64))
      run("text_kmv_overlap_sf1",
        graft.text.TextAnalysis.kmvOverlap(docs1, 64))
    }
    spark.stop()
  }
}
