package graft.pipeline

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation operators: the decision tables a large-scale
  * training-data pipeline derives before materializing a corpus. These are
  * COMPOSITIONS of the kernel operators (TextAnalysis / Dedup), wired so
  * the whole pipeline stays one declarative plan — the annotators are
  * map-side column adds, clustering is the only shuffle producer, and no
  * step funnels data through the driver or a global window.
  */
object Curation {

  /** Per-document keep/drop decision table:
    * (doc_id, lang_guess, quality_bucket, cluster_id, drop_reason, keep).
    *
    * Stages — the canonical curation order (cheap row-local signals first,
    * pairwise dedup last):
    *   1. language-ID + quality bucketing: map-side column adds over one
    *      scan (no join, no shuffle — see TextAnalysis.withLangId/
    *      withQuality);
    *   2. near-duplicate clustering over the FULL corpus
    *      (Dedup.duplicateClusters — exact-verified Jaccard pairs +
    *      min-label connected components);
    *   3. decision: drop_reason = 'quality' (bucket below
    *      `minQualityBucket`) takes priority over 'duplicate' (not the
    *      cluster canonical); '' = kept.
    *
    * Clustering runs on the full corpus, not the quality-filtered one, so a
    * low-quality canonical never resurrects its higher-id duplicates — the
    * duplicate verdict is independent of the quality verdict (and the two
    * stages can run concurrently; Spark schedules them independently until
    * the final join). One shuffle join on doc_id attaches cluster ids. */
  def curate(docs: DataFrame, minJaccardPct: Int = 50,
      maxShingleDf: Int = Dedup.DefaultMaxShingleDf,
      minQualityBucket: Int = 3,
      canonical: Boolean = false): DataFrame = {
    val clusters = Dedup.duplicateClusters(docs, minJaccardPct, maxShingleDf)
      .select(col("doc_id"), col("cluster_id"))
    val annotated = TextAnalysis.withQuality(TextAnalysis.withLangId(docs))
      .select(col("doc_id"), col("lang_guess"), col("quality_bucket"))
    // duplicate-representative rule: min cluster id by default; with
    // `canonical` the LONGEST member (tie to smallest id) represents —
    // the election reuses the cluster labels already computed, one small
    // aggregate + broadcastable join, never a second cluster fixpoint
    val labeled =
      if (!canonical) annotated.join(clusters, "doc_id")
        .withColumn("rep_id", col("cluster_id"))
      else annotated.join(clusters, "doc_id")
        .join(Dedup.electCanonical(clusters, docs)
          .select(col("cluster_id"), col("canonical_id").as("rep_id")),
          Seq("cluster_id"))
    labeled
      .withColumn("drop_reason",
        when(col("quality_bucket") < minQualityBucket, "quality")
          .when(col("doc_id") =!= col("rep_id"), "duplicate")
          .otherwise(""))
      .withColumn("keep", col("drop_reason") === "")
      .select(col("doc_id"), col("lang_guess"), col("quality_bucket"),
        col("cluster_id"), col("drop_reason"), col("keep"))
  }

  /** Deterministic source-proportional downsampling — the data-mixing step
    * of corpus assembly (hold web text at 30%, keep code at 100%, ...).
    * Per document: sample_pct = pctBySource(source) (defaultPct when the
    * source is unlisted; the map ships as a plan literal, never a join) and
    * kept = (doc_id mod 100) < sample_pct. The mod-100 draw is the
    * SAMPLING CONTRACT, chosen for exact reproducibility anywhere (any
    * engine, any run — no seeded RNG to disagree over); ids uncorrelated
    * with content make it uniform per source. Pure map-side: no shuffle,
    * no UDF. Output: (doc_id, source, sample_pct, kept). */
  def mixBySource(docs: DataFrame, pctBySource: Map[String, Int],
      defaultPct: Int = 100): DataFrame = {
    require(pctBySource.values.forall(p => p >= 0 && p <= 100) &&
      defaultPct >= 0 && defaultPct <= 100, "sample percentages must be 0..100")
    val pct =
      if (pctBySource.isEmpty) lit(defaultPct)
      else coalesce(element_at(typedLit(pctBySource), col("source")), lit(defaultPct))
    docs.select(col("doc_id"), col("source"), pct.as("sample_pct"))
      .withColumn("kept", pmod(col("doc_id"), lit(100)) < col("sample_pct"))
  }

  /** Corpus composition report: per (source, lang), document and token
    * totals plus quality-bucket breakdown — the summary table a mixing
    * decision is made FROM. One map-side-combinable aggregation (the
    * annotators add columns without shuffling). Output: (source, lang,
    * n_docs, n_tokens, n_quality_docs). */
  def corpusStats(docs: DataFrame): DataFrame =
    TextAnalysis.withQuality(docs)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        sum(when(col("quality_bucket") === 3, 1L).otherwise(0L)).as("n_quality_docs"))

  /** Windowed corpus monitoring — the continuous form of [[corpusStats]]:
    * per (event-time window, source), document/token/quality totals over a
    * document stream. The quality annotator is the same map-side column
    * add, so the aggregation is an ordinary watermarked windowed groupBy —
    * state per (window, source) only, emitted on window close (append
    * mode). `docs` must carry an event timestamp `ts`. Batch/stream
    * parity is spec-pinned (the identical plan runs on a bounded frame).
    * Output: (window_start epoch-seconds, source, n_docs, n_tokens,
    * n_quality_docs). */
  def corpusStatsWindowed(docs: DataFrame, windowLen: String = "5 minutes",
      watermark: Boolean = true): DataFrame = {
    val src = if (watermark) docs.withWatermark("ts", "10 minutes") else docs
    TextAnalysis.withQuality(src)
      .groupBy(window(col("ts"), windowLen).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        sum(when(col("quality_bucket") === 3, 1L).otherwise(0L)).as("n_quality_docs"))
      .select(unix_timestamp(col("w.start")).as("window_start"), col("source"),
        col("n_docs"), col("n_tokens"), col("n_quality_docs"))
  }

  /** Streaming corpus intake: the same quality gate as [[curate]] applied
    * map-side to a document STREAM, then cross-batch first-seen exact dedup
    * via the hash-partitioned state store
    * (graft.streaming.StreamingDedup.firstSeen). Emits each surviving
    * document once, in arrival order — the continuous-ingest front half of
    * curation. Near-duplicate clustering stays batch-only by design: the
    * cluster fixpoint is a global property (one late document can merge two
    * clusters), so the scalable streaming shape is this intake filter plus
    * periodic batch [[curate]] over the accumulated snapshot (the
    * TripleStream.discoverSnapshots pattern). */
  def curateStream(docs: DataFrame, minQualityBucket: Int = 3)
      : org.apache.spark.sql.Dataset[graft.streaming.HashedDoc] =
    graft.streaming.StreamingDedup.firstSeen(
      TextAnalysis.withQuality(docs)
        .filter(col("quality_bucket") >= minQualityBucket)
        .select("doc_id", "text"))

  /** Benchmark decontamination — flag training documents that share any
    * 3-token shingle with a held-out evaluation set (the n-gram-overlap
    * rule public training pipelines apply before pretraining; GPT-3's
    * 13-gram and PaLM's 8-gram variants are this same shape with a
    * different n). Output per training document:
    * (doc_id, n_overlap, contaminated) where n_overlap counts the
    * document's DISTINCT shingles that occur anywhere in the benchmark.
    *
    * Scale shape: the benchmark is orders of magnitude smaller than the
    * training corpus, so the training shingle stream — the 100 TB side —
    * is filtered MAP-SIDE by a Bloom filter of the benchmark shingles
    * (native `bloom_might_contain` over xxhash64 keys, built with the
    * executor-side tree merge from the CIND engine) before anything
    * shuffles: the join Exchange carries only probable hits, and the exact
    * equi-join then discards the ~1% false positives, keeping the result
    * exact. The benchmark side is scanned twice (Bloom build + verify
    * join) plus one narrow sizing aggregate — the small side pays so the
    * big side moves once. */
  def decontaminate(train: DataFrame, bench: DataFrame,
      bloomPrefilter: Boolean = true): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    def docShingles(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.shingles(col("text")))).as("sh"))
    val benchSh = docShingles(bench).select("sh").distinct()
    val trainSh = docShingles(train)
    val probed = if (bloomPrefilter) {
      // exact upper bound on benchmark shingle count (n_tokens - 2 per
      // doc): one narrow scan of the small side sizes the filter, no cache
      val r = bench.agg(
        sum(greatest(size(TextAnalysis.tokens(col("text"))) - 2, lit(0)))).head()
      val bound = math.max(64L, if (r.isNullAt(0)) 0L else r.getLong(0))
      val bf = graft.cind.CindEngine.buildBloomLongs(
        benchSh.select(xxhash64(col("sh"))).as[Long], bound, 0.01)
      val bcast = spark.sparkContext.broadcast(bf)
      import org.apache.spark.sql.graft.ColumnBridge
      trainSh.filter(ColumnBridge.column(graft.functions.BloomMightContain(
        ColumnBridge.expression(xxhash64(col("sh"))), bcast)))
    } else trainSh
    val hits = probed.join(benchSh, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    train.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Per-source document cap — keep the k best documents of every source
    * (quality_bucket desc, doc_id asc as the deterministic tiebreak), the
    * "domain cap" that stops one crawl source from dominating a mixed
    * corpus. Ranking runs through the bounded
    * [[graft.scale.TopKAggregator]], NOT a ranking window: a window
    * partitioned by source funnels an ENTIRE source through one task
    * (sources are few and huge at corpus scale — the one partitioning
    * guaranteed to skew), while the aggregator holds O(k) state per source
    * per map task and merges partials, so no task ever materializes a
    * source's full document list. The source vocabulary is
    * dictionary-encoded through a collected map (bounded: it is the
    * corpus's source-label set, KB-scale by construction).
    * Output: (source, rank, doc_id, quality_bucket), rank 1..k. */
  def capPerSource(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val annotated = TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("source"), col("quality_bucket"))
    // null sources get their own reserved bucket (-1): a typedLit map can't
    // carry a null key, and the driver-side sort would NPE on one — so
    // nulls bypass the dictionary entirely instead of poisoning it
    val sources = annotated.select("source").distinct()
      .collect().map(r => Option(r.getString(0))).flatten.sorted
    val enc = typedLit(sources.zipWithIndex.map { case (s, i) => (s, i.toLong) }.toMap)
    val dec = typedLit(sources.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toMap)
    val scored = annotated.select(
      when(col("source").isNull, lit(-1L))
        .otherwise(element_at(enc, col("source"))).as("key"),
      col("doc_id").as("id"),
      col("quality_bucket").cast("double").as("score"))
    graft.scale.TopK.topKPerKey(scored, "key", "id", "score", k)
      .select(
        when(col("key") === -1L, lit(null).cast("string"))
          .otherwise(element_at(dec, col("key"))).as("source"),
        col("rank"),
        col("id").as("doc_id"), col("score").cast("int").as("quality_bucket"))
  }

  /** Bucketed two-phase prefix sum of per-document token counts — the
    * shared engine of [[budgetSample]] and [[packSequences]]. An ordered
    * prefix sum is the textbook global-window trap (`Window.orderBy` with
    * no partitioning = every row through ONE task). Scalable shape instead:
    *   1. bucket docs by deterministic id range (numBuckets buckets);
    *   2. one tiny aggregation collects per-bucket token totals to the
    *      driver (numBuckets rows — KBs, independent of corpus size);
    *   3. exclusive prefix sums over the bucket totals become a literal
    *      lookup map folded into the plan;
    *   4. the within-bucket running sum is a PARTITIONED window
    *      (partitionBy bucket), shifted by the bucket's offset.
    * Every stage is bounded per-task; only bucket TOTALS ever serialize.
    * Requires non-negative doc_ids (holds for the fixture tables).
    * Output: (doc_id, n_tokens, cum_tokens) with cum_tokens the INCLUSIVE
    * running total in doc_id order. */
  private def tokenPrefixSum(docs: DataFrame, numBuckets: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val maxRow = toks.agg(max("doc_id")).head()
    // empty corpus: zero rows, any cum column is vacuously correct — but
    // span arithmetic below would NPE on the null max
    if (maxRow.isNullAt(0)) return toks.withColumn("cum_tokens", lit(0L))
    val span = maxRow.getLong(0) / numBuckets + 1
    val bucketed = toks.withColumn("bucket",
      floor(col("doc_id") / lit(span)).cast("long"))
    val totals = bucketed.groupBy("bucket").agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Long, Long] = totals
      .scanLeft((-1L, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toMap
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("cum_tokens",
        sum("n_tokens").over(w) + element_at(typedLit(offsets), col("bucket")))
      .select("doc_id", "n_tokens", "cum_tokens")
  }

  /** The ONE split coin: md5 percent bucket of doc_id — shared by
    * [[splitCorpus]] and [[leakageSplit]] so their train/test membership
    * can never drift apart. */
  private def splitBucket: org.apache.spark.sql.Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("int") % 100

  /** Deterministic corpus split — the train/valid/test assignment every
    * training pipeline makes before materializing shards. Each document
    * hashes to a bucket in [0, 100) via the first 4 hex digits of
    * md5(doc_id) — content/ordering/partitioning-independent, so the
    * assignment is REPRODUCIBLE across engines, runs, and corpus
    * revisions (a doc keeps its split when other docs come and go, the
    * property shuffle-based splits lack). `splits` lists (name, percent)
    * with percents summing to 100; buckets map to splits by cumulative
    * range in list order. Pure map-side projection: no shuffle, no UDF
    * (md5/conv are codegen'd builtins), scales as a scan.
    * Output: (doc_id, bucket, split). */
  def splitCorpus(docs: DataFrame,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) && splits.map(_._2).sum == 100,
      s"split percents must be positive and sum to 100: $splits")
    val bucket = splitBucket
    val cuts = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val expr = splits.zip(cuts).foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(col("bucket") < cut, name))(_.when(col("bucket") < cut, name)))
    }.get
    docs.select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split", expr)
  }

  /** Leakage-aware train/test split — the composition an eval pipeline
    * actually needs: [[splitCorpus]]'s deterministic md5 assignment
    * (train = bucket < 100−testPct, the same coin and cut order), then
    * EVICT from train every document sharing a 3-token shingle with ANY
    * test document ([[decontaminate]] with the split's own test side as
    * the benchmark). A plain split leaks near-copies of held-out
    * documents into train — the classic eval-inflation bug; this one
    * guarantees the kept train shards are shingle-disjoint from test.
    * Test documents always keep; train documents keep iff n_overlap == 0.
    * Cost = one map-side split projection + one decontaminate probe
    * (Bloom-prefiltered; the benchmark shingle set is testPct% of the
    * corpus — at 100 TB route the probe through the capped inverted
    * index exactly as decontaminate documents).
    * Output: (doc_id, split, n_overlap, kept). */
  def leakageSplit(docs: DataFrame, testPct: Int = 10): DataFrame = {
    require(testPct > 0 && testPct < 100, "testPct in (0, 100)")
    val bucket = splitBucket
    val tagged = docs.withColumn("split",
      when(bucket < lit(100 - testPct), "train").otherwise("test"))
    val dec = decontaminate(
      tagged.filter(col("split") === "train"),
      tagged.filter(col("split") === "test"))
    tagged.select("doc_id", "split")
      .join(dec.select("doc_id", "n_overlap"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("split"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (col("split") === "test" || coalesce(col("n_overlap"), lit(0L)) === 0)
          .as("kept"))
  }

  /** Token-budget sampling: running token total in doc_id order and
    * `in_budget` = (cumulative tokens <= budgetTokens) — the "take documents
    * until the budget is hit" step of corpus assembly. Prefix sum via
    * [[tokenPrefixSum]] (bucketed, never a global window).
    * Output: (doc_id, n_tokens, cum_tokens, in_budget). */
  /** Systematic PPS sampling — draws with probability proportional to
    * token mass, the design a "sample ~100 documents representative of
    * the corpus BY VOLUME" request actually means ([[budgetSample]] is
    * the prefix cut; this spreads the picks across the whole corpus).
    * Lay the documents end to end in doc_id order (the same exclusive
    * prefix-sum engine as [[packSequences]] — bucketed two-phase, the
    * driver sees 256 bucket totals) and take the owner of every step-th
    * token slot, step = ⌊total/n⌋: a document spanning m slots is drawn
    * m times (`picks` is its sampling weight). NOTE the draw count is
    * ⌊total/step⌋ ∈ [n, 2n), NOT exactly n — the integer step
    * over-draws by up to n−1 when step does not divide total (it equals
    * n exactly when it does; the spec pins this). Inclusion stays
    * proportional to token mass with ZERO
    * randomness — reproducible across engines and runs. All arithmetic
    * is integer-valued (the double floors are exact: quotients are
    * either exact integers or ≥ 1/step away from one).
    * Output: (doc_id, n_tokens, picks), picks ≥ 1 rows only. */
  def ppsSample(docs: DataFrame, n: Long,
      numBuckets: Int = 256): DataFrame = {
    require(n > 0, "need a positive sample size")
    val ps = tokenPrefixSum(docs, numBuckets)
    val tot = ps.agg(max("cum_tokens").as("total"))
    ps.crossJoin(broadcast(tot))
      .withColumn("step", greatest(lit(1L),
        floor(col("total").cast("double") / n).cast("long")))
      .withColumn("picks",
        (floor(col("cum_tokens").cast("double") / col("step")) -
          floor((col("cum_tokens") - col("n_tokens")).cast("double") /
            col("step"))).cast("long"))
      .filter(col("picks") > 0)
      .select("doc_id", "n_tokens", "picks")
  }

  def budgetSample(docs: DataFrame, budgetTokens: Long,
      numBuckets: Int = 256): DataFrame =
    tokenPrefixSum(docs, numBuckets)
      .withColumn("in_budget", col("cum_tokens") <= budgetTokens)
      .select("doc_id", "n_tokens", "cum_tokens", "in_budget")

  /** Sequence packing — the concat-and-chunk step that turns a curated
    * corpus into fixed-length training sequences: all documents' tokens are
    * conceptually concatenated in doc_id order and cut into blocks of
    * `seqLen` tokens (documents straddle block boundaries, the standard
    * GPT-style pretraining layout). Per document this is pure arithmetic on
    * the EXCLUSIVE prefix sum of token counts (via [[tokenPrefixSum]],
    * minus the document's own count):
    *   start_seq    = floor(cum_before / seqLen)
    *   start_offset = cum_before mod seqLen     (token slot in that block)
    *   end_seq      = floor((cum_before + n_tokens - 1) / seqLen)
    * Output: (doc_id, n_tokens, start_seq, start_offset, end_seq), all
    * BIGINT. */
  def packSequences(docs: DataFrame, seqLen: Long,
      numBuckets: Int = 256): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    tokenPrefixSum(docs, numBuckets)
      .withColumn("cum_before", col("cum_tokens") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("cum_before") / seqLen).as("start_seq"),
        (col("cum_before") % seqLen).as("start_offset"),
        floor((col("cum_before") + col("n_tokens") - 1) / seqLen)
          .as("end_seq"))
  }

  /** Token-balanced shard assignment — the "cut the corpus into N
    * equal-token output files" step before materializing training shards:
    * shard(d) = floor(cum_before(d) * numShards / total_tokens), clamped
    * to numShards-1, where cum_before is the exclusive token prefix sum
    * in doc_id order. Pure integer arithmetic on the prefix sum (exact in
    * any engine; the product stays under 2^63 up to ~10^15 corpus tokens
    * x 1024 shards), documents never split, and each shard's token load
    * is within one document of total/numShards. Prefix sums come from the
    * same bucketed two-phase machinery as packing — no global window.
    * Output: (doc_id, n_tokens, shard). */
  def shardAssign(docs: DataFrame, numShards: Int,
      numBuckets: Int = 256): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val ps = tokenPrefixSum(docs, numBuckets)
      .withColumn("cum_before", col("cum_tokens") - col("n_tokens"))
    val t = ps.agg(sum(col("n_tokens")).as("total"))
    ps.crossJoin(broadcast(t))
      .select(col("doc_id"), col("n_tokens"),
        // `div`, not `/`: Spark's slash is DOUBLE division, which loses
        // integer exactness past 2^53 products
        least(expr(s"(cum_before * $numShards) div total"),
          lit((numShards - 1).toLong)).cast("int").as("shard"))
  }

  /** Temperature-scaled mixing weights per source — the multinomial
    * sampling distribution `p(s) ∝ tokens(s)^τ` that upweights small
    * sources relative to proportional sampling (τ=1) without flattening
    * to uniform (τ=0). τ is fixed at 1/2 here: `sqrt` is IEEE
    * correctly-rounded, so the weights are bit-reproducible across
    * engines, which a general `pow(x, 0.7)` is not. Output:
    * (source, n_docs, n_tokens, weight_ppm) — weight_ppm = the source's
    * sampling probability in parts-per-million.
    *
    * Shape: one hash-agg to per-source totals (map-side combine; the
    * token count is a map-side `size(split)` — documents never shuffle),
    * then a broadcast of the SINGLE-row weight total. Per-source rows are
    * bounded by the source vocabulary, not the corpus. */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val c = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextAnalysis.tokens(col("text"))).cast("long")).as("n_tokens"))
    val t = c.agg(sum(sqrt(col("n_tokens"))).as("st"))
    c.crossJoin(broadcast(t))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(lit(1e6) * sqrt(col("n_tokens")) / col("st"))
          .cast("long").as("weight_ppm"))
  }

  /** CCNet-style per-language relative quality tiers: within each
    * language, documents rank by the integer quality signals
    * (quality_bucket desc, then repetition asc, stopword asc, doc_id as
    * the total-order tiebreak) and split into 3 equal tiers — tier 1 =
    * "head" (cleanest third), 3 = "tail". Ranking RELATIVE to the
    * language matters because absolute thresholds tuned on one language
    * over- or under-filter every other. Signals are all integers, so the
    * tier assignment is oracle-exact. Output:
    * (doc_id, lang, quality_bucket, tier).
    *
    * Shape: quality signals are map-side column adds (no join — the
    * signals compute alongside the doc's own `lang`); the only shuffle is
    * the per-language ntile window. A per-language sort is the honest
    * cost of exact tiles; at 100 TB the drop-in approximation is
    * per-language `approx_percentile` cut points + a map-side bucket
    * compare (no sort), trading exactness at the tier boundaries. */
  def qualityTiers(docs: DataFrame, tiers: Int = 3): DataFrame = {
    require(tiers >= 2, "need at least 2 tiers")
    val w = Window.partitionBy("lang").orderBy(
      col("quality_bucket").desc, col("repetition_pct"),
      col("stopword_pct"), col("doc_id"))
    TextAnalysis.withQuality(docs)
      .withColumn("tier", ntile(tiers).over(w))
      .select("doc_id", "lang", "quality_bucket", "tier")
  }

  /** Deterministic STRATIFIED sampler: exactly `n` documents allocated
    * over the (source, lang) strata proportionally to stratum size, with
    * LARGEST-REMAINDER rounding (quota = floor(n·size/total), the
    * n − Σfloor leftover seats go to the biggest remainders — the
    * standard apportionment that makes the quotas sum exactly to n).
    * Within a stratum, selection order is the md5 of the doc_id — a
    * deterministic pseudo-random shuffle both engines reproduce, so the
    * sample is stable across runs and cluster layouts.
    *
    * Scale shape: the strata table is DIMENSION-sized (sources ×
    * languages), so its single-partition remainder-ranking window is
    * bounded by construction and the quota table broadcasts. Documents in
    * strata at or below `hotStratumThreshold` pay one per-STRATUM ranking
    * window (skew bound = the threshold); strata ABOVE it — the
    * 90%-one-source corpus where a single window partition would absorb
    * the whole shuffle — route through the bounded bottom-k aggregator
    * instead ([[graft.scale.BottomKStrAggregator]]): O(n) state per
    * stratum with map-side combine, so the hot stratum's candidates
    * never sort and never serialize through one partition. The two paths
    * are result-identical (spec-pinned on a 90%-one-stratum fixture) —
    * both rank by the FULL md5 hex, never a truncated-double prefix.
    * Requires n <= corpus size for the exact-n guarantee (short strata
    * otherwise surrender seats).
    * Output: the picked rows (doc_id, source, lang, pick_rank). */
  def stratifiedSample(docs: DataFrame, n: Long,
      hotStratumThreshold: Long = 1L << 20): DataFrame = {
    require(n >= 1, "sample size must be positive")
    require(n <= Int.MaxValue, "sample size must fit the bounded aggregator")
    val strata = docs.groupBy("source", "lang").agg(count(lit(1)).as("sn"))
    val tot = strata.agg(sum("sn").as("t"))
    val base = strata.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("sn"),
        expr(s"($n * sn) div t").as("q0"),
        expr(s"($n * sn) % t").as("rem"))
    val remW = Window.orderBy(col("rem").desc, col("source"), col("lang"))
    val quotas = base.crossJoin(broadcast(base.agg(sum("q0").as("qs"))))
      .withColumn("rk", row_number().over(remW))
      .withColumn("quota",
        col("q0") + when(col("rk") <= lit(n) - col("qs"), 1L).otherwise(0L))
      // sid: a dense stratum id for the aggregator's long key (the window
      // is over the DIMENSION-sized quota table, bounded by construction)
      .withColumn("sid", row_number().over(
        Window.orderBy(col("source"), col("lang"))).cast("long"))
      .select("source", "lang", "sn", "quota", "sid")
    val tagged = docs.select(col("doc_id"), col("source"), col("lang"))
      .join(broadcast(quotas), Seq("source", "lang"))
    val pickW = Window.partitionBy("source", "lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val cold = tagged.filter(col("sn") <= hotStratumThreshold)
      .withColumn("pick_rank", row_number().over(pickW).cast("long"))
      .filter(col("pick_rank") <= col("quota"))
      .select("doc_id", "source", "lang", "pick_rank")
    // quota <= n always, so n bounds the aggregator; buffers only grow to
    // min(stratum size, n) — the hot stratum keeps O(n), not O(stratum)
    val hot = graft.scale.TopK.bottomKStrPerKey(
        tagged.filter(col("sn") > hotStratumThreshold)
          .select(col("sid"), col("doc_id"),
            md5(col("doc_id").cast("string")).as("mk")),
        "sid", "doc_id", "mk", n.toInt)
      .join(broadcast(quotas), "sid")
      .filter(col("rank") <= col("quota"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("rank").cast("long").as("pick_rank"))
    cold.unionByName(hot)
  }

  /** Hive-partitioned corpus layout: write the documents table
    * partitioned by (lang, source) with `filesPerPartition` files each —
    * the 100 TB on-disk layout where a language- or source-scoped
    * consumer reads ONLY its directories (partition pruning: the filter
    * becomes a PartitionFilters entry on the scan and unmatched
    * directories are never listed into tasks, spec-pinned on read-back).
    * The in-partition repartition keys on doc_id so file sizes balance
    * within a partition regardless of upstream layout; (lang, source)
    * cardinality is dimension-bounded, so the directory fan-out is too.
    * Dynamic partition overwrite semantics would apply on refresh (only
    * touched directories rewrite) — local default static mode is fine
    * for the full write here. */
  /** Pareto-frontier document selection — the skyline of
    * (n_tokens maximize, distinct-token ratio maximize): documents no
    * other document beats on both axes, the "longest AND least
    * repetitive exemplars" curation cut. Axes are integer-exact per-row
    * projections (no shuffle to compute them): n_tokens and
    * uniq_e6 = 1e6·n_distinct div n_tokens.
    *
    * Distributed shape — never the O(n²) dominance join: documents
    * bucket by n_tokens div `bucketWidth`; per-bucket max-y is a tiny
    * combinable aggregate, and the running max over STRICTLY-HIGHER
    * buckets (every point there has strictly greater x) broadcasts back
    * as a per-bucket dominance threshold: y <= threshold is provably
    * dominated and dies map-side. Survivors — at most the per-bucket
    * y-max staircase plus its local ties — collapse per distinct x to
    * max-y (same-x lower-y rows are dominated by the strict-y rule),
    * then one window over DISTINCT x values (x desc; tiny,
    * single-partition by construction and bounded by the survivor
    * staircase, the revenueDeciles trade) applies the exact strict
    * y > cummax test. Frontier docs re-emerge by joining the broadcast
    * frontier pairs back to the SURVIVOR rows (frontier points always
    * survive the pre-filter), keeping (x, y) twins — mutually
    * non-dominating — both on the frontier, exactly as the NOT EXISTS
    * oracle defines it. The xy projection is deliberately NOT
    * materialized: its consumers re-read documents as column-pruned
    * map-side scans (audited: three pruned scans), the same documented
    * trade as the waiting-suppliers double scan — checkpointing a
    * fact-sized projection would cost more than the re-scans at any SF.
    * Output: (doc_id, n_tokens, uniq_e6). */
  def paretoDocs(docs: DataFrame, bucketWidth: Long = 16L): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth >= 1")
    val xy = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_distinct"))
      .select(col("doc_id"), col("n_tokens"),
        expr("n_distinct * 1000000 div n_tokens").as("uniq_e6"),
        expr(s"n_tokens div $bucketWidth").as("bucket"))
    val wb = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val thresholds = xy.groupBy("bucket").agg(max("uniq_e6").as("bmax"))
      .select(col("bucket"), max(col("bmax")).over(wb).as("hi"))
    val survivors = xy.join(broadcast(thresholds), "bucket")
      .filter(col("hi").isNull || col("uniq_e6") > col("hi"))
    val wx = Window.orderBy(col("n_tokens").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierPairs = survivors.groupBy("n_tokens")
      .agg(max("uniq_e6").as("uniq_e6"))
      .withColumn("cm", max(col("uniq_e6")).over(wx))
      .filter(col("cm").isNull || col("uniq_e6") > col("cm"))
      .select("n_tokens", "uniq_e6")
    survivors.join(broadcast(frontierPairs), Seq("n_tokens", "uniq_e6"))
      .select("doc_id", "n_tokens", "uniq_e6")
  }

  def writePartitionedCorpus(docs: DataFrame, path: String,
      filesPerPartition: Int = 1): Unit =
    docs.repartition(filesPerPartition, col("lang"), col("source"), col("doc_id"))
      .write.mode("overwrite")
      .partitionBy("lang", "source")
      .parquet(path)
}
