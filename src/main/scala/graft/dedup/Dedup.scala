package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * approximate:
  *
  *   - exact: content-hash grouping (one shuffle on a 128-bit hash)
  *   - exact n-gram Jaccard: inverted shingle index self-join — the
  *     brute-force-correct baseline the approximate methods are verified
  *     against
  *   - MinHash + LSH banding: the 100 TB scale path — candidate generation
  *     touches only colliding band buckets, then candidates are verified
  *     with the exact Jaccard, so precision is 1.0 and recall is governed by
  *     (bands × rows) = (16 × 2)
  *   - SimHash: 64-bit near-dup signatures via a native Catalyst expression
  *     (graft.functions.SimHash64), banded for Hamming-distance search
  */
object Dedup {

  /** Exact duplicate marking: (doc_id, content_hash, keep) where keep is
    * true for the smallest doc_id of each identical-content group. */
  def exactDups(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("content_hash")
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
  }

  /** Per-source duplication report — the corpus-intake dashboard row:
    * how much of each source is exact-duplicate mass. One md5 projection
    * (32-byte keys shuffle, never text) and one aggregate; the single
    * `count_distinct` is the only Expand. Duplicates counted per source
    * independently (a doc repeated across sources counts in both — the
    * cross-source view is [[crossSourceOverlap]]'s job).
    * Output: (source, n_docs, n_unique, n_dups). */
  def sourceDupReport(docs: DataFrame): DataFrame =
    docs.select(col("source"), md5(col("text")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), count_distinct(col("h")).as("n_unique"))
      .withColumn("n_dups", col("n_docs") - col("n_unique"))

  /** Shingles shared by more documents than this are dropped before any
    * inverted-index self-join (the standard stop-shingle cap): a single
    * boilerplate shingle with document frequency f contributes f^2 rows to
    * the join, so one hot shingle can dominate the whole job on a skewed
    * corpus. The cap bounds per-shingle cost at maxDf^2 and changes results
    * only for pathological shingles (none exist in the driver fixture:
    * max df is 25 at sf0.1). */
  val DefaultMaxShingleDf = 100

  /** Distinct 3-token shingles per document: (doc_id, sh), optionally
    * stop-shingle-capped. The hot set is small in practice (heavy hitters
    * above the cap, at most total-occurrences/maxDf) but not bounded by a
    * constant, so the anti-join carries no broadcast hint — AQE broadcasts
    * it at runtime whenever it fits. */
  private def shingleIndex(docs: DataFrame, maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.shingles(col("text")))).as("sh"))
    if (maxDf == Int.MaxValue) sh
    else {
      val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("sh")
      sh.join(hot, Seq("sh"), "left_anti")
    }
  }

  /** Cross-document n-gram window duplication profile — the bounded
    * relational core of exact-substring dedup (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better": overlapping token
    * windows instead of suffix arrays): for every document, how many of
    * its n-token windows also occur in ANOTHER document. Pipelines drop
    * or trim documents whose dup-window share is high.
    *
    * Shape: windows materialize MAP-SIDE (sequence + transform + slice,
    * all codegen'd array functions — no UDF, no explode-then-window), and
    * each window immediately collapses to a 64-bit xxhash so the shuffle
    * moves 8-byte keys, never n-token strings. One hash-agg computes
    * per-window distinct-doc counts; windows seen in >1 document join
    * back (AQE broadcasts the shared set when small) and a per-doc count
    * finishes. Self-repeats within one document do NOT count as shared.
    * Output: (doc_id, n_windows, n_dup_windows), every input doc present
    * (0/0 when shorter than n tokens). */
  /** 64-bit xxhash of every n-token window of `text` (empty below n
    * tokens) — the map-side window collapse shared by the dup-window
    * profile and the cross-source matrix: windows never leave the task as
    * strings, only as 8-byte hashes. bindArray: the token array
    * materializes ONCE per document — a captured split() inside the
    * per-window lambda would re-tokenize on every window (O(tokens^2) per
    * doc; 50x at the sf1 soak). */
  /** n-token window keys. Default: 64-bit xxhash64 — 8-byte shuffle rows,
    * the right analysis-grade key. `strong = true` switches to 128-bit
    * md5: at corpus scales past ~2^32 windows a 64-bit birthday collision
    * is statistically expected, and a DESTRUCTIVE consumer
    * ([[cleanDupSpans]]) must not delete real text over one — collision
    * safety is worth the 16-byte keys there. Key choice never changes
    * results absent a collision, so both paths share every oracle. */
  private[graft] def windowHashes(text: org.apache.spark.sql.Column, n: Int,
      strong: Boolean = false) =
    TextAnalysis.bindArray(TextAnalysis.tokens(text)) { t =>
      when(size(t) >= n,
        transform(sequence(lit(1), size(t) - n + 1), { i =>
          val s = concat_ws(" ", slice(t, i, lit(n)))
          if (strong) md5(s) else xxhash64(s)
        }))
        .otherwise(array().cast(if (strong) "array<string>" else "array<bigint>"))
    }

  def ngramWindowDups(docs: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 2, "window length must be at least 2")
    // three consumers (per-doc totals, df counts, the dup join): persist
    val w = docs.select(col("doc_id"),
      explode(windowHashes(col("text"), n)).as("h")).persist()
    w.count()
    try {
      val perDoc = w.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
      val shared = w.groupBy("h").agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") > 1).select("h")
      val dup = w.join(shared, Seq("h"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup_windows"))
      val out = docs.select("doc_id")
        .join(perDoc, Seq("doc_id"), "left")
        .join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_windows"), lit(0L)).as("n_windows"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      graft.core.CacheOps.cacheResult(out, Seq(w))
    } catch { case e: Throwable => w.unpersist(); throw e }
  }

  /** Exact shingle-Jaccard near-duplicate pairs with similarity >=
    * minJaccardPct percent. Inverted-index self-join: only documents
    * sharing at least one shingle are ever paired, so cost is
    * sum(df(shingle)^2), not n^2. Output:
    * (doc_id_a, doc_id_b, inter, n_a, n_b, jaccard_pct), a < b. */
  def jaccardPairs(docs: DataFrame, minJaccardPct: Int,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    // the shingle index feeds three consumers (sizes + both join sides);
    // materialize eagerly so all of them read the cache
    val sh = shingleIndex(docs, maxShingleDf).persist()
    sh.count()
    val inter = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"))
      .agg(count(lit(1)).as("inter"))
    // materialize the compact pair result, release the exploded index cache
    // (CacheOps contract: the one cached handle left is the returned frame)
    graft.core.CacheOps.cacheResult(
      finishJaccard(sh, inter, minJaccardPct), Seq(sh))
  }

  /** Directed CONTAINMENT pairs: |A ∩ B| / |A| >= minContainPct percent —
    * the asymmetric complement of [[jaccardPairs]]. Jaccard misses
    * sub-document copies (a tweet quoted inside a long article scores
    * near-zero Jaccard but containment 1.0), which is why containment is
    * the dedup signal for quote/inclusion detection. Output one DIRECTED
    * row per qualifying (contained, container) ordering:
    * (doc_id, in_doc_id, inter, n, containment_pct) where n = |doc_id's
    * shingle set| — a doc pair can qualify in one direction or both.
    *
    * Same inverted-index shape and cost as jaccardPairs (the undirected
    * intersection computes ONCE with the a<b filter; both directions then
    * derive by a constant-cost union), same stop-shingle df cap bounding
    * the self-join at Σdf². */
  def containmentPairs(docs: DataFrame, minContainPct: Int,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    val sh = shingleIndex(docs, maxShingleDf).persist()
    sh.count()
    try {
      val inter = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"))
        .agg(count(lit(1)).as("inter"))
      // both directions explode from the ONE aggregated pair relation (a
      // union of two projections would re-run the self-join + aggregation
      // once per branch — measured in the plan audit)
      val directed = inter.select(explode(array(
          struct(col("doc_id_a").as("doc_id"),
            col("doc_id_b").as("in_doc_id"), col("inter")),
          struct(col("doc_id_b").as("doc_id"),
            col("doc_id_a").as("in_doc_id"), col("inter")))).as("d"))
        .select(col("d.doc_id"), col("d.in_doc_id"), col("d.inter"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val out = directed.join(sizes, "doc_id")
        .withColumn("containment_pct", floor(lit(100) * col("inter") / col("n")))
        .filter(col("containment_pct") >= minContainPct)
        .select("doc_id", "in_doc_id", "inter", "n", "containment_pct")
      graft.core.CacheOps.cacheResult(out, Seq(sh))
    } catch { case e: Throwable => sh.unpersist(); throw e }
  }

  /** Per-doc distinct shingle SETS as sorted arrays: (doc_id, shs). One row
    * per document, so downstream consumers (signatures, verification) never
    * shuffle the exploded index — only this |docs|-row relation. */
  private def shingleSets(docs: DataFrame, maxDf: Int): DataFrame =
    shingleIndex(docs, maxDf)
      .groupBy("doc_id").agg(sort_array(collect_list(col("sh"))).as("shs"))

  /** Attach set sizes + Jaccard to intersection counts and threshold.
    * `sizes` is a per-DOCUMENT relation, so it gets NO broadcast hint: at
    * billions of docs a forced broadcast would OOM the driver, while AQE
    * broadcasts it at runtime whenever it actually fits. */
  private def finishJaccard(sh: DataFrame, inter: DataFrame, minJaccardPct: Int): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("n", "n_a"), "doc_id_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("n", "n_b"), "doc_id_b")
      .withColumn("jaccard_pct",
        floor(lit(100) * col("inter") / (col("n_a") + col("n_b") - col("inter"))))
      .filter(col("jaccard_pct") >= minJaccardPct)
      .select("doc_id_a", "doc_id_b", "inter", "n_a", "n_b", "jaccard_pct")
  }

  val NumPerms = 32 // MinHash permutations; banded as 16 bands x 2 rows

  /** MinHash signatures over a (doc_id, sh) shingle relation. Permutation i
    * is min over shingles of xxhash64(i, shingle) — one aggregation, 32
    * parallel min() columns, no per-row state. */
  private def minhashSignaturesFrom(sh: DataFrame): DataFrame = {
    val mins = (0 until NumPerms).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"m$i"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until NumPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash signatures: (doc_id, sig ARRAY<LONG>[NumPerms]). */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesFrom(shingleIndex(docs))

  /** LSH band buckets of a (doc_id, shs) shingle-set relation: minhash
    * signature (map-side array_min per permutation) folded into one
    * 64-bit bucket key per band — (doc_id, band, bucket), 16 rows per
    * document. The single banding used by every LSH consumer. */
  private def bandedBuckets(sets: DataFrame): DataFrame = {
    val rows = 2
    val bands = NumPerms / rows
    sets.select(col("doc_id"), array((0 until NumPerms).map(i =>
        array_min(transform(col("shs"), x => xxhash64(lit(i), x)))): _*).as("sig"))
      .select(col("doc_id"), posexplode(
        array((0 until bands).map(b =>
          xxhash64((b * rows until (b + 1) * rows).map(i => element_at(col("sig"), i + 1)): _*)): _*))
        .as(Seq("band", "bucket")))
  }

  /** MinHash-LSH verified near-dup pairs: band-bucket join for candidates
    * (16 bands of 2 rows), then exact Jaccard verification of the candidate
    * pairs only. Same output shape as [[jaccardPairs]]; precision 1.0,
    * recall 1-(1-j^2)^16 (>= 0.999 at j=0.6).
    *
    * Plan discipline (rounds 1-3 kept regressing here): everything flows
    * from ONE per-doc shingle-SET relation (|docs| rows, arrays) — the
    * signatures are a map-side array_min over it, and verification is two
    * joins of the tiny candidate list against it with a codegen'd
    * array_intersect, so the exploded (doc_id, shingle) index is never
    * shuffled at all. The old shape verified candidates by routing the full
    * exploded index through two shuffle joins, which collapsed whenever AQE
    * declined the broadcasts on a loaded box. */
  def minhashLshPairs(docs: DataFrame, minJaccardPct: Int,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    val sets = shingleSets(docs, maxShingleDf).persist()
    sets.count()
    val banded = bandedBuckets(sets).persist()
    banded.count() // self-join: both sides must read the cache
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"))
      .distinct()
    // verify ONLY the candidate pairs, against the per-doc shingle arrays
    val out = candidates
      .join(sets.select(col("doc_id").as("doc_id_a"), col("shs").as("shs_a")), "doc_id_a")
      .join(sets.select(col("doc_id").as("doc_id_b"), col("shs").as("shs_b")), "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"),
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long").as("inter"),
        size(col("shs_a")).cast("long").as("n_a"),
        size(col("shs_b")).cast("long").as("n_b"))
      .withColumn("jaccard_pct",
        floor(lit(100) * col("inter") / (col("n_a") + col("n_b") - col("inter"))))
      .filter(col("jaccard_pct") >= minJaccardPct)
    // materialize the compact verified-pair result, THEN release sets and
    // banded (round-5 left them cached forever: the caller has no handle
    // to them, so repeated calls leaked blocks for the session lifetime;
    // an unpersist BEFORE materialization — the round-4 bug — would
    // instead recompute the banding for both self-join sides)
    graft.core.CacheOps.cacheResult(out, Seq(sets, banded))
  }

  /** Incremental delta-vs-corpus dedup probe — the DAILY-BATCH shape of
    * near-dup detection at 100 TB: the standing corpus is never
    * self-joined again; the new batch's band buckets PROBE the corpus's
    * banded index by an equi-join on (band, bucket), candidates verify
    * exactly against the per-doc shingle arrays, and each delta document
    * reports its best corpus match (highest Jaccard, ties to the lowest
    * corpus doc_id — a deterministic max_by struct, no ranking window).
    * In production the corpus-side banded index and shingle sets are
    * precomputed and persist across batches (they are pure functions of
    * the corpus — exactly what this derives); only the delta's banding is
    * new work per batch, so batch cost tracks the DELTA, not the corpus.
    * The stop-shingle df cap is computed over the full collection
    * (corpus + delta), matching how a maintained stop-shingle list reads
    * at probe time. Same banding completeness as [[minhashLshPairs]]
    * (recall 1-(1-j²)^16 per pair). Output: one row per MATCHED delta
    * doc — (doc_id, dup_of, jaccard_pct); unmatched deltas are the
    * novel documents and don't appear. */
  def incrementalDedup(docs: DataFrame, isDelta: Column, minJaccardPct: Int,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    val sets = shingleSets(docs, maxShingleDf)
      .join(docs.select(col("doc_id"), isDelta.as("_delta")), "doc_id")
      .persist()
    sets.count()
    val corpusBanded = bandedBuckets(sets.filter(!col("_delta"))).persist()
    corpusBanded.count()
    val candidates = bandedBuckets(sets.filter(col("_delta"))).as("d")
      .join(corpusBanded.as("c"), Seq("band", "bucket"))
      .select(col("d.doc_id").as("delta_id"), col("c.doc_id").as("corpus_id"))
      .distinct()
    val verified = candidates
      .join(sets.select(col("doc_id").as("delta_id"), col("shs").as("shs_d")), "delta_id")
      .join(sets.select(col("doc_id").as("corpus_id"), col("shs").as("shs_c")), "corpus_id")
      .select(col("delta_id"), col("corpus_id"),
        size(array_intersect(col("shs_d"), col("shs_c"))).cast("long").as("inter"),
        size(col("shs_d")).cast("long").as("n_d"),
        size(col("shs_c")).cast("long").as("n_c"))
      .withColumn("jaccard_pct",
        floor(lit(100) * col("inter") / (col("n_d") + col("n_c") - col("inter"))))
      .filter(col("jaccard_pct") >= minJaccardPct)
    val best = verified.groupBy("delta_id")
      .agg(max_by(struct(col("corpus_id"), col("jaccard_pct")),
        struct(col("jaccard_pct"), -col("corpus_id"))).as("b"))
      .select(col("delta_id").as("doc_id"), col("b.corpus_id").as("dup_of"),
        col("b.jaccard_pct").as("jaccard_pct"))
    graft.core.CacheOps.cacheResult(best, Seq(sets, corpusBanded))
  }

  /** Duplicate clusters: the canonical-document decision table a dedup
    * pipeline derives from near-dup pairs. Connected components over the
    * pair graph by iterative min-label propagation: every document gets
    * `cluster_id` = the smallest doc_id reachable through near-dup pairs
    * (itself when unpaired) and `keep` = (doc_id == cluster_id), i.e. one
    * canonical survivor per cluster.
    *
    * Scale shape: each iteration is one shuffle join + one map-side-
    * combinable min aggregation over the EDGE relation (already pruned to
    * near-dup pairs — tiny relative to the corpus); iterations =
    * cluster diameter, which for near-dup graphs is small (dup clusters are
    * near-cliques: a chain requires a run of pairwise-similar-but-
    * transitively-distinct docs). The driver loop only ever moves a single
    * changed-label COUNT, never data. Output: (doc_id, cluster_id, keep). */
  def duplicateClusters(docs: DataFrame, minJaccardPct: Int,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    val pairRel = jaccardPairs(docs, minJaccardPct, maxShingleDf)
    val labels = connectedComponents(docs.select("doc_id"),
      pairRel.select(col("doc_id_a"), col("doc_id_b")),
      releaseAfterEdges = Seq(pairRel))
    labels.withColumn("keep", col("doc_id") === col("cluster_id"))
  }

  /** Min-label connected components over an undirected pair relation —
    * the shared clustering core behind text near-dup clusters and media
    * (perceptual-hash) clusters. `nodes` is a (doc_id) relation naming
    * every vertex (singletons keep themselves); `pairs` is (a, b) edges,
    * one direction. Returns (doc_id, cluster_id) with cluster_id = min
    * reachable id. `releaseAfterEdges` are cached inputs to unpersist
    * once the doubled edge relation has materialized. */
  private[graft] def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      releaseAfterEdges: Seq[org.apache.spark.sql.Dataset[_]] = Nil): DataFrame = {
    val p = pairs.toDF("doc_id_a", "doc_id_b")
    // both directions: label flows toward larger ids AND across to smaller
    val edges = p
      .unionAll(p.select(col("doc_id_b").as("doc_id_a"), col("doc_id_a").as("doc_id_b")))
      .persist()
    edges.count()
    releaseAfterEdges.foreach(_.unpersist())
    // localCheckpoint (eager), NOT persist: each iteration's plan must build
    // on the MATERIALIZED previous labels, not its unrolled lineage —
    // with plain persist the logical plan grows by one join+agg per
    // iteration (persist caches data but never truncates lineage), so
    // planning cost and plan size are O(iterations^2) and every consumer
    // of the final labels re-plans the whole loop history.
    var labels = nodes.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val prev = labels
      val next = edges
        .join(prev, edges("doc_id_b") === prev("doc_id"))
        .select(col("doc_id_a").as("doc_id"), col("cluster_id"))
        .unionAll(prev)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint()
      changed = next.join(prev.withColumnRenamed("cluster_id", "old"), "doc_id")
        .filter(col("cluster_id") =!= col("old")).count()
      graft.scale.Checkpoints.drop(prev)
      labels = next
    }
    edges.unpersist()
    labels
  }

  /** Canonical-document election per duplicate cluster — the step after
    * clustering in a curation pipeline: each cluster keeps ONE
    * representative (here: the longest document, ties to the smallest
    * doc_id — a deterministic total order, so the election is
    * oracle-exact). Singleton clusters elect themselves.
    *
    * Shape: [[duplicateClusters]] labels + one equi-join back to the
    * (doc_id, n_chars) projection + ONE hash aggregate per cluster whose
    * argmax rides a struct-max (max over (n_chars, -doc_id) orders
    * lexicographically — no ranking window, so partial aggregation
    * combines map-side and no cluster's member list ever materializes).
    * Output: (cluster_id, canonical_id, n_members, max_chars). */
  def canonicalDocs(docs: DataFrame, minJaccardPct: Int,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame =
    electCanonical(
      duplicateClusters(docs, minJaccardPct, maxShingleDf)
        .select("doc_id", "cluster_id"),
      docs)

  /** The election step alone, over precomputed (doc_id, cluster_id)
    * labels — lets callers that already ran the cluster fixpoint (e.g.
    * the curation pipeline) elect without a second one. Uses `n_chars`
    * when the relation carries it, document length otherwise. */
  def electCanonical(labels: DataFrame, docs: DataFrame): DataFrame = {
    val chars =
      if (docs.columns.contains("n_chars"))
        docs.select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      else docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    labels.join(chars, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(max(struct(col("n_chars").as("c"), (-col("doc_id")).as("negid"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), (-col("best.negid")).as("canonical_id"),
        col("n_members"), col("best.c").as("max_chars"))
  }

  /** 64-bit SimHash signatures via the native Catalyst expression
    * (graft.functions.SimHash64): (doc_id, simhash). */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    docs.select(col("doc_id"),
      ColumnBridge.column(graft.functions.SimHash64(
        ColumnBridge.expression(TextAnalysis.tokens(col("text"))))).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming. Banding:
    * two 64-bit words at distance <= 3 agree exactly on at least one of 4
    * 16-bit bands, so the self-join only probes band-equal buckets. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding is complete only for Hamming distance <= 3 (pigeonhole); " +
        s"maxHamming=$maxHamming would silently miss pairs — add bands instead")
    val sigs = simhashSignatures(docs)
    val banded = sigs.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("band", "bucket")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Paragraph-level (chunk-level) exact dedup with reassembly — the
    * CCNet/RefinedWeb trick of removing repeated boilerplate *within*
    * otherwise-unique documents: each document splits into non-overlapping
    * `span`-token chunks, every chunk occurring anywhere earlier in the
    * corpus (first occurrence = smallest (doc_id, idx)) is dropped, and the
    * survivors re-join in order. Output:
    * (doc_id, n_chunks, n_kept, cleaned_text), every input doc present.
    *
    * Shape: chunks materialize map-side (sequence + slice over a bound
    * token array — no UDF); the election is a min-struct AGGREGATION on the
    * chunk's md5 (map-side combine collapses repeats before the shuffle),
    * NOT a ranking window — a window cannot split a hot key, so one
    * boilerplate chunk shared by 10% of a 100 TB corpus would serialize on
    * a single task, while the agg + equi-join shape both combines map-side
    * and lets AQE split the skewed join. md5 (128-bit) keys the election
    * because a 64-bit hash collision would silently merge two distinct
    * chunks (birthday-real at corpus scale). */
  def paragraphDedup(docs: DataFrame, span: Int = 20): DataFrame = {
    require(span >= 1, "chunk span must be positive")
    val chunks = TextAnalysis.bindArray(TextAnalysis.tokens(col("text"))) { t =>
      transform(
        sequence(lit(0L), ceil(size(t) / lit(span.toDouble)).cast("long") - 1L),
        i => concat_ws(" ", slice(t, (i * span + 1).cast("int"), lit(span))))
    }
    val ck = docs.select(col("doc_id"), posexplode(chunks).as(Seq("idx", "chunk")))
      .withColumn("chash", md5(col("chunk")))
    val winners = ck.groupBy("chash")
      .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
      .select(col("chash"), col("w.doc_id").as("w_doc"), col("w.idx").as("w_idx"))
    ck.join(winners, Seq("chash"))
      .withColumn("keep",
        col("doc_id") === col("w_doc") && col("idx") === col("w_idx"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("idx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("cleaned_text"))
  }

  /** Duplicated-substring SPANS — the span-level view of exact substring
    * duplication (the signal behind suffix-array dedup of training
    * corpora: arXiv:2107.06499 computes the same maximal repeated regions
    * with a single-node suffix array; here the distributed equivalent is
    * n-token windows + interval union). A window (n consecutive tokens,
    * stride 1) is DUPLICATED when its text occurs in more than one
    * document; per document, overlapping or adjacent duplicated windows
    * are merged into maximal spans by a gaps-and-islands interval union.
    * Output: (doc_id, span_start, span_end, span_tokens) — 1-based
    * inclusive token indices, one row per maximal duplicated span,
    * span_tokens = span_end - span_start + 1. Callers cleaning a corpus
    * drop the spans' token ranges from the text ([[cleanDupSpans]]);
    * `keepFirst` marks a window only OUTSIDE its owner (min doc_id), so
    * a removal pass keeps exactly one occurrence corpus-wide.
    *
    * Shape for 100 TB: windows collapse to 64-bit hashes map-side (8-byte
    * shuffle rows — swap in md5 keys for cleaning-grade runs where a
    * birthday collision must not delete real text); one shuffle keyed by
    * window hash for the cross-document df, one join back, then the
    * interval union runs in a PER-DOCUMENT window (partition cardinality
    * bounded by document length, never by corpus size). The running-max
    * island detection is the standard relational interval-union: a window
    * opens a new island iff its start exceeds the max end seen so far
    * (+1: adjacent ranges are one contiguous duplicated region). */
  def dupSpans(docs: DataFrame, n: Int = 8,
      keepFirst: Boolean = false, strongHash: Boolean = false): DataFrame = {
    require(n >= 2, "window length must be at least 2")
    val w = docs.select(col("doc_id"),
        posexplode(windowHashes(col("text"), n, strongHash)).as(Seq("pos", "h")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"), col("h"))
      .persist()
    w.count()
    try {
      // keepFirst: the window's OWNER (min doc_id carrying it) keeps its
      // copy — its positions are never marked, so exactly one occurrence
      // of every duplicated region survives a span-removal pass
      val grouped = w.groupBy("h").agg(countDistinct("doc_id").as("nd"),
        min("doc_id").as("owner"))
      val shared = grouped.filter(col("nd") > 1).select("h", "owner")
      val dup = w.join(shared, Seq("h"))
        .filter(if (keepFirst) col("doc_id") =!= col("owner") else lit(true))
        .select("doc_id", "i")
      val byDoc = Window.partitionBy("doc_id").orderBy("i")
      val prevEnd = max(col("i") + (n - 1)).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1))
      val out = dup
        .withColumn("new_island",
          when(col("i") > coalesce(prevEnd, lit(Long.MinValue)) + 1L, 1L)
            .otherwise(0L))
        .withColumn("island", sum("new_island").over(
          byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("doc_id", "island")
        .agg(min("i").as("span_start"), (max("i") + (n - 1)).as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1L).as("span_tokens"))
      graft.core.CacheOps.cacheResult(out, Seq(w))
    } catch { case e: Throwable => w.unpersist(); throw e }
  }

  /** Per-document NOVELTY — the data-valuation signal behind "does this
    * document add anything": for every n-token window occurrence, the
    * corpus-wide OWNER of its text is the min doc_id carrying it; a
    * window is novel to the document that owns it. Documents that only
    * restate earlier content score n_novel = 0 and are the first
    * candidates to drop under a budget. Same shapes as [[dupSpans]]: one
    * shuffle keyed by window hash for the ownership table, one join
    * back, one per-doc aggregate. Output: (doc_id, n_windows, n_novel). */
  def windowNovelty(docs: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 2, "window length must be at least 2")
    val w = docs.select(col("doc_id"),
      explode(windowHashes(col("text"), n)).as("h"))
    val owners = w.groupBy("h").agg(min("doc_id").as("owner"))
    val counts = w.join(owners, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("doc_id") === col("owner"), 1L).otherwise(0L)).as("n_novel"))
    docs.select("doc_id").join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }

  /** Span-removal corpus cleaner — the end-to-end product of exact
    * substring dedup: compute keep-first duplicated spans
    * ([[dupSpans]] with `keepFirst`: each duplicated window's min-doc_id
    * OWNER keeps its copy) and drop the marked token ranges from every
    * other document, so exactly ONE occurrence of each duplicated region
    * survives corpus-wide. Per document the rewrite is MAP-SIDE: the
    * span list (a handful of intervals) attaches in a 1:1 join, then a
    * single codegen'd filter-by-interval + rejoin over the let-bound
    * token array — the document text never shuffles for the rewrite.
    * `strongHash` keys windows by md5 instead of xxhash64 — REQUIRED for
    * cleaning-grade runs at >>2^32 windows, where a 64-bit birthday
    * collision would silently delete non-duplicated text (the analysis
    * default stays 64-bit for 8-byte shuffle rows; a spec pins the two
    * paths result-identical below collision scale).
    * Output: (doc_id, n_tokens, n_kept, cleaned_text). */
  def cleanDupSpans(docs: DataFrame, n: Int = 8,
      strongHash: Boolean = false): DataFrame = {
    val spans = dupSpans(docs, n, keepFirst = true, strongHash = strongHash)
    val byDoc = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("sps"))
    val emptySpans = array().cast("array<struct<span_start:bigint,span_end:bigint>>")
    val out = docs.select("doc_id", "text").join(byDoc, Seq("doc_id"), "left")
      .withColumn("sps", coalesce(col("sps"), emptySpans))
      .select(col("doc_id"), col("sps"),
        TextAnalysis.bindArray(TextAnalysis.tokens(col("text"))) { t =>
          struct(size(t).cast("long").as("n_tokens"), t.as("toks"))
        }.as("b"))
      .select(col("doc_id"), col("b.n_tokens").as("n_tokens"),
        // spans carry 1-based token indices; filter's index is 0-based
        filter(col("b.toks"), (_, i) => !exists(col("sps"),
          s => (i + 1).cast("long").between(
            s.getField("span_start"), s.getField("span_end")))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("cleaned_text"))
    graft.core.CacheOps.cacheResult(out, Seq(spans))
  }

  /** Source VOCABULARY overlap — the corpus-comparison matrix at token
    * granularity (the window matrix [[crossSourceOverlap]] catches
    * near-copies; the vocabulary matrix catches topical/stylistic
    * kinship): per unordered source pair, the distinct-token
    * intersection plus both vocabulary sizes and the integer Jaccard.
    * Same no-doc-pair shape as the window matrix: one distinct over
    * (source, token), per-token source LISTS pair off inside the array.
    * Output: (source_a, source_b, n_shared, n_a, n_b, jaccard_pct). */
  def vocabOverlap(docs: DataFrame): DataFrame = {
    val perSource = docs
      .select(col("source"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
      .distinct()
    val sizes = perSource.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = perSource.groupBy("tok")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .select(explode(TextAnalysis.bindArray(col("srcs")) { a =>
        flatten(transform(a, (x, i) =>
          transform(slice(a, i + 2, size(a)),
            y => struct(x.as("source_a"), y.as("source_b")))))
      }).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("n_a"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"), col("n_a"), col("n_b"),
        floor(lit(100) * col("n_shared") / (col("n_a") + col("n_b") - col("n_shared")))
          .as("jaccard_pct"))
  }

  /** Cross-source contamination matrix: for every unordered pair of
    * sources, how many DISTINCT n-token windows occur in both. The
    * per-pair count is the raw signal behind "source B is a scrape of
    * source A" audits — whole-text hashing misses near-copies, doc-pair
    * joins explode quadratically; shared-window counting is linear in
    * corpus size + sum-over-windows(#sources-sharing choose 2).
    *
    * Shape: windows collapse to 64-bit hashes map-side (8-byte shuffle
    * rows), one distinct on (source, h), then per-window source LISTS
    * (bounded by the source count, not the corpus) pair off inside the
    * array — no row-level self-join ever materializes doc pairs. Output:
    * (source_a, source_b, n_shared), source_a < source_b, pairs with zero
    * overlap omitted. */
  def crossSourceOverlap(docs: DataFrame, n: Int = 7): DataFrame = {
    require(n >= 2, "window length must be at least 2")
    val perSource = docs
      .select(col("source"),
        explode(array_distinct(windowHashes(col("text"), n))).as("h"))
      .distinct()
    val pairs = perSource.groupBy("h")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .select(explode(TextAnalysis.bindArray(col("srcs")) { a =>
        flatten(transform(a, (x, i) =>
          transform(slice(a, i + 2, size(a)),
            y => struct(x.as("source_a"), y.as("source_b")))))
      }).as("p"))
    pairs.groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Edit-distance-1 record linkage (FastSS-style neighborhood blocking):
    * all pairs of records whose `nameCol` values are exactly one edit
    * apart (substitution, insertion or deletion). The classic quadratic
    * trap is the all-pairs verify; neighborhood keys make blocking EXACT
    * instead of heuristic, and the key CLASSES are chosen so it is also
    * DUPLICATE-FREE — no post-join distinct:
    *
    *   - substitution pairs share exactly ONE position-wildcard key
    *     (char i replaced by a NUL sentinel — position-preserving,
    *     unlike plain deletions, which pair up same-length names that
    *     deleted DIFFERENT positions and are really distance 2: on the
    *     digit-dense customer names that cut candidates 3.7×, from 977k
    *     to the true 262k, measured at sf0.1);
    *   - insert/delete pairs meet as (deletion key of the longer) ==
    *     (the shorter name itself), admitted only for kind (del, self) —
    *     deletions are deduped per name, so again exactly one match;
    *   - the classes can't cross (wildcard keys carry the sentinel,
    *     del/self keys differ in length), so no pair arrives twice and
    *     the exact verify (`levenshtein == 1`, engine-built-in on both
    *     sides) runs inside the join as a residual condition.
    *
    * ~2L+1 short keys per DISTINCT name; Σ|bucket|² candidate cost, the
    * same class as the shingle index's Σdf². At 100 TB the working
    * relation is the name VOCABULARY, never the fact rows. Names must
    * not contain U+0000 (the sentinel) and must be NON-EMPTY: for "" the
    * descending sequence(1, 0) = [1, 0] would emit two identical wildcard
    * keys, breaking the duplicate-free invariant — empty names are
    * filtered, not linked (an empty name has no edit-distance-1 business
    * being a record key anyway).
    * Output: (a_id, a_name, b_id, b_name), a_id < b_id, distance == 1
    * (equal names are exact-dup territory, not linkage). */
  def editNeighborPairs(records: DataFrame, idCol: String,
      nameCol: String): DataFrame = {
    def nm = col("_nm")
    val wild = transform(sequence(lit(1), length(nm)), i =>
      struct(concat(nm.substr(lit(1), i - 1), lit("\u0000"),
        nm.substr(i + 1, length(nm))).as("k"), lit(0).as("kind")))
    val dels = transform(
      array_distinct(transform(sequence(lit(1), length(nm)), i =>
        concat(nm.substr(lit(1), i - 1), nm.substr(i + 1, length(nm))))),
      d => struct(d.as("k"), lit(1).as("kind")))
    val keyed = records
      .select(col(idCol).cast("long").as("_id"), col(nameCol).as("_nm"))
      .filter(length(nm) > 0)
      .select(col("_id"), nm, explode(concat(wild, dels,
        array(struct(nm.as("k"), lit(2).as("kind"))))).as("_kk"))
      .select(col("_id"), nm, col("_kk.k").as("_key"),
        col("_kk.kind").as("_kind"))
    // shuffle-hash, NOT the optimizer's broadcast pick: the keyed relation
    // is (2L+1)x the input and Spark's size estimate does not see through
    // the Generate — at the 150k-name soak AQE broadcast a 5.5M-row hashed
    // relation and ran 91 s / zero parallel shuffle; the hinted shuffled
    // hash join reads 11.6 s there and is cost-identical at 15k names
    // (2.6 s). Bucket-hash partitioning on _key is the plan you'd pick by
    // hand at any scale.
    keyed.as("a").hint("shuffle_hash")
      .join(keyed.as("b"),
        col("a._key") === col("b._key") && col("a._id") < col("b._id") &&
          ((col("a._kind") === 0 && col("b._kind") === 0) ||
            (col("a._kind") === 1 && col("b._kind") === 2) ||
            (col("a._kind") === 2 && col("b._kind") === 1)) &&
          levenshtein(col("a._nm"), col("b._nm")) === 1)
      .select(col("a._id").as(s"a_$idCol"), col("a._nm").as(s"a_$nameCol"),
        col("b._id").as(s"b_$idCol"), col("b._nm").as(s"b_$nameCol"))
  }
}
