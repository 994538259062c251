package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *     set against the full collection; the per-pair dot product is a
  *     codegen'd zip_with/aggregate, no UDF.
  *   - [[lshTopK]]: random-hyperplane LSH — deterministic signed projections
  *     bucket the collection; only same-bucket pairs are scored. At 100 TB
  *     this is the scale path: the bucket join replaces the cross product,
  *     and bucket skew is bounded because signatures are balanced bits.
  */
object Similarity {

  private def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two ARRAY<FLOAT> columns, computed in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Euclidean norm of an ARRAY<FLOAT> column, for per-row precompute:
    * scoring n×q pairs against cached norms does 1 dot per pair instead
    * of 3 — norms are computed once per ROW, not once per PAIR. Same float
    * ops as [[cosine]] (just hoisted), so scores stay bit-identical. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact top-k neighbours for each query vector (queries = rows matching
    * `queryPred`, e.g. vec_id % 100 == 0). Output:
    * (query_id, rank, neighbor_id), rank 1..k by descending cosine with
    * vec_id as the deterministic tiebreak. Self-pairs excluded. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    bruteForceScores(emb, queryPred).withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** All (query, candidate) cosine scores — shared by the window and
    * aggregator top-k formulations. */
  private def bruteForceScores(emb: DataFrame, queryPred: Column): DataFrame = {
    val en = emb.withColumn("nrm", norm(col("embedding")))
    val q = en.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    en.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("score"))
  }

  /** [[bruteForceTopK]] with the bounded typed Aggregator
    * (graft.scale.TopK) in place of the ranking window: identical output
    * (same score comparisons, same id tiebreak), but each aggregation
    * buffer holds k entries instead of sorting a query's full candidate
    * list — the scale formulation when candidates-per-query is huge.
    * Driver-checked against the SAME oracle as the window version. */
  def bruteForceTopKAgg(emb: DataFrame, queryPred: Column, k: Int): DataFrame =
    graft.scale.TopK.topKPerKey(
      bruteForceScores(emb, queryPred), "query_id", "vec_id", "score", k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))

  /** Cosine RANGE search — every (query, vector) pair with similarity at
    * or above `minCosine`, the radius-query complement of top-k (top-k
    * answers "the nearest k whatever their score"; range answers
    * "everything this similar", the retrieval primitive behind
    * match-or-nothing lookups and near-dup sweeps scoped to a query
    * set). Exact scoring over the broadcast query set — 1 dot per pair
    * against precomputed norms; at corpus scale the LSH/IVF candidate
    * generators bolt on exactly as for top-k, with the banded-recall
    * caveat [[cosineNearDupPairs]] documents. Output: (query_id, vec_id),
    * self-pairs excluded. */
  def rangeSearch(emb: DataFrame, queryPred: Column,
      minCosine: Double): DataFrame =
    bruteForceScores(emb, queryPred)
      .filter(col("score") >= minCosine)
      .select("query_id", "vec_id")

  /** k-NN majority-vote classification: each query row gets the modal
    * label of its k nearest neighbors (cosine; ties on vote count break
    * to the SMALLEST label — a deterministic total order, so the
    * prediction is oracle-exact). The neighbor search is the exact
    * bounded-aggregator top-k ([[bruteForceTopKAgg]]: O(k) buffers,
    * map-side combine); at corpus scale callers swap in the IVF/LSH
    * candidate generators — the voting tail is identical. The vote is
    * two hash aggregates (per-(query,label) counts, then a struct-max
    * argmax — no ranking window) plus keyed label-projection joins.
    * Output: (query_id, label, pred_label, n_votes, correct). */
  def knnClassify(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val labels = emb.select(col("vec_id"), col("label").cast("long"))
    val nb = bruteForceTopKAgg(emb, queryPred, k)
    val counted = nb
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nl")),
        Seq("neighbor_id"))
      .groupBy("query_id", "nl").agg(count(lit(1)).as("cnt"))
    val best = counted.groupBy("query_id")
      .agg(max(struct(col("cnt"), (-col("nl")).as("negl"))).as("b"))
      .select(col("query_id"), (-col("b.negl")).as("pred_label"),
        col("b.cnt").as("n_votes"))
    best
      .join(emb.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("label").cast("long").as("label")),
        Seq("query_id"))
      .select(col("query_id"), col("label"), col("pred_label"), col("n_votes"),
        (col("label") === col("pred_label")).as("correct"))
  }

  /** Default signature width — kept at 16 for the pinned oracles; at scale
    * callers should widen (64 planes / 16-bit bands gives 65k buckets per
    * band instead of 16, which is what keeps the candidate join sub-
    * quadratic as n grows). Signatures pack into ONE long, so <= 64. */
  val DefaultNumPlanes = 16
  val NumPlanes: Int = DefaultNumPlanes // back-compat alias for specs

  /** Query rows above which [[lshTopK]] stops forcing the query-side
    * broadcast and lets the bucket join shuffle instead: 100k queries x
    * ~KB-scale embedding rows x `bands` replication is the order where a
    * forced driver-built broadcast turns into an OOM. */
  val DefaultMaxBroadcastQueries = 100000L

  /** Deterministic pseudo-random hyperplanes (seeded, fixed across runs).
    * Prefix-stable: the first 16 of planes(d, 64) ARE planes(d, 16), so
    * widening the signature refines — it never reshuffles — bucketing. */
  private def planes(dims: Int, numPlanes: Int): Array[Array[Double]] = {
    require(numPlanes >= 1 && numPlanes <= 64, s"numPlanes must be 1..64, got $numPlanes")
    val rnd = new java.util.Random(42)
    Array.fill(numPlanes)(Array.fill(dims)(rnd.nextGaussian()))
  }

  /** Signed-projection signature: bit p = sign(v . plane_p). */
  def signature(emb: Column, dims: Int, numPlanes: Int = DefaultNumPlanes): Column = {
    val ps = planes(dims, numPlanes)
    (0 until numPlanes).map { p =>
      val plane = lit(ps(p))  // literal ARRAY<DOUBLE>, folded into the plan
      val d = aggregate(zip_with(emb, plane, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << p)).otherwise(0L)
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** Quantization scale shared by [[signatureInt]] and its SQL oracle. */
  val QuantScale = 1024

  /** Integer-plane hyperplanes: the Gaussian planes floored to 1/1024ths.
    * Public so an oracle can embed the SAME constants as SQL literals. */
  def intPlanes(dims: Int, numPlanes: Int = DefaultNumPlanes): Array[Array[Long]] =
    planes(dims, numPlanes).map(_.map(g => math.floor(g * QuantScale).toLong))

  /** Exactly-reproducible signed-projection signature: both the embedding
    * (floor(x*1024)) and the hyperplanes are integers, so the per-plane dot
    * product is exact integer arithmetic — bit p = (dot >= 0) can never
    * disagree between engines the way a floating dot's sign can at a
    * boundary. Products stay < 2^53, so even an oracle computing the dot in
    * doubles is exact. Same locality behavior as [[signature]]. */
  def signatureInt(emb: Column, dims: Int, numPlanes: Int = DefaultNumPlanes): Column = {
    val ps = intPlanes(dims, numPlanes)
    val q = transform(emb, x => floor(x.cast("double") * QuantScale).cast("long"))
    (0 until numPlanes).map { p =>
      val d = aggregate(zip_with(q, lit(ps(p)), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
      when(d >= 0, lit(1L << p)).otherwise(0L)
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** Approximate top-k via multi-table banded LSH: the numPlanes-bit
    * signature is split into numPlanes/bandBits bands; a vector is a
    * candidate for a query iff they agree on at least one band (union over
    * tables, like MinHash-LSH banding). Only candidates are scored — at
    * scale the band-bucket join replaces the cross product. Bucket count per
    * band is 2^bandBits, so at large n widen the signature (64 planes /
    * 16-bit bands = 65k buckets) — the 16/4 default exists only for the
    * pinned oracles. Output shape matches [[bruteForceTopK]]; recall
    * measured against it in the spec and in the sim_lsh_recall driver
    * query, and the whole pipeline is replicated by a SQL oracle (the
    * [[signatureInt]] signature is exact integer arithmetic on both sides). */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int, dims: Int,
      bandBits: Int = 4, numPlanes: Int = DefaultNumPlanes,
      maxBroadcastQueries: Long = DefaultMaxBroadcastQueries): DataFrame = {
    require(numPlanes % bandBits == 0, s"bandBits $bandBits must divide numPlanes $numPlanes")
    val bands = numPlanes / bandBits
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame): DataFrame = df
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("sig", signatureInt(col("embedding"), dims, numPlanes))
      .select(col("*"), posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bucket")))
    val b = banded(emb)
    val q = banded(emb.filter(queryPred))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("band").as("q_band"), col("bucket").as("q_bucket"))
    // broadcast contract: forcing the query side is only correct while
    // queryPred is SELECTIVE. Guard with an explicit count — a
    // non-selective predicate (think "all docs from last month") must
    // degrade to a shuffled bucket join, not OOM the driver building an
    // n-sized broadcast. The count is one scan of the filtered side; the
    // threshold is in QUERY rows (banding multiplies rows by `bands`, so
    // the broadcast carries nQueries x bands rows — sized accordingly).
    val nQueries = emb.filter(queryPred).count()
    val qSide = if (nQueries <= maxBroadcastQueries) broadcast(q) else q
    val candidates = b.join(qSide,
        col("band") === col("q_band") && col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("q_emb"), col("embedding"),
        col("q_nrm"), col("nrm"))
      .dropDuplicates("query_id", "vec_id")
    val scored = candidates.select(col("query_id"), col("vec_id"),
      (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** Recall@k sweep of [[lshTopK]] against [[bruteForceTopK]] across
    * signature configurations — the tuning query a pipeline runs before
    * committing to a band layout at scale (wider signatures trade recall
    * for candidate-set size). One row per (numPlanes, bandBits) config:
    * n_hits = |lsh-top-k ∩ brute-top-k| over all queries, recall_pct =
    * floor(100 * n_hits / (k * n_queries)). All-integer output, so a SQL
    * oracle replicating both pipelines reproduces it exactly. */
  def lshRecall(emb: DataFrame, queryPred: Column, k: Int, dims: Int,
      configs: Seq[(Int, Int)]): DataFrame = {
    val brute = bruteForceTopK(emb, queryPred, k)
      .select("query_id", "neighbor_id")
    val perConfig = configs.map { case (np, bb) =>
      lshTopK(emb, queryPred, k, dims, bb, np)
        .select("query_id", "neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(np).as("num_planes"), lit(bb).as("band_bits"), col("n_hits"))
    }.reduce(_ unionByName _)
    perConfig
      .crossJoin(brute.agg(countDistinct(col("query_id")).as("n_queries")))
      .select(col("num_planes"), col("band_bits"), col("n_queries"), col("n_hits"),
        floor(lit(100) * col("n_hits") / (lit(k) * col("n_queries"))).as("recall_pct"))
  }

  /** K-means (Lloyd) refinement of an IVF codebook. Each iteration:
    * map-side argmin assignment against the broadcast codebook (zero
    * shuffle), then ONE shuffle of (cent_id, dim, value) triples for the
    * element-wise mean — n x dims rows, map-side combinable. The driver
    * only ever moves the k x dims codebook itself. Empty clusters keep
    * their previous centroid. */
  private def kmeansRefine(emb: DataFrame, init: Array[(Long, Array[Float])],
      iters: Int): Array[(Long, Array[Float])] = {
    var codebook = init
    for (_ <- 0 until iters) {
      val assigned = withNearestCentroid(emb, codebook, 1)
      val means = assigned
        .select(col("cent_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cent_id", "dim").agg(avg(col("v")).as("m"))
        .groupBy("cent_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ms"))
        .select(col("cent_id"), col("ms.m").as("mean"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).map(_.toFloat).toArray))
        .toMap
      codebook = codebook.map { case (cid, v) => (cid, means.getOrElse(cid, v)) }
    }
    codebook
  }

  /** Ascending-sortable (negated score, cent_id) struct array vs the
    * literal codebook — shared by plain and rank-aware assignment. */
  private def centScores(cents: Array[(Long, Array[Float])]): Column = {
    def centNorm(v: Array[Float]): Double =
      math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    array(cents.map { case (cid, v) =>
      // ascending struct order == (best score, smallest cent_id) first
      struct((-(dot(col("embedding"), typedLit(v)) / (col("nrm") * lit(centNorm(v))))).as("neg"),
        lit(cid).as("cent_id"))
    }: _*)
  }

  /** Map-side nearest-centroid assignment: argmin over the literal codebook
    * (array of scored structs -> sort_array -> slice) — no crossJoin, no
    * per-vector window, ZERO shuffle. Adds (nrm, cent_id) columns; with
    * n > 1, one row per probed centroid. */
  private def withNearestCentroid(df: DataFrame,
      cents: Array[(Long, Array[Float])], n: Int): DataFrame =
    df.withColumn("nrm", norm(col("embedding")))
      .withColumn("p", explode(slice(sort_array(centScores(cents)), 1, n)))
      .withColumn("cent_id", col("p.cent_id")).drop("p")

  /** [[withNearestCentroid]] with the probe rank attached (1 = nearest
    * centroid): one scored pass can then serve every nProbe in a sweep by
    * filtering `probe_rank <= nProbe`. */
  private def withNearestCentroidRanked(df: DataFrame,
      cents: Array[(Long, Array[Float])], n: Int): DataFrame =
    df.withColumn("nrm", norm(col("embedding")))
      .select(col("*"),
        posexplode(slice(sort_array(centScores(cents)), 1, n)).as(Seq("pi", "p")))
      .withColumn("cent_id", col("p.cent_id"))
      .withColumn("probe_rank", col("pi") + 1)
      .drop("p", "pi")

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path:
    * a small coarse-quantizer codebook partitions the collection into
    * inverted lists; queries probe only the nProbe nearest lists.
    * The codebook is seeded deterministically (the numCentroids smallest
    * vec_ids) and k-means-refined for `kmeansIters` Lloyd iterations —
    * assignment is a broadcast argmin, lists are a hash-partitioned
    * relation, probing is a broadcast join on centroid id. Output shape
    * matches [[bruteForceTopK]]; recall bounded in the spec. */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int,
      numCentroids: Int = 16, nProbe: Int = 4, kmeansIters: Int = 2): DataFrame = {
    val cents = ivfCodebook(emb, numCentroids, kmeansIters)
    val lists = withNearestCentroid(emb, cents, 1) // inverted lists
    val probes = withNearestCentroid(emb.filter(queryPred), cents, nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id"))
    val scored = lists.join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** IVF coarse-quantizer codebook: seeded deterministically (numCentroids
    * smallest vec_ids) and Lloyd-refined. numCentroids <= 0 auto-sizes to
    * max(16, floor(sqrt(n))) — the standard IVF rule: list length n/k and
    * probe cost k balance at k ~ sqrt(n), so a fixed centroid count would
    * degenerate to linear scans as the collection grows. The codebook is
    * TINY (numCentroids x dims floats) — collected once and folded into
    * every consumer's plan as literals, so list assignment is a pure
    * map-side argmin: no crossJoin, ZERO shuffle before the probe join. */
  def ivfCodebook(emb: DataFrame, numCentroids: Int = 16,
      kmeansIters: Int = 2): Array[(Long, Array[Float])] = {
    val k =
      if (numCentroids > 0) numCentroids
      else math.max(16, math.sqrt(emb.count().toDouble).toInt)
    val seed: Array[(Long, Array[Float])] =
      emb.orderBy("vec_id").limit(k)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    kmeansRefine(emb, seed, kmeansIters)
  }

  /** Recall@k sweep of [[ivfTopK]] against [[bruteForceTopK]] across nProbe
    * values — the probe-budget tuning query (recall rises with probes,
    * reaching 1.0 when every list is probed). ONE ranked scoring pass
    * serves every nProbe: candidates carry the rank of the probed list, so
    * config `p` is the `probe_rank <= p` slice. Output per config:
    * (n_probe, n_queries, n_hits, recall_pct) — all integers, SQL-oracle
    * exact. */
  def ivfRecall(emb: DataFrame, queryPred: Column, k: Int, nProbes: Seq[Int],
      numCentroids: Int = 16, kmeansIters: Int = 2): DataFrame = {
    val cents = ivfCodebook(emb, numCentroids, kmeansIters)
    val lists = withNearestCentroid(emb, cents, 1)
    val probes = withNearestCentroidRanked(emb.filter(queryPred), cents, nProbes.max)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id"), col("probe_rank"))
    // each vector lives in exactly one list, so a (query, vec) pair scores
    // at most once, tagged with its list's probe rank
    val scored = lists.join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("probe_rank"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("score"))
      .persist()
    val brute = bruteForceTopK(emb, queryPred, k)
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    val perConfig = nProbes.map { np =>
      scored.filter(col("probe_rank") <= np)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("vec_id"))
        .join(brute, Seq("query_id", "vec_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(np).as("n_probe"), col("n_hits"))
    }.reduce(_ unionByName _)
    val out = perConfig
      .crossJoin(brute.agg(countDistinct(col("query_id")).as("n_queries")))
      .select(col("n_probe"), col("n_queries"), col("n_hits"),
        floor(lit(100) * col("n_hits") / (lit(k) * col("n_queries"))).as("recall_pct"))
    // one row per config — cache it, release the shared scored pass
    graft.core.CacheOps.cacheResult(out, Seq(scored))
  }

  /** Per-label centroids: (label, centroid ARRAY<FLOAT>). Element-wise mean
    * via posexplode + one map-side-combinable (label, dim) aggregation —
    * n x dims scalar rows through one shuffle, the same shape k-means
    * refinement uses. Means are computed in double and CAST TO FLOAT per
    * dimension: double summation-order noise (~2^-52 relative) is far
    * below float's rounding grid, so any engine lands on the same float —
    * the cross-engine determinism contract the IVF oracle established. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(avg(col("v")).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ms"))
      .select(col("label"), transform(col("ms.m"), x => x.cast("float")).as("centroid"))

  /** Label purity — the embedding-space diagnostic a training pipeline runs
    * on labeled data: every vector is classified to its nearest label
    * centroid (map-side argmax against the collected codebook — labels are
    * few by definition, so the codebook is tiny; ZERO shuffle after the
    * centroid aggregation) and compared with its own label. Ties break
    * toward the smaller label, mirroring the SQL oracle's ROW_NUMBER
    * order. Output: (vec_id, label, pred_label, correct). */
  def labelPurity(emb: DataFrame): DataFrame = {
    val cents: Array[(Long, Array[Float])] = labelCentroids(emb).collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    withNearestCentroid(emb.select("vec_id", "label", "embedding"), cents, 1)
      .select(col("vec_id"), col("label"), col("cent_id").as("pred_label"),
        (col("label") === col("cent_id")).as("correct"))
  }

  /** Per-label centroid-distance OUTLIERS — the embedding-space curation
    * pass that audits a labeled corpus for mislabels/anomalies: each
    * vector's squared distance to its OWN label's centroid, top-k
    * farthest per label. Exact integers throughout: dims quantize to
    * floor(x·1024) and the mean cross-multiplies away — with per-label
    * count n and per-dim sum s, rank by d2n2 = Σ_dims (q·n − s)², which
    * orders identically to the true distance (n² scales every vector of
    * a label equally) and never divides. (At extreme n the cross-product
    * would overflow long; the production variant floor-divides the
    * centroid once per label instead — same plan, documented tradeoff.)
    * Shape: one explode→aggregate builds the (label, dim) centroid
    * relation — bounded by labels×dims, so it BROADCASTS back onto the
    * exploded vectors for a map-side diff; one hash aggregate per vector
    * sums the squares; the per-label top-k is a WindowGroupLimit (each
    * partition keeps k rows). Output: (label, rank, vec_id, d2n2). */
  def centroidOutliers(emb: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.select(col("vec_id"), col("label"),
      posexplode(quantized(col("embedding"))).as(Seq("dim", "q")))
    val cent = q.groupBy("label", "dim")
      .agg(sum("q").as("s"), count(lit(1)).as("n"))
    val d2 = q.join(broadcast(cent), Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sum((col("q") * col("n") - col("s")) *
        (col("q") * col("n") - col("s"))).as("d2n2"))
    val w = Window.partitionBy("label")
      .orderBy(col("d2n2").desc, col("vec_id"))
    d2.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("label", "rank", "vec_id", "d2n2")
  }

  /** Int8 scalar quantization of an embedding column — the storage/transfer
    * compression step of a large-scale vector pipeline (4x smaller than
    * FLOAT, dequantizes to within scale/254 per dimension). Per vector the
    * scale is its max |x|; each dimension quantizes to
    * floor(x * 127 / scale) in [-128, 127]. Pure map-side (no shuffle, no
    * UDF), and every output is an INTEGER: IEEE double division and floor
    * on identical float inputs are bit-deterministic across engines, so a
    * SQL oracle reproduces the codes exactly (a rounding mode like
    * round-half-up would not be safely portable; floor is).
    * Output: (vec_id, dim, q) — dim 0-based. */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val mx = array_max(transform(col("embedding"), x => abs(x)))
    emb
      .select(col("vec_id"), col("embedding"), mx.as("scale"))
      .filter(col("scale") > 0)
      .select(col("vec_id"), posexplode(transform(col("embedding"),
        x => floor(x.cast("double") * lit(127.0) / col("scale").cast("double")).cast("int")))
        .as(Seq("dim", "q")))
  }

  /** Quantized-integer embedding (floor(x*1024) per dim — the same exact
    * representation as [[signatureInt]] and the LSH oracles). */
  private def quantized(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * QuantScale).cast("long"))

  /** Nearest-anchor codes of one embedding, as the NATIVE codegen'd
    * kernel ([[graft.functions.PqAssignCodes]]). The assignment loop is
    * numSub x kAnchors x subDim squared diffs per row — every DataFrame
    * formulation of it pays the interpreted-HOF or expression-eval tax
    * (7-40 s/pass over 20k rows, measurements in the kernel's scaladoc);
    * the native expression is ~0.1 s/pass and stays in whole-stage
    * codegen. Arithmetic identical to the SQL oracle: exact integers,
    * argmin ties to the smaller anchor index. */
  private def pqCodesCol(embCol: Column,
      anchors: Array[Array[Long]], numSub: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.PqAssignCodes(
      ColumnBridge.expression(embCol),
      anchors.map(_.toSeq).toSeq, numSub))
  }

  /** Flat ADC lookup table (index m*kAnchors + j) of one query embedding,
    * as the native kernel ([[graft.functions.PqQueryLut]]). */
  private def pqLutCol(embCol: Column,
      anchors: Array[Array[Long]], numSub: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.PqQueryLut(
      ColumnBridge.expression(embCol),
      anchors.map(_.toSeq).toSeq, numSub))
  }

  /** PQ anchor codebook, integer-Lloyd-refined per subspace. The seed is
    * `kAnchors` collection vectors ranked by md5(vec_id) — a deterministic
    * pseudo-random sample both engines can reproduce — and each refinement
    * iteration reassigns codes map-side and recomputes every anchor
    * sub-coordinate as the TRUNCATING integer division sum/count of its
    * members (empty clusters keep their anchor). All arithmetic is exact
    * integers, so the trained codebook is bit-identical in any engine —
    * the floating k-means determinism problem never arises. The per-
    * iteration aggregation is map-side combinable ((m, code, dim) keys,
    * numSub x kAnchors x dims rows out); the codebook is TINY and collected
    * once per iteration. */
  def pqAnchors(emb: DataFrame, numSub: Int = 4, kAnchors: Int = 16,
      iters: Int = 2): Array[Array[Long]] = {
    var anchors = emb
      .select(quantized(col("embedding")).as("qe"), col("vec_id"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(kAnchors)
      .collect().map(_.getSeq[Long](0).toArray)
    val dims = anchors.head.length
    require(dims % numSub == 0, s"dims $dims not divisible by $numSub subspaces")
    val sub = dims / numSub
    for (_ <- 0 until iters) {
      // native codes, then the subspace slice re-derived per (row, m) —
      // the transform evaluates once per exploded row, not per anchor
      val sums = emb
        .select(posexplode(pqCodesCol(col("embedding"), anchors, numSub))
            .as(Seq("m", "code")),
          quantized(col("embedding")).as("qe"))
        .select(col("m"), col("code"),
          posexplode(slice(col("qe"), col("m") * sub + 1, lit(sub)))
            .as(Seq("i", "v")))
        .groupBy("m", "code", "i")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = anchors.map(_.clone())
      sums.foreach { r =>
        val (m, code, i) = (r.getInt(0), r.getInt(1), r.getInt(2))
        next(code)(m * sub + i) = r.getLong(3) / r.getLong(4) // truncating, as in SQL `//`
      }
      anchors = next
    }
    anchors
  }

  /** PQ code relation: (vec_id, codes ARRAY<INT>) — 64 float dims collapse
    * to `numSub` small ints. The PQ memory story: at 100 TB the codes
    * relation is ~16x smaller than the embeddings and the assignment is
    * shuffle-free (anchors fold into the plan as literals). */
  def pqCodes(emb: DataFrame, numSub: Int = 4, kAnchors: Int = 16,
      iters: Int = 2): DataFrame = {
    val anchors = pqAnchors(emb, numSub, kAnchors, iters)
    emb.select(col("vec_id"),
      pqCodesCol(col("embedding"), anchors, numSub).as("codes"))
  }

  /** Product-quantization top-k: ADC candidate generation + exact re-rank
    * (the repo's banded-candidates-then-verify pattern, in PQ form). Each
    * query precomputes its numSub x kAnchors lookup table of exact integer
    * sub-distances; a collection vector's approximate squared distance is
    * then numSub array lookups summed — no per-pair arithmetic on the
    * embeddings during the scan. The ADC top-`rerank` candidates then join
    * BACK to the embeddings by id for an exact integer-L2 re-rank — the
    * codes scan never carries the vectors, preserving PQ's ~16x memory
    * win, and the rerank join moves only |queries| x rerank rows. Scale
    * shape: LUT relation broadcasts, one pass over codes, candidate-sized
    * shuffle. Recall@10 ~0.75 at numSub=4/kAnchors=16/rerank=100 on the
    * sf0.001 fixture (spec-gated >= 0.6); every number is integer-exact,
    * so the FULL pipeline — refinement included — is SQL-oracle checkable.
    * Output: (query_id, rank, neighbor_id, l2_dist). */
  /** The ADC distance of one (codes, lut) pair: numSub array lookups
    * summed (flat LUT index m*kAnchors + j). */
  private def adcDistCol(numSub: Int, kAnchors: Int): Column =
    (0 until numSub).map { m =>
      element_at(col("lut"),
        (lit(m * kAnchors) + element_at(col("codes"), m + 1) + 1).cast("int"))
    }.reduce(_ + _)

  /** Shared PQ tail: bounded top-`rerank` per query over the (query_id,
    * vec_id, neg_adc) candidate stream, then exact integer-L2 re-rank
    * against the embeddings rejoined BY ID. Candidate selection uses the
    * bounded top-k aggregator, not a ranking window: the ADC stream is up
    * to |queries| x collection rows — a window would sort and shuffle all
    * of it, the aggregator keeps O(rerank) buffers with map-side combine.
    * Negated distance = "score" (ADC distances are < 2^31, exact in
    * double), ties ascend on vec_id — result-identical to the
    * (adc asc, vec_id asc) ranking. */
  private def adcRerank(emb: DataFrame, queryPred: Column, adc: DataFrame,
      k: Int, rerank: Int): DataFrame = {
    val cand = graft.scale.TopK
      .topKPerKey(adc, "query_id", "vec_id", "neg_adc", rerank)
      .select("query_id", "vec_id")
    val qz = emb.select(col("vec_id"), quantized(col("embedding")).as("qe"))
    val qq = broadcast(emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), quantized(col("embedding")).as("q_qe")))
    val exact = cand
      .join(qz, "vec_id")
      .join(qq, "query_id")
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("qe"), col("q_qe"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("l2_dist"))
    val w = Window.partitionBy("query_id").orderBy(col("l2_dist"), col("vec_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("l2_dist"))
  }

  def pqTopK(emb: DataFrame, queryPred: Column, k: Int,
      numSub: Int = 4, kAnchors: Int = 16, iters: Int = 2,
      rerank: Int = 100): DataFrame = {
    val anchors = pqAnchors(emb, numSub, kAnchors, iters)
    val codes = emb.select(col("vec_id"),
      pqCodesCol(col("embedding"), anchors, numSub).as("codes"))
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"),
        pqLutCol(col("embedding"), anchors, numSub).as("lut"))
    val adc = codes.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        negate(adcDistCol(numSub, kAnchors)).as("neg_adc"))
    adcRerank(emb, queryPred, adc, k, rerank)
  }

  /** IVF-PQ: the canonical billion-scale ANN layout, fully integer-exact.
    * A COARSE integer codebook (the same truncating-Lloyd training as
    * [[pqAnchors]] with numSub = 1 — one "subspace" spanning all dims)
    * partitions the collection into `nLists` inverted lists; each query
    * probes its `nProbe` nearest lists (ranked by exact integer distance
    * to the coarse centroids, ties to the smaller centroid id) and runs
    * the PQ ADC scan ONLY within the probed lists — the equi-join on
    * cent_id replaces [[pqTopK]]'s full crossJoin, cutting scored pairs
    * by ~nProbe/nLists. Fine codes are the global [[pqCodes]] codebook
    * (IVFFlat-style, not residual-encoded — documented tradeoff: residual
    * codebooks recover a little precision at the cost of per-list
    * codebook state). ADC candidates then exact-rerank by id, same as
    * [[pqTopK]]. With nProbe = nLists the candidate set equals the full
    * scan's, so the result EQUALS pqTopK's (spec-pinned). Scale shape:
    * both codebooks are tiny plan literals, assignment is the native
    * kernel map-side, the probe relation broadcasts, and the only big
    * operator is the bucket equi-join feeding the bounded aggregator.
    * Output: (query_id, rank, neighbor_id, l2_dist). */
  def ivfPqTopK(emb: DataFrame, queryPred: Column, k: Int,
      nLists: Int = 16, nProbe: Int = 4, numSub: Int = 4,
      kAnchors: Int = 16, iters: Int = 2, rerank: Int = 100): DataFrame = {
    val coarse = pqAnchors(emb, 1, nLists, iters)
    val fine = pqAnchors(emb, numSub, kAnchors, iters)
    val lists = ivfPqLists(emb, coarse, fine, numSub)
    ivfPqSearch(emb, queryPred, k, coarse, fine, lists, numSub, nProbe, rerank)
  }

  /** The inverted-list relation of an IVF-PQ index: every collection
    * vector's coarse list assignment and fine PQ codes —
    * (vec_id, cent_id, codes). */
  private def ivfPqLists(emb: DataFrame, coarse: Array[Array[Long]],
      fine: Array[Array[Long]], numSub: Int): DataFrame =
    emb.select(col("vec_id"),
      element_at(pqCodesCol(col("embedding"), coarse, 1), 1).as("cent_id"),
      pqCodesCol(col("embedding"), fine, numSub).as("codes"))

  /** The probe-and-scan shared by the in-memory and persisted index
    * paths: identical inputs produce identical results, so re-opening a
    * written index is bit-for-bit equal to retraining (spec-pinned). */
  private def ivfPqSearch(emb: DataFrame, queryPred: Column, k: Int,
      coarse: Array[Array[Long]], fine: Array[Array[Long]],
      lists: DataFrame, numSub: Int, nProbe: Int, rerank: Int): DataFrame = {
    val kAnchors = fine.length
    // nProbe nearest coarse centroids per query: the coarse LUT is the
    // exact integer distance to every centroid; K is tiny, so the probe
    // ranking is a posexplode + window over |queries| x nLists rows
    val probeW = Window.partitionBy("query_id").orderBy(col("d"), col("cent_id"))
    val probes = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"),
        pqLutCol(col("embedding"), fine, numSub).as("lut"),
        posexplode(pqLutCol(col("embedding"), coarse, 1)).as(Seq("cent_id", "d")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("cent_id"), col("lut"))
    val adc = lists.join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        negate(adcDistCol(numSub, kAnchors)).as("neg_adc"))
    adcRerank(emb, queryPred, adc, k, rerank)
  }

  /** A re-opened persisted IVF-PQ index: the tiny codebooks (collected to
    * plan literals, as in the in-memory path) plus the inverted-list
    * relation, which stays a LAZY parquet scan — at 100 TB the lists are
    * the index's bulk and are never materialized on the driver. */
  final case class IvfPqIndex(coarse: Array[Array[Long]],
      fine: Array[Array[Long]], numSub: Int, lists: DataFrame)

  /** Train an IVF-PQ index once and PERSIST its artifacts as parquet —
    * the build-once/query-for-months lifecycle a production ANN corpus
    * needs (today's alternative retrains per query). Layout:
    *   - `$path/codebooks.parquet` — (kind: coarse|fine, code, anchor,
    *     num_sub): both tiny codebooks, self-describing.
    *   - `$path/lists.parquet` — (vec_id, codes) PARTITIONED BY cent_id:
    *     each inverted list is its own partition directory, so a probed
    *     search scans only nProbe/nLists of the index bytes (partition
    *     pruning does at rest what the cent_id equi-join does in memory).
    * Training is the same deterministic integer Lloyd as [[ivfPqTopK]] —
    * identical emb in, bit-identical artifacts out. */
  def writeIvfPqIndex(emb: DataFrame, path: String, nLists: Int = 16,
      numSub: Int = 4, kAnchors: Int = 16, iters: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val coarse = pqAnchors(emb, 1, nLists, iters)
    val fine = pqAnchors(emb, numSub, kAnchors, iters)
    val rows = coarse.zipWithIndex.map { case (v, i) => ("coarse", i, v.toSeq) } ++
      fine.zipWithIndex.map { case (v, i) => ("fine", i, v.toSeq) }
    rows.toSeq.toDF("kind", "code", "anchor")
      .withColumn("num_sub", lit(numSub))
      .coalesce(1) // two codebooks, <= a few KB — one footer, not 32
      .write.mode("overwrite").parquet(s"$path/codebooks.parquet")
    ivfPqLists(emb, coarse, fine, numSub)
      .write.mode("overwrite").partitionBy("cent_id")
      .parquet(s"$path/lists.parquet")
  }

  /** Re-open a [[writeIvfPqIndex]] index. Codebooks collect to the driver
    * (they are plan literals in every search); the lists relation stays a
    * lazy partition-pruned scan. */
  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfPqIndex = {
    val cb = spark.read.parquet(s"$path/codebooks.parquet").collect()
    require(cb.nonEmpty, s"empty codebooks at $path")
    val numSub = cb.head.getAs[Int]("num_sub")
    def book(kind: String): Array[Array[Long]] = cb
      .filter(_.getAs[String]("kind") == kind)
      .sortBy(_.getAs[Int]("code"))
      .map(_.getSeq[Long](cb.head.fieldIndex("anchor")).toArray)
    IvfPqIndex(book("coarse"), book("fine"), numSub,
      spark.read.parquet(s"$path/lists.parquet"))
  }

  /** IVF-PQ top-k served from a RE-OPENED index — no retraining, no
    * re-encoding: the probe, ADC scan and exact re-rank run against the
    * persisted lists (cent_id partition pruning bounds the scan to the
    * probed lists). `emb` supplies the query vectors and the exact
    * re-rank lookups only. Result is bit-identical to [[ivfPqTopK]] with
    * the same parameters (spec-pinned). */
  def ivfPqTopKIndexed(emb: DataFrame, queryPred: Column, k: Int,
      index: IvfPqIndex, nProbe: Int = 4, rerank: Int = 100): DataFrame =
    ivfPqSearch(emb, queryPred, k, index.coarse, index.fine, index.lists,
      index.numSub, nProbe, rerank)

  /** Elementwise shift of a codebook by a coarse centroid: the residual
    * identity argmin_j ||(q − c) − a_j||² = argmin_j ||q − (a_j + c)||²
    * lets the RAW-vector native kernels ([[graft.functions.PqAssignCodes]],
    * [[graft.functions.PqQueryLut]]) run residual assignment/LUTs — each
    * inverted list's codebook is the shared residual codebook shifted by
    * that list's centroid, folded into the plan as a literal. */
  private def shiftedCb(res: Array[Array[Long]], c: Array[Long]): Array[Array[Long]] =
    res.map(a => Array.tabulate(a.length)(i => a(i) + c(i)))

  /** Per-centroid CASE dispatch of a per-list kernel: exactly one branch
    * (the row's own list) evaluates per row. */
  private def perListCol(centCol: Column, nLists: Int)(mk: Int => Column): Column =
    coalesce((0 until nLists).map(j => when(centCol === j, mk(j))): _*)

  /** Residual PQ codebook: the same truncating-integer-Lloyd training as
    * [[pqAnchors]], run over the RESIDUAL vectors (quantized embedding
    * minus its coarse centroid) — the codebook FAISS-class IVF-PQ systems
    * actually ship, recovering precision because residuals concentrate
    * near the origin where one shared codebook would waste its anchors
    * spanning the coarse structure. All arithmetic stays exact integers
    * (residuals are integer differences), so the trained codebook is
    * engine-bit-identical; assignments reuse the native raw-vector kernel
    * through the shifted-codebook identity ([[shiftedCb]]). */
  def residualAnchors(emb: DataFrame, coarse: Array[Array[Long]],
      numSub: Int = 4, kAnchors: Int = 16, iters: Int = 2): Array[Array[Long]] = {
    val dims = coarse.head.length
    require(dims % numSub == 0, s"dims $dims not divisible by $numSub subspaces")
    val sub = dims / numSub
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    // (vec_id, embedding, cent_id, rq): residual = qe − coarse[cent]
    val res = emb.select(col("vec_id"), col("embedding"),
        element_at(pqCodesCol(col("embedding"), coarse, 1), 1).as("cent_id"))
      .withColumn("rq", zip_with(quantized(col("embedding")),
        element_at(coarseLit, col("cent_id") + 1), (x, y) => x - y))
    var anchors = res
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(kAnchors)
      .select("rq").collect().map(_.getSeq[Long](0).toArray)
    for (_ <- 0 until iters) {
      val codesCol = perListCol(col("cent_id"), coarse.length)(j =>
        pqCodesCol(col("embedding"), shiftedCb(anchors, coarse(j)), numSub))
      val sums = res
        .select(posexplode(codesCol).as(Seq("m", "code")), col("rq"))
        .select(col("m"), col("code"),
          posexplode(slice(col("rq"), col("m") * sub + 1, lit(sub)))
            .as(Seq("i", "v")))
        .groupBy("m", "code", "i")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = anchors.map(_.clone())
      sums.foreach { r =>
        val (m, code, i) = (r.getInt(0), r.getInt(1), r.getInt(2))
        next(code)(m * sub + i) = r.getLong(3) / r.getLong(4)
      }
      anchors = next
    }
    anchors
  }

  /** Residual-encoded IVF-PQ top-k: [[ivfPqTopK]] with the fine codes
    * drawn from the RESIDUAL codebook ([[residualAnchors]]) — list rows
    * encode (vector − list centroid), and each query carries ONE LUT PER
    * PROBED LIST (its residual against that list's centroid) instead of a
    * single global LUT. Same scale shape as the non-residual path: both
    * codebooks are tiny plan literals, assignment and LUTs are the native
    * kernel through the shifted-codebook identity (no residual vectors
    * are ever materialized in the scan), the probe relation broadcasts at
    * nProbe× its non-residual width, and the ADC scan stays an equi-join
    * on cent_id feeding the bounded top-k aggregator. Exact-integer end
    * to end — oracle-checkable like every other PQ query; a spec gates
    * its recall >= the non-residual path at equal (nLists, nProbe,
    * numSub). Output: (query_id, rank, neighbor_id, l2_dist). */
  def ivfPqResidualTopK(emb: DataFrame, queryPred: Column, k: Int,
      nLists: Int = 16, nProbe: Int = 4, numSub: Int = 4,
      kAnchors: Int = 16, iters: Int = 2, rerank: Int = 100): DataFrame = {
    val coarse = pqAnchors(emb, 1, nLists, iters)
    val resCb = residualAnchors(emb, coarse, numSub, kAnchors, iters)
    val shifted = (0 until nLists).map(j => shiftedCb(resCb, coarse(j)))
    val lists = emb.select(col("vec_id"), col("embedding"),
        element_at(pqCodesCol(col("embedding"), coarse, 1), 1).as("cent_id"))
      .select(col("vec_id"), col("cent_id"),
        perListCol(col("cent_id"), nLists)(j =>
          pqCodesCol(col("embedding"), shifted(j), numSub)).as("codes"))
    val probeW = Window.partitionBy("query_id").orderBy(col("d"), col("cent_id"))
    val probes = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding"),
        posexplode(pqLutCol(col("embedding"), coarse, 1)).as(Seq("cent_id", "d")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("cent_id"),
        perListCol(col("cent_id"), nLists)(j =>
          pqLutCol(col("embedding"), shifted(j), numSub)).as("lut"))
    val adc = lists.join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        negate(adcDistCol(numSub, kAnchors)).as("neg_adc"))
    adcRerank(emb, queryPred, adc, k, rerank)
  }

  /** Embedding near-duplicate pairs with cosine >= minCosine: banded-LSH
    * candidate generation (same multi-table banding as [[lshTopK]] — a pair
    * is a candidate iff it agrees on >= 1 of the 4 4-bit bands, which bounds
    * bucket sizes where a single 16-bit-signature bucket join would go
    * quadratic on dense signature regions), then EXACT cosine verification
    * of the candidates only — precision is 1.0 by construction. Recall is
    * the LSH collision probability (~0.99 at cosine 0.95); pairs in the SAME
    * direction (true duplicates, scaled copies) have identical signatures
    * and are found with certainty. Output: (vec_id_a, vec_id_b, score). */
  def cosineNearDupPairs(emb: DataFrame, minCosine: Double, dims: Int,
      bandBits: Int = 4, numPlanes: Int = DefaultNumPlanes): DataFrame = {
    require(numPlanes % bandBits == 0, s"bandBits $bandBits must divide numPlanes $numPlanes")
    val bands = numPlanes / bandBits
    val mask = (1L << bandBits) - 1
    val banded = emb
      .withColumn("sig", signature(col("embedding"), dims, numPlanes))
      .select(col("vec_id"), posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bucket")))
    // candidates carry only ids (embeddings join back AFTER dedup — the
    // band fan-out must not replicate the wide vectors 4x)
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id_a"), col("y.vec_id").as("vec_id_b"))
      .dropDuplicates()
    val en = emb.withColumn("nrm", norm(col("embedding")))
    candidates
      .join(en.select(col("vec_id").as("vec_id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a")), "vec_id_a")
      .join(en.select(col("vec_id").as("vec_id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b")), "vec_id_b")
      .select(col("vec_id_a"), col("vec_id_b"),
        (dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b"))).as("score"))
      .filter(col("score") >= minCosine)
  }

  /** Semantic deduplication (SemDeDup-style): cluster the collection with
    * the IVF coarse quantizer, then find cosine-near-duplicates ONLY within
    * each cluster and elect the minimum vec_id of every duplicate
    * neighborhood as its representative. The cluster scope is what makes
    * embedding dedup tractable at corpus scale — the pair search runs per
    * cluster (expected size n/k, k ~ sqrt(n) under the DEFAULT auto-sizing
    * `numCentroids = -1`; pass an explicit k only when pinning a layout),
    * not over the full collection.
    *
    * Clusters are still data-skewed, so a HOT cluster's exact self-join is
    * quadratic in its list size. Above `bandedThreshold` rows the pair
    * search inside a cluster switches to the banded-LSH candidate shape of
    * [[cosineNearDupPairs]] (join on (cent_id, band, bucket) instead of
    * cent_id alone, exact cosine verification of candidates only), which
    * bounds the hot cluster's join fan-out by its bucket sizes. Scaled
    * copies/identical directions have IDENTICAL signatures, so
    * exact-duplicate recall stays 1.0 by construction on both paths; for
    * merely-similar pairs the banded path's recall is the LSH collision
    * bound (~0.99 at cosine 0.95 with the default 16/4 layout) — the
    * documented approximation of crossing the threshold.
    * Output: (vec_id, cent_id, rep_id, is_dup) — rep_id = min id among
    * {self} ∪ {same-cluster neighbors with cosine >= minCosine};
    * is_dup = rep_id != vec_id (drop rows with is_dup for the deduped
    * corpus). The returned frame is the one cached handle (CacheOps
    * contract); internal lists are released after materialization. */
  def semanticDedup(emb: DataFrame, minCosine: Double,
      numCentroids: Int = -1, kmeansIters: Int = 2,
      bandedThreshold: Long = 100000L, dims: Int = 64,
      bandBits: Int = 4, numPlanes: Int = DefaultNumPlanes): DataFrame = {
    require(numPlanes % bandBits == 0,
      s"bandBits $bandBits must divide numPlanes $numPlanes")
    val cents = ivfCodebook(emb, numCentroids, kmeansIters)
    val lists = withNearestCentroid(emb, cents, 1).persist()
    // per-cluster sizes: <= k rows, broadcast onto every member
    val sized = lists.join(
      broadcast(lists.groupBy("cent_id").agg(count(lit(1)).as("_csz"))),
      "cent_id")
    // smaller-id neighbors only: each vec needs just the MIN qualifying
    // neighbor id, so the pair stream is half the full candidate set
    val small = sized.filter(col("_csz") <= bandedThreshold)
    val smallPairs = small.select(col("cent_id"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      .join(small.select(col("cent_id"), col("vec_id"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm")), Seq("cent_id"))
      .filter(col("a_id") < col("vec_id"))
      .filter(dot(col("a_emb"), col("b_emb")) /
        (col("a_nrm") * col("b_nrm")) >= minCosine)
      .select(col("a_id"), col("vec_id"))
    // hot clusters: banded candidates (ids only — the wide vectors join
    // back AFTER candidate dedup), then exact verification
    val big = sized.filter(col("_csz") > bandedThreshold)
    val bands = numPlanes / bandBits
    val mask = (1L << bandBits) - 1
    val banded = big
      .withColumn("sig", signature(col("embedding"), dims, numPlanes))
      .select(col("cent_id"), col("vec_id"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("band", "bucket")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.cent_id") === col("y.cent_id") && col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("vec_id"))
      .dropDuplicates()
    val ln = lists.select(col("vec_id"), col("embedding"), col("nrm"))
    val bigPairs = cand
      .join(ln.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("nrm").as("a_nrm")), "a_id")
      .join(ln.select(col("vec_id"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm")), "vec_id")
      .filter(dot(col("a_emb"), col("b_emb")) /
        (col("a_nrm") * col("b_nrm")) >= minCosine)
      .select(col("a_id"), col("vec_id"))
    val reps = smallPairs.unionByName(bigPairs)
      .groupBy("vec_id").agg(min("a_id").as("nbr_id"))
    val out = lists.join(reps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        coalesce(col("nbr_id"), col("vec_id")).as("rep_id"))
      .withColumn("is_dup", col("rep_id") =!= col("vec_id"))
    graft.core.CacheOps.cacheResult(out, Seq(lists)).toDF()
  }

  /** Hard-negative mining — for each query vector, the k most-similar
    * vectors carrying a DIFFERENT label (the contrastive-training
    * candidates that are hard precisely because they look like the
    * query). Exact cosine ranking with vec_id tiebreak; the label filter
    * runs inside the scoring join, so excluded same-label rows never
    * reach the aggregator. Neighbor search is the bounded typed
    * Aggregator (O(k) buffers, map-side combine — never a per-query full
    * sort); at corpus scale callers swap the scoring join for the
    * IVF/LSH candidate generators, the mining tail is identical.
    * Output: (query_id, rank, neighbor_id, neighbor_label). */
  def hardNegatives(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val en = emb.withColumn("nrm", norm(col("embedding")))
    val q = en.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("label").cast("long").as("q_label"))
    val scored = en.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") &&
        col("label").cast("long") =!= col("q_label"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm"))).as("score"))
    graft.scale.TopK.topKPerKey(scored, "query_id", "vec_id", "score", k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("label").cast("long").as("neighbor_label")), Seq("neighbor_id"))
      .select("query_id", "rank", "neighbor_id", "neighbor_label")
  }

  /** Semantic decontamination — flag evaluation/test vectors whose
    * nearest TRAIN vector clears `minCosine` (the embedding-level
    * counterpart of the n-gram `text_decontaminate`: paraphrases and
    * near-copies that share no 13-gram still collide here). Directional
    * PROBE, never a corpus self-join: test-side band buckets join the
    * train-side index, candidates carry ids only, and the exact cosine
    * verifies each candidate — train-train pairs are never enumerated,
    * so the cost is the test set's bucket collisions, not |corpus|².
    * Every test row reports, flagged or clean (n_matches = 0,
    * best_train_id = −1); the reported match is the SMALLEST matching
    * train id — scores stay internal because a floored score is
    * ulp-unstable exactly at the cosine-1.0 boundary injected copies sit
    * on (the threshold compare itself has the documented ≥4e-4 margin).
    * Output: (test_id, n_matches, best_train_id). */
  def semanticDecontaminate(emb: DataFrame, testPred: Column,
      minCosine: Double, dims: Int, bandBits: Int = 4,
      numPlanes: Int = DefaultNumPlanes): DataFrame = {
    require(numPlanes % bandBits == 0,
      s"bandBits $bandBits must divide numPlanes $numPlanes")
    val bands = numPlanes / bandBits
    val mask = (1L << bandBits) - 1
    def bandRel(df: DataFrame, idAs: String) = df
      .withColumn("sig", signature(col("embedding"), dims, numPlanes))
      .select(col("vec_id").as(idAs), posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bucket")))
    val test = emb.filter(testPred)
    val train = emb.filter(!testPred)
    val candidates = bandRel(test, "test_id")
      .join(bandRel(train, "train_id"), Seq("band", "bucket"))
      .select("test_id", "train_id").dropDuplicates()
    val en = emb.withColumn("nrm", norm(col("embedding")))
    val matches = candidates
      .join(en.select(col("vec_id").as("test_id"), col("embedding").as("te"),
        col("nrm").as("tn")), "test_id")
      .join(en.select(col("vec_id").as("train_id"), col("embedding").as("re"),
        col("nrm").as("rn")), "train_id")
      .select(col("test_id"), col("train_id"),
        (dot(col("te"), col("re")) / (col("tn") * col("rn"))).as("score"))
      .filter(col("score") >= minCosine)
      .groupBy("test_id")
      .agg(count(lit(1)).as("n_matches"),
        min(col("train_id")).as("best"))
    test.select(col("vec_id").as("test_id"))
      .join(matches, Seq("test_id"), "left")
      .select(col("test_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best"), lit(-1L)).as("best_train_id"))
  }

  /** Maximal Marginal Relevance reranking — the diversity pass a
    * retrieval stack runs AFTER top-k (plain cosine top-k returns five
    * near-copies of the best hit; MMR greedily picks the item maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked). λ is given
    * in integer percent. The greedy loop is `k` unrolled DataFrame
    * rounds, each a join + argmax over CANDIDATE-SIZED relations only:
    * candidates are the per-query top-`m` (WindowGroupLimit), their
    * pairwise cosines compute ONCE (q·m² rows — m is a constant, so this
    * scales as the query count), and every round is one semi-join of
    * that pair relation against the picked set + a max-struct argmax
    * per query (no window, no sort). Ties break to the smallest vec_id,
    * same as every ranking in this file.
    * Output: (query_id, rank, neighbor_id), rank 1..k. */
  def mmrRerank(emb: DataFrame, queryPred: Column, k: Int = 5,
      m: Int = 20, lambdaPct: Int = 70): DataFrame = {
    require(k >= 1 && m >= k, "need m >= k >= 1")
    require(lambdaPct >= 0 && lambdaPct <= 100, "lambda in 0..100 percent")
    val en = emb.withColumn("nrm", norm(col("embedding")))
    val rw = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("vec_id"))
    val cand = en.crossJoin(broadcast(en.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding"), col("nrm"),
        (dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm"))).as("rel"))
      .withColumn("r", row_number().over(rw))
      .filter(col("r") <= m)
      .select("query_id", "vec_id", "embedding", "nrm", "rel")
      .persist()
    // pairwise candidate cosines, once (q·m·(m−1) rows, m constant)
    val pair = cand.as("x").join(cand.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.query_id").as("query_id"), col("x.vec_id").as("vec_id"),
        col("y.vec_id").as("s"),
        (dot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm"))).as("cs"))
      .persist()
    val rel = cand.select("query_id", "vec_id", "rel")
    def argmax(scores: DataFrame, scoreCol: String, rank: Int): DataFrame =
      scores.groupBy("query_id")
        .agg(max(struct(col(scoreCol), (-col("vec_id")).as("nid"))).as("m"))
        .select(col("query_id"), (-col("m.nid")).as("vec_id"),
          lit(rank.toLong).as("rank"))
    // round 1: pure relevance argmax. Each round's picked set is
    // localCheckpoint-ed (eager): round t's plan must build on the
    // MATERIALIZED t−1 picks, not the unrolled history — without it the
    // union lineage recomputes every earlier round inside every later
    // one (the same trap the CC loop documents). The relation is
    // queries × t rows — materialization is trivially cheap.
    var all = argmax(rel, "rel", 1).localCheckpoint()
    for (t <- 2 to k) {
      val pickedSet = all.select(col("query_id"), col("vec_id").as("s"))
      val red = pair.join(pickedSet, Seq("query_id", "s"))
        .groupBy("query_id", "vec_id").agg(max("cs").as("red"))
      val scored = rel
        .join(all.select("query_id", "vec_id"), Seq("query_id", "vec_id"),
          "left_anti")
        .join(red, Seq("query_id", "vec_id"), "left")
        // score 100·mmr with exact integer coefficients: lit(0.3) and
        // DuckDB's (1 - 0.7) differ by 1 ulp (DECIMAL parse), and an
        // unrounded coefficient feeding an argmax is a latent cross-engine
        // rank flip — lambdaPct·rel − (100−lambdaPct)·red is ulp-safe
        .select(col("query_id"), col("vec_id"),
          (lit(lambdaPct.toDouble) * col("rel") -
            lit((100 - lambdaPct).toDouble) * coalesce(col("red"), lit(0.0))).as("mmr"))
      all = all.unionByName(argmax(scored, "mmr", t)).localCheckpoint()
    }
    all.select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }
}
