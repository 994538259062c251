package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level data profiling over an arbitrary table — the
  * generalization of the reference's counting programs (CountConditions /
  * CountDistinctValues, rdfind-algorithm programs) from the fixed triple
  * schema to any relation: the first step a pipeline runs against an
  * unknown 100 TB input.
  *
  * One aggregation job for the whole profile: all per-column aggregates
  * (null counts, exact distinct counts, min/max) land in a single
  * `agg(...)`, which Spark plans as ONE scan + one Expand-based shuffle
  * (the standard multi-distinct plan — each row is replicated once per
  * distinct-counted column, the unavoidable cost of EXACT multi-column
  * distincts in one pass; swap to approx_count_distinct if a profile of a
  * 100 TB table may be approximate). The per-column result rows come from
  * unpivoting the single aggregate row driver-side (6 values per column —
  * constant size), never from per-column jobs.
  */
object Profile {

  /** Profile the given columns:
    * (column_name, n_rows, n_nulls, n_distinct, min_val, max_val).
    * min/max are rendered as strings AFTER aggregating on the native type
    * (so numeric columns order numerically, not lexicographically).
    * Restrict to integer/string/date columns when bit-exact cross-engine
    * rendering matters — float formatting is engine-specific.
    *
    * `approx = true` swaps exact distinct counts for HyperLogLog++
    * (`approx_count_distinct`, ~2% relative error): the Expand replication
    * disappears, so the profile of a 100 TB table costs ONE plain scan +
    * aggregation — the right default when the count only feeds a
    * cardinality decision (broadcast or not, dictionary or not). */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    def distinctAgg(c: String) =
      if (approx) approx_count_distinct(col(c), rsd = 0.02).as(s"nd_$c")
      else count_distinct(col(c)).as(s"nd_$c")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        distinctAgg(c),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one output row per profiled column (stack keeps this a
    // single-row local transform — no extra job)
    val arms = cols.map(c =>
      struct(lit(c).as("column_name"), col("n_rows"),
        col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val")))
    one.select(explode(array(arms: _*)).as("p")).select(col("p.*"))
  }

  /** Exact rank-based quantiles of numeric columns: per (column, q), the
    * value at 0-indexed rank floor((n-1) * q/100) in ascending order — the
    * one quantile definition every engine reproduces bit-for-bit (no
    * interpolation, no engine-specific midpoint rules), per the
    * rank-at-floor((n-1)q) convention.
    *
    * Computed by COUNTING, not global sorting: one shuffle builds a
    * (column, value) histogram, a per-column cumulative sum over DISTINCT
    * values finds the smallest value whose running count reaches the
    * target rank. The per-column window is serial in the column's DISTINCT
    * value count (vocabulary), never in its row count — fine for the
    * integer/categorical columns a profile targets; for huge-vocabulary
    * doubles at 100 TB use approx_percentile instead (one pass, no
    * window). Output: (column_name, q_pct, q_val DOUBLE). */
  def quantiles(df: DataFrame, cols: Seq[String], qPcts: Seq[Int]): DataFrame = {
    require(cols.nonEmpty && qPcts.nonEmpty, "quantiles of zero columns/points")
    val longRel = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("double").as("v"))): _*)).as("p"))
      .select(col("p.*")).filter(col("v").isNotNull)
      .persist() // histogram + per-column counts both read this
    val hist = longRel.groupBy("column_name", "v").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("column_name").orderBy("v")
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w)) // rows with value <= v
    val targets = longRel.groupBy("column_name").agg(count(lit(1)).as("n"))
      .select(col("column_name"), col("n"),
        explode(array(qPcts.map(q => lit(q)): _*)).as("q_pct"))
      .select(col("column_name"), col("q_pct"),
        floor((col("n") - 1) * col("q_pct") / 100.0).as("target"))
    val out = cum.join(targets, "column_name")
      .filter(col("cum") >= col("target") + 1) // first value reaching the rank
      .groupBy("column_name", "q_pct").agg(min(col("v")).as("q_val"))
    // cols x qPcts rows — cache the result, release the exploded relation
    graft.core.CacheOps.cacheResult(out, Seq(longRel))
  }

  /** Equi-width histogram of a numeric column in integer space: values
    * scale to longs by `scale` (1 for integer-valued columns, 100 for
    * cents-exact prices — the same integer-money trick as
    * [[graft.stats.Analytics]]), bounds come from one min/max aggregate,
    * and the bucket index is pure integer arithmetic
    * (`(v-lo)*nb / (hi-lo+1)`) — exact in any engine, so the whole
    * histogram is SQL-oracle checkable. Empty buckets are emitted with
    * n=0 (the histogram's SHAPE is the product, not just occupied cells).
    * Scale: one pass for bounds (2 longs to the driver via a single-row
    * broadcast), one map-side-combinable groupBy over nb keys. */
  def histogram(df: DataFrame, column: String, nBuckets: Int,
      scale: Long = 1L): DataFrame = {
    require(nBuckets >= 1, "at least one bucket")
    val v = round(col(column).cast("double") * scale).cast("long")
    val vals = df.select(v.as("v")).filter(col("v").isNotNull)
    val bounds = vals.agg(min("v").as("lo"), max("v").as("hi"))
    val spark = df.sparkSession
    // `div`, never `/`: Column./ is DOUBLE division, and floor of a double
    // quotient can be off by one exactly at bucket boundaries
    val counts = vals.crossJoin(broadcast(bounds))
      .select(expr(s"((v - lo) * $nBuckets) div (hi - lo + 1)").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val buckets = spark.range(nBuckets).select(col("id").as("bucket"))
    buckets
      .join(counts, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(bounds))
      .select(col("bucket"),
        expr(s"lo + (bucket * (hi - lo + 1)) div $nBuckets").as("bucket_lo"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** EQUI-DEPTH histogram — the dual of [[histogram]] and the statistic
    * query optimizers actually keep (equal-count buckets adapt to skew;
    * equal-width buckets collapse under it): boundaries are the exact
    * rank-at-floor((n−1)·i/nb) values (the [[quantiles]] machinery — a
    * distinct-value histogram + ONE cumulative window bounded by value
    * CARDINALITY, never row count), collected into a single broadcast
    * row; each row's bucket is then the map-side count of boundaries ≤ v
    * (values equal to a boundary go to the higher bucket — deterministic
    * under ties, so counts may legitimately diverge from n/nb on heavily
    * tied data: that divergence IS the skew signal). Integer space via
    * `scale`, same as [[histogram]]. Output: (bucket, lo, hi, n_rows) for
    * occupied buckets. */
  def equiDepthHistogram(df: DataFrame, column: String, nBuckets: Int,
      scale: Long = 1L): DataFrame = {
    require(nBuckets >= 2, "at least two buckets")
    val v = round(col(column).cast("double") * scale).cast("long")
    val vals = df.select(v.as("v")).filter(col("v").isNotNull)
    val hist = vals.groupBy("v").agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum", sum(col("cnt")).over(Window.orderBy("v")))
    val targets = vals.agg(count(lit(1)).as("n"))
      .select(explode(array((1 until nBuckets).map(lit(_)): _*)).as("i"),
        col("n"))
      .select(col("i"), floor((col("n") - 1) * col("i") / nBuckets).as("target"))
    val barr = cum.crossJoin(broadcast(targets))
      .filter(col("cum") >= col("target") + 1)
      .groupBy("i").agg(min("v").as("b"))
      .agg(array_sort(collect_list(struct(col("i"), col("b")))).as("bs"))
      .select(col("bs.b").as("barr"))
    vals.crossJoin(broadcast(barr))
      .select(col("v"),
        size(filter(col("barr"), b => b <= col("v"))).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n_rows"))
  }

  /** Profile DRIFT between two snapshots of the same relation — the
    * data-quality regression monitor a pipeline runs between ingests:
    * per column, the row/null/distinct deltas plus whether the min/max
    * moved. Two [[profile]] passes (each ONE aggregation job) and a
    * column_name equi-join over a |cols|-row relation — cost is two
    * scans regardless of column count, and the deltas stay integer-exact.
    * Output: (column_name, d_rows, d_nulls, d_distinct, min_changed,
    * max_changed). */
  /** Z-ORDER clustering extents — the multi-dimensional layout behind
    * lakehouse data skipping: grid-scale two key columns to `bits`-bit
    * coordinates (one broadcast max per column — the scale-once shape),
    * interleave their bits into the Morton z-value (pure codegen'd
    * shift/mask arithmetic, 2·bits terms, no UDF), and report each
    * fixed-width z-bucket's row count and per-dimension min/max extents.
    * The invariant that makes it a LAYOUT and not a curiosity: a z-range
    * bucket is a RECTANGLE in key space — with 2^`bucketBits` buckets,
    * each spans at most 2^(bits − bucketBits/2) grid cells PER DIMENSION
    * (spec-pinned), so per-file min/max stats prune scans on EITHER key.
    * At 100 TB the same z expression feeds `repartitionByRange(z)`
    * before the write; the extents this computes are exactly the
    * row-group stats the scan planner skips with. Output: (bucket,
    * n_rows, ga_min, ga_max, gb_min, gb_max). */
  def zorderExtents(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 8, bucketBits: Int = 6): DataFrame = {
    require(bits <= 16 && bucketBits <= 2 * bits && bucketBits % 2 == 0,
      "bits <= 16; even bucketBits <= 2*bits")
    val side = 1 << bits
    val bounds = df.agg(max(col(aCol)).as("amax"), max(col(bCol)).as("bmax"))
    val grid = df.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .crossJoin(broadcast(bounds))
      .select(expr(s"a * $side div (amax + 1)").as("ga"),
        expr(s"b * $side div (bmax + 1)").as("gb"))
    val z = (0 until bits).map(i =>
        shiftleft(shiftright(col("ga"), i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(col("gb"), i).bitwiseAND(lit(1L)), 2 * i + 1)))
      .reduce(_ bitwiseOR _)
    grid.withColumn("bucket", shiftright(z, 2 * bits - bucketBits))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("ga").as("ga_min"), max("ga").as("ga_max"),
        min("gb").as("gb_min"), max("gb").as("gb_max"))
  }

  /** Zone-map skipping report — the data-layout decision a 100 TB
    * lakehouse table lives or dies by, quantified: partition the rows
    * into `files` buckets under three candidate layouts (hash on the
    * key; range on the key; range on the PREDICATE column), record each
    * bucket's (min, max) zone map of the predicate column, and count the
    * buckets a reader with predicate `[lo, hi]` can skip without opening
    * (max < lo or min > hi — standard zone-map pruning, exactly what
    * parquet row-group stats and [[zorderExtents]]'s Morton layout feed).
    * The expected report: hash layout skips ~nothing (every bucket spans
    * the full value range), key-range skips only what key/value
    * correlation gives, value-range skips ~everything outside the
    * predicate — the measured argument for sort-before-write. ONE scan:
    * the three (layout, bucket) tags explode per row and one map-side-
    * combining aggregate reduces to 3 x files zone rows; everything after
    * is layout-sized. All integer (the value column must be integral).
    * Output: (layout, n_files, n_rows_hit, n_files_hit, n_files_skipped). */
  def zoneMapSkipping(df: DataFrame, keyCol: String, value: Column,
      lo: Long, hi: Long, files: Int = 64): DataFrame = {
    require(files >= 2 && lo <= hi, "need >= 2 files and lo <= hi")
    // keys/values assumed non-negative (fixture keys/cents are); a
    // production layout would range-partition by sort order instead of
    // equal-width arithmetic, with identical zone-map semantics
    val bounds = df.agg(max(col(keyCol).cast("long")).as("kmax"),
      max(value.cast("long")).as("vmax"))
    val fixed = df
      .select(col(keyCol).cast("long").as("k"), value.cast("long").as("v"))
      .crossJoin(broadcast(bounds))
      .select(col("v"), explode(array(
        struct(lit("hash_key").as("layout"),
          pmod(col("k"), lit(files.toLong)).as("bucket")),
        struct(lit("range_key").as("layout"),
          expr(s"k * $files div (kmax + 1)").as("bucket")),
        struct(lit("range_value").as("layout"),
          expr(s"v * $files div (vmax + 1)").as("bucket")))).as("t"))
      .select(col("v"), col("t.layout").as("layout"), col("t.bucket").as("bucket"))
    val zones = fixed.groupBy("layout", "bucket")
      .agg(count(lit(1)).as("n_rows"), min("v").as("vmin"), max("v").as("vmax"))
    zones
      .withColumn("hit", !(col("vmax") < lo || col("vmin") > hi))
      .groupBy("layout")
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("hit"), col("n_rows")).otherwise(0L)).as("n_rows_hit"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_files_hit"),
        sum(when(col("hit"), 0L).otherwise(1L)).as("n_files_skipped"))
  }

  /** Vocabulary growth (Heaps-law) profile — distinct-token count as the
    * corpus grows, the curve a tokenizer/budget planner reads before
    * committing a vocab size. Documents bucket into `nBuckets` equal
    * doc_id ranges (pure arithmetic on a broadcast max — no global
    * ranking window); each token charges its FIRST bucket (min doc_id,
    * one map-side-combining aggregate over the exploded stream — the
    * only wide exchange, keyed by token); cumulative sums run over the
    * nBuckets-row relation. Output: (bucket, n_docs_cum, vocab_cum). */
  def vocabGrowth(docs: DataFrame, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, "need at least two growth points")
    val bounds = docs.agg(max(col("doc_id")).as("dmax"))
    val bucketed = docs.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("text"),
        expr(s"doc_id * $nBuckets div (dmax + 1)").as("bucket"))
    val firstSeen = bucketed
      .select(col("bucket"), explode(graft.text.TextAnalysis.tokens(col("text")))
        .as("token"))
      .groupBy("token").agg(min("bucket").as("first_bucket"))
      .groupBy("first_bucket").agg(count(lit(1)).as("new_tokens"))
    val docCounts = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docCounts
      .join(firstSeen.withColumnRenamed("first_bucket", "bucket"),
        Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .select(col("bucket"),
        sum("n_docs").over(w).as("n_docs_cum"),
        sum("new_tokens").over(w).as("vocab_cum"))
  }

  def profileDiff(before: DataFrame, after: DataFrame,
      cols: Seq[String]): DataFrame = {
    val a = profile(before, cols).select(col("column_name"),
      col("n_rows").as("rb"), col("n_nulls").as("ub"),
      col("n_distinct").as("db"), col("min_val").as("mnb"), col("max_val").as("mxb"))
    val b = profile(after, cols).select(col("column_name"),
      col("n_rows").as("ra"), col("n_nulls").as("ua"),
      col("n_distinct").as("da"), col("min_val").as("mna"), col("max_val").as("mxa"))
    a.join(b, "column_name").select(col("column_name"),
      (col("ra") - col("rb")).as("d_rows"),
      (col("ua") - col("ub")).as("d_nulls"),
      (col("da") - col("db")).as("d_distinct"),
      (col("mna") =!= col("mnb")).as("min_changed"),
      (col("mxa") =!= col("mxb")).as("max_changed"))
  }

  /** Per-column FREQUENT VALUES: the top-k most common values of each
    * profiled column with deterministic (count desc, value asc) ranking —
    * the "top values" panel of a data-profiling report, and the input to
    * skew diagnosis (a hot join key shows up here first). Values render
    * to strings BEFORE grouping so one output schema serves any column
    * mix (integers render identically in any engine; keep floats out
    * where bit-exact reports matter).
    *
    * Shape: one stacked (column, value) Generate — constant fan-out per
    * row — then ONE hash aggregation over all columns together (map-side
    * combine collapses to the per-column value vocabularies), and a
    * per-COLUMN ranking window whose partition is that column's distinct
    * values, never the row count. For ultra-high-cardinality columns at
    * 100 TB, swap the window for the bounded top-k aggregator keyed by
    * column. Output: (column_name, rank, value, cnt). */
  def frequentValues(df: DataFrame, cols: Seq[String], k: Int = 5): DataFrame = {
    require(cols.nonEmpty && k >= 1, "need columns and a positive k")
    val longRel = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.*")).filter(col("value").isNotNull)
    val counts = longRel.groupBy("column_name", "value").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("column_name")
      .orderBy(col("cnt").desc, col("value"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("column_name", "rank", "value", "cnt")
  }

  /** Per-column Shannon entropy — the column-profiling staple ranking
    * columns by information content (a constant column reads 0 bits, a
    * key reads log2 n). Same long-relation shape as [[frequentValues]]:
    * one explode puts every (column, value) on a row, one hash aggregate
    * collapses to value counts, and the entropy reduces per column over
    * the value-cardinality-bounded relation. H = log2(n) − Σc·log2(c)/n
    * evaluates each log on an INTEGER count (the engines' log2 of the
    * same integer is the same double; only the k-term reduction varies,
    * absorbed by the standard round 6).
    * Output: (column_name, n_rows, n_distinct, entropy_bits). */
  def entropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val longRel = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.*")).filter(col("value").isNotNull)
    longRel.groupBy("column_name", "value").agg(count(lit(1)).as("c"))
      .groupBy("column_name")
      .agg(sum("c").as("n_rows"), count(lit(1)).as("n_distinct"),
        round(log2(sum("c")) -
          sum(col("c") * log2(col("c"))) / sum("c"), 6).as("entropy_bits"))
  }

  /** Pairwise correlation MOMENTS of integer-valued columns:
    * (col_x, col_y, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy) for every
    * unordered pair — everything Pearson's r needs, kept in exact BIGINT
    * space so the profile is engine-agnostic (the final float division is
    * the caller's one-liner; engines disagree only about float SUMMATION
    * order, which never happens here). Rows where either column is null
    * are dropped per pair (pairwise-complete semantics).
    *
    * One scan, one single-row aggregate: all pair moments land in one
    * `agg(...)` (map-side partials, a single reduced row), then the
    * per-pair rows unpivot from that row with a constant-size explode —
    * the same one-job shape as [[profile]]. Callers keep value ranges
    * where max|x|*max|y|*rows < 2^63; the intended columns are small
    * measures (quantities, line numbers, cents-scaled rates), not
    * surrogate keys. */
  def correlationMoments(df: DataFrame, cols: Seq[String],
      scales: Map[String, Long] = Map.empty): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    // scale ONCE in a projection: the 6-aggregates-per-pair fan-out below
    // would otherwise re-evaluate each round/cast chain ~(k-1)*6 times
    // per row inside the aggregate
    val scaled = df.select(cols.map(c =>
      round(col(c).cast("double") * scales.getOrElse(c, 1L))
        .cast("long").as(c)): _*)
    def v(c: String) = col(c)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def ok(p: (String, String)) = v(p._1).isNotNull && v(p._2).isNotNull
    val aggs = pairs.zipWithIndex.flatMap { case (p @ (x, y), pi) =>
      def g(col_ : org.apache.spark.sql.Column, nm: String) =
        sum(when(ok(p), col_).otherwise(lit(null))).as(s"_${pi}_$nm")
      Seq(
        count(when(ok(p), lit(1))).as(s"_${pi}_n"),
        g(v(x), "sx"), g(v(y), "sy"),
        g(v(x) * v(x), "sxx"), g(v(y) * v(y), "syy"),
        g(v(x) * v(y), "sxy"))
    }
    val one = scaled.agg(aggs.head, aggs.tail: _*)
    val rows = array(pairs.zipWithIndex.map { case ((x, y), pi) =>
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        col(s"_${pi}_n").as("n"),
        coalesce(col(s"_${pi}_sx"), lit(0L)).as("sum_x"),
        coalesce(col(s"_${pi}_sy"), lit(0L)).as("sum_y"),
        coalesce(col(s"_${pi}_sxx"), lit(0L)).as("sum_xx"),
        coalesce(col(s"_${pi}_syy"), lit(0L)).as("sum_yy"),
        coalesce(col(s"_${pi}_sxy"), lit(0L)).as("sum_xy"))
    }: _*)
    one.select(explode(rows).as("r")).select("r.*")
  }

  /** Exact per-group discrete quantiles WITHOUT sorting the data: the
    * group-partitioned generalization of [[quantiles]], built like
    * [[equidepthHistogram]] — aggregate to per-(group, value) counts
    * first, then cumulative window sums over that DISTINCT-VALUE
    * relation (bounded by value cardinality, never row count), then the
    * p-th quantile is the least value whose cumulative count reaches
    * ceil(n·p/100) — quantile_disc semantics, integer-exact. The naive
    * shape (rank window over raw rows) caps parallelism at the number
    * of groups and sorts every row; this one's only per-group sort
    * touches distinct values. `value` should be an integer-valued
    * expression (cents, counts) so engines cannot disagree.
    * Output: (group, n_rows, p<p> for each p). */
  def groupQuantiles(df: DataFrame, groupCol: String, value: Column,
      ps: Seq[Int] = Seq(50, 90)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 100),
      "percentiles must be in (0, 100]")
    val vc = df.select(col(groupCol).as("g"), value.cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val cum = vc
      .withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("v")))
      .withColumn("cnt", sum("c").over(Window.partitionBy("g")))
    val aggs = max("cnt").as("n_rows") +: ps.map { p =>
      // ceil(cnt*p/100) in integer space; cnt*p < 2^53 so the double
      // division truncates exactly
      val target = floor((col("cnt") * p + lit(99)) / lit(100)).cast("long")
      min(when(col("cum") >= target, col("v"))).as(s"p$p")
    }
    cum.groupBy(col("g").as(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Mergeable quantile SKETCH — deterministic hash-rank subsampling, the
    * sampling-based mergeable quantile summary (the random-sample branch of
    * the mergeable-summaries family alongside the KLL compactor),
    * derandomized the way this repo's CMS/HLL/KMV are: md5 is the sampling
    * coin, so runs, shards and the SQL oracle all draw the SAME sample.
    *
    * Every row's unique `key` hashes to 32 uniform bits; a row survives to
    * level j iff the low j bits are zero (P = 2^-j). Level-(j+1) survivors
    * are by construction a SUBSET of level-j survivors — that nesting is
    * the mergeability: shard summaries taken at different levels union by
    * filtering to the max level (one more hash-bit test, the compaction
    * step), exactly how a 1000-executor run combines per-partition
    * summaries; Spark's map-side combine performs it here. The level is
    * chosen per group as the least j with expected survivors n/2^j <= cap
    * — j = bit_length(ceil(n/cap) - 1) — so the summary is <= ~cap rows
    * per group at ANY n. A survivor carries weight 2^j; the estimated rank
    * of v is 2^j * |survivors <= v|, and the p-th quantile estimate is the
    * least survivor value whose estimated rank reaches ceil(n*p/100) (the
    * same quantile_disc convention as [[groupQuantiles]]), falling back to
    * the sample maximum when the sample's total estimated rank undershoots
    * the target (high p + sampling deficit).
    *
    * Rank-error bound as a function of cap: the estimated rank of v is
    * 2^j · Binomial(true_rank, 2^-j), so its standard deviation is
    * sqrt(2^j · true_rank) <= sqrt(2^j · n) <= n · sqrt(2/cap) (the level
    * rule keeps 2^j < 2n/cap). At the default cap = 512 that is ~6.3% of
    * n per sigma — the spec's 10%-of-n gate is ~1.6 sigma, and the md5
    * coin makes the draw deterministic, so the gate cannot flake. The
    * bound is DISTRIBUTION-FREE (it conditions only on true_rank, never
    * on the value layout); the generative suite (ProfileProps) pins the
    * implementation exactly — Spark output == a sequential mirror of the
    * same coin/level/weighted-rank algorithm — on the three shapes that
    * break sampling sketches: sorted runs, 90%-constant columns, and a
    * Zipf head with half the mass on one value.
    *
    * Two column-pruned scans at 100 TB: group counts (map-side combinable,
    * groups-sized) and the hash-filter scan that emits only ~cap rows per
    * group — the exact [[groupQuantiles]] shuffles every distinct value;
    * this is the variant a profiler can afford when value cardinality is
    * unbounded. `value` must be integer-valued; `key` must be unique per
    * row (a row id) — it is the sampling coin, not data.
    * Output: (group, n_rows, level, n_sample, p<p>_est per p). */
  def quantileSketch(df: DataFrame, groupCol: String, value: Column,
      key: Column, ps: Seq[Int] = Seq(50, 90, 99),
      cap: Int = 512): DataFrame = {
    require(cap >= 16, "cap too small to estimate anything")
    val base = df.select(col(groupCol).as("g"), value.cast("long").as("v"),
      sketchCoin(key).as("h"))
    // groups-sized, MATERIALIZED once (localCheckpoint): lv now has two
    // consumers (the survivor broadcast and the final zero-survivor
    // left join) — un-materialized, the second consumer would re-run the
    // group-count scan and break the two-fact-scan contract
    val lv = base.groupBy("g").agg(count(lit(1)).as("n_rows"))
      .withColumn("level", sketchLevel(col("n_rows"), cap))
      .select("g", "n_rows", "level")
      .localCheckpoint()
    val surv = base.join(broadcast(lv), Seq("g"))
      .filter(pmod(col("h"), sketchWeight) === 0)
      .select("g", "v", "n_rows", "level")
    quantileFromSurvivors(surv, lv, ps).withColumnRenamed("g", groupCol)
  }

  /** The sampling coin: 32 uniform md5 bits of the row key — shared
    * bit-for-bit by the batch sketch, the streaming intake and the SQL
    * oracle (the repo's standard derandomization). */
  private[graft] def sketchCoin(key: Column): Column =
    conv(substring(md5(key.cast("string")), 25, 8), 16, 10).cast("long")

  /** level = bit_length(ceil(n/cap) - 1): least j with n <= cap * 2^j. */
  private[graft] def sketchLevel(nRows: Column, cap: Int): Column = {
    val cd = floor((nRows + lit(cap - 1)) / lit(cap)).cast("long")
    when(cd <= 1, lit(0L)).otherwise(length(bin(cd - 1)).cast("long"))
  }

  /** Weight 2^level; level <= ~40 in any universe, the shift is safe. */
  private[graft] def sketchWeight: Column =
    expr("shiftleft(CAST(1 AS BIGINT), CAST(level AS INT))")

  /** The estimate tail over an already-drawn survivor sample — shared by
    * the batch sketch and the streaming intake (the stream-built summary
    * answers the batch query's oracle). `surv` = (g, v, n_rows, level)
    * survivor rows at the group's level, carrying their group's stats so
    * the level relation never re-joins into the survivor aggregation (one
    * lv join total — keeps the batch sketch at exactly two fact scans).
    * The OUTPUT derives from `lv` (g, n_rows, level) left-joined to the
    * survivor estimates: a group whose every coin misses at level >= 1
    * (possible — the coins are a deterministic hash) still reports its
    * row with n_sample = 0 and NULL estimates, never silently vanishing
    * from a one-row-per-group report. */
  private[graft] def quantileFromSurvivors(surv: DataFrame, lv: DataFrame,
      ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 100),
      "percentiles must be in (0, 100]")
    val w = sketchWeight
    val cum = surv
      .groupBy("g", "level", "n_rows", "v")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("v")))
    val pAggs = ps.map { p =>
      val target = floor((col("n_rows") * p + lit(99)) / lit(100)).cast("long")
      coalesce(min(when(col("cum") * w >= target, col("v"))), max("v"))
        .as(s"p${p}_est")
    }
    val aggs = (sum("c").as("n_sample") +: pAggs)
    val est = cum.groupBy("g").agg(aggs.head, aggs.tail: _*)
    lv.select("g", "n_rows", "level")
      .join(est, Seq("g"), "left")
      .select(Seq(col("g"), col("n_rows"), col("level"),
        coalesce(col("n_sample"), lit(0L)).as("n_sample")) ++
        ps.map(p => col(s"p${p}_est")): _*)
  }

  /** Robust per-group outlier statistics — median + MAD (median absolute
    * deviation), the estimator family that survives the contamination a
    * mean/stddev z-score is defeated by (one corrupt batch shifts a mean;
    * it cannot shift a median). Same distinct-value-histogram shape as
    * [[groupQuantiles]], applied TWICE: the per-(group, value) count
    * relation yields the median by cumulative window (value-cardinality
    * bounded), the derived |v − median| relation (built by joining the
    * medians back onto the SAME counts — never a second scan of the
    * fact rows) yields the MAD the identical way, and the outlier count
    * is one aggregate over counts with |v − median| > k·MAD. Medians are
    * quantile_disc (least value reaching ceil(n/2)) so everything stays
    * BIGINT-exact; `value` should be integer-valued.
    * Output: (group, n_rows, median, mad, n_outliers). */
  def robustOutliers(df: DataFrame, groupCol: String, value: Column,
      k: Int = 3): DataFrame = {
    require(k >= 1, "need a positive MAD multiplier")
    val vc = df.select(col(groupCol).as("g"), value.cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c")).persist()
    def discMedian(counts: DataFrame): DataFrame = counts
      .withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("v")))
      .withColumn("cnt", sum("c").over(Window.partitionBy("g")))
      .groupBy("g")
      .agg(max("cnt").as("n_rows"),
        min(when(col("cum") >=
          floor((col("cnt") + lit(1)) / lit(2)).cast("long"), col("v")))
          .as("med"))
    val med = discMedian(vc).select(col("g"), col("n_rows"),
      col("med").as("median"))
    val dev = vc.join(med, "g")
      .select(col("g"), abs(col("v") - col("median")).as("v"), col("c"))
      .groupBy("g", "v").agg(sum("c").as("c"))
    val mad = discMedian(dev).select(col("g"), col("med").as("mad"))
    val out = vc.join(med, "g").join(mad, "g")
      .groupBy("g")
      .agg(sum(when(abs(col("v") - col("median")) > lit(k) * col("mad"),
        col("c")).otherwise(lit(0L))).as("n_outliers"))
    med.join(mad, "g").join(out, "g")
      .select(col("g").as(groupCol), col("n_rows"), col("median"),
        col("mad"), col("n_outliers"))
  }

  /** Exact contingency table with marginals — the integer input every
    * categorical-association statistic (chi-square, mutual information,
    * Cramér's V) is computed FROM, emitted instead of the statistic so
    * the result stays BIGINT-exact in any engine. One hash aggregate
    * collapses the table to its cells; the marginal and total sums are
    * window sums OVER THE CELL RELATION, whose size is |X|·|Y| —
    * dimension-bounded, never data-bounded — so the global window is the
    * same documented dimension-sized pattern as the strata/bounds tables
    * elsewhere in this repo. NULL categories participate as their own
    * level (they aggregate and join into marginals like any value).
    * Output: (x, y, n_xy, n_x, n_y, n). */
  def contingency(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .select(col(xCol).cast("string").as("x"), col(yCol).cast("string").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    cells
      .withColumn("n_x", sum("n_xy").over(Window.partitionBy("x")))
      .withColumn("n_y", sum("n_xy").over(Window.partitionBy("y")))
      .withColumn("n", sum("n_xy").over(Window.partitionBy()))
  }

  /** Benford first-significant-digit profile — the fraud/synthetic-data
    * smell test: naturally occurring amounts follow P(d) = log10(1+1/d);
    * fabricated or truncated columns don't. One map-side first-digit
    * projection (string head of the positive integer value — no float
    * log in the digit extraction) + one 9-row aggregate; the share and
    * the expected share round 6, expected evaluated from the same
    * integer d in both engines. Zero/negative values are excluded (they
    * have no Benford digit). Output: (digit, n, pct, expected_pct). */
  def benford(df: DataFrame, valueCol: Column): DataFrame = {
    val digits = df.select(valueCol.cast("long").as("v"))
      .filter(col("v") > 0L)
      .select(substring(col("v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("total", sum("n").over(Window.partitionBy()))
    digits.select(col("digit"), col("n"),
      round(col("n").cast("double") / col("total"), 6).as("pct"),
      round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
        .as("expected_pct"))
  }

  /** Mutual information (and both marginal entropies) between two
    * categorical columns, composed ON TOP of [[contingency]] — the
    * association statistic itself, for when the caller wants the number
    * and not the table. Every log2 evaluates on an INTEGER count
    * (n_xy, n_x, n_y, n), so the per-cell terms are engine-identical
    * doubles and only the cell-count reduction varies — absorbed by the
    * standard round 6. The whole thing is one aggregate over the
    * dimension-bounded cell relation.
    * Output: one row (n, n_cells, mi_bits, h_x, h_y). */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val ct = contingency(df, xCol, yCol)
    val term = col("n_xy") * (log2(col("n_xy")) + log2(col("n")) -
      log2(col("n_x")) - log2(col("n_y")))
    ct.agg(max("n").as("n"), count(lit(1)).as("n_cells"),
      round(sum(term) / max("n"), 6).as("mi_bits"),
      round(log2(max("n")) -
        sum(col("n_xy") * log2(col("n_x"))) / max("n"), 6).as("h_x"),
      round(log2(max("n")) -
        sum(col("n_xy") * log2(col("n_y"))) / max("n"), 6).as("h_y"))
  }

  /** Two-sample Kolmogorov-Smirnov distance between the `valueCol`
    * distributions of two slices — the drift alarm that is sensitive to
    * SHAPE, not just moments (a variance swap with equal means sails
    * through a mean-drift check; it cannot pass KS). Exact-integer
    * construction: per-distinct-value counts for both slices in ONE
    * aggregate, cumulative window over the merged distinct-value
    * relation (value-cardinality bounded), and D's numerator is
    * max |cumA·nB − cumB·nA| — a BIGINT; only the final display ratio
    * divides. `valueCol` should be integer-valued (scale floats first).
    * Output: one row (n_a, n_b, d_num, d). */
  def ksDrift(df: DataFrame, sliceCol: String, sliceA: String,
      sliceB: String, valueCol: Column): DataFrame = {
    val vc = df.filter(col(sliceCol).isin(sliceA, sliceB))
      .select(col(sliceCol).as("s"), valueCol.cast("long").as("v"))
      .groupBy("v")
      .agg(sum(when(col("s") === sliceA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("s") === sliceB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vc.withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
      .withColumn("na", sum("ca").over(Window.partitionBy()))
      .withColumn("nb", sum("cb").over(Window.partitionBy()))
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        max(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double") / (col("n_a") * col("n_b")), 6)
          .as("d"))
  }

  /** Constraint-suite evaluation — the named-check verdict table a
    * pipeline gates ingests on (the declarative data-quality pattern:
    * each constraint yields a violation METRIC and a pass/fail verdict,
    * never a filtered copy of the data). All checks evaluate in ONE pass:
    * the optional FK check left-joins the fact to the DISTINCT dim keys
    * (broadcast at dim scale, shuffled at fact scale — AQE's call), and
    * every metric — row count, key-duplicate count, per-column null
    * counts, domain violations, sign violations, FK misses — lands in a
    * single aggregate over that relation (one scan, one join, one
    * reduced row; the lone `count_distinct` is the only Expand). The
    * constant-size verdict rows unpivot from the single aggregate row.
    * A domain violation is a NON-NULL value outside `domains(c)`
    * (missingness is `notNullCols`' job — keeps NULL semantics identical
    * across engines). Metrics are BIGINT counts; `passed` = metric == 0
    * (row_count: > 0).
    * Output: (check_name, metric, passed). */
  def qualityChecks(df: DataFrame, keyCol: String,
      notNullCols: Seq[String] = Nil,
      domains: Map[String, Seq[String]] = Map.empty,
      nonNegativeCols: Seq[String] = Nil,
      fk: Option[(String, DataFrame, String)] = None): DataFrame = {
    val joined = fk match {
      case Some((c, dim, dimKey)) =>
        df.join(dim.select(col(dimKey).as("_dim_key")).distinct(),
            df(c) === col("_dim_key"), "left")
          .withColumn("_fk_miss", col("_dim_key").isNull)
      case None => df.withColumn("_fk_miss", lit(false))
    }
    def viol(cond: org.apache.spark.sql.Column, nm: String) =
      sum(when(cond, 1L).otherwise(0L)).as(nm)
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      count_distinct(col(keyCol)).as("n_key"),
      viol(col("_fk_miss"), "fk_viol")) ++
      notNullCols.map(c => viol(col(c).isNull, s"null_$c")) ++
      domains.toSeq.sortBy(_._1).map { case (c, vs) =>
        viol(col(c).isNotNull && !col(c).isin(vs.map(lit): _*), s"dom_$c") } ++
      nonNegativeCols.map(c => viol(col(c) < 0, s"neg_$c"))
    val one = joined.agg(aggs.head, aggs.tail: _*)
    def check(nm: String, metric: org.apache.spark.sql.Column,
        passed: org.apache.spark.sql.Column) =
      struct(lit(nm).as("check_name"), metric.cast("long").as("metric"),
        passed.as("passed"))
    val rows =
      Seq(check("row_count", col("n_rows"), col("n_rows") > 0L),
        check(s"key_unique:$keyCol", col("n_rows") - col("n_key"),
          col("n_rows") === col("n_key"))) ++
      notNullCols.map(c =>
        check(s"not_null:$c", col(s"null_$c"), col(s"null_$c") === 0L)) ++
      domains.keys.toSeq.sorted.map(c =>
        check(s"domain:$c", col(s"dom_$c"), col(s"dom_$c") === 0L)) ++
      nonNegativeCols.map(c =>
        check(s"non_negative:$c", col(s"neg_$c"), col(s"neg_$c") === 0L)) ++
      fk.toSeq.map { case (c, _, dimKey) =>
        check(s"fk:$c->$dimKey", col("fk_viol"), col("fk_viol") === 0L) }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Exact single-column functional-dependency discovery: for every
    * ordered pair (X, Y) of the given columns, does X → Y hold — i.e.
    * does each X value map to exactly ONE Y value? The sibling dependency
    * class to the reference's inclusion dependencies (rdfind mines INDs;
    * FDs and UCCs are the other two classics of the same data-profiling
    * family), expressed over arbitrary relations.
    *
    * Shape chosen FOR scale: the naive plan (one aggregate with
    * `count_distinct(struct(x, y))` per pair) Expands every input row
    * p²+p times before the shuffle. Instead each row explodes into its
    * p·(p−1) (pair, x-value, y-value) instances and is immediately
    * `distinct()`-ed — the map-side partial aggregate collapses repeats
    * inside each task, so the ONE wide shuffle carries Σ|π_{X,Y}| rows
    * (the sum of distinct value-pair relations — vocabulary-sized), never
    * p²·N. Two narrow vocabulary-sized aggregates then reduce each pair
    * to a verdict: X → Y holds iff no X value owns two distinct Y values.
    * Values compare as strings (casts from the int/string/date columns a
    * profile targets are injective, so distinctness is preserved; skip
    * raw doubles, whose rendering is engine-specific).
    *
    * Output: (lhs, rhs, n_lhs = |π_X|, n_pairs = |π_{X,Y}|,
    * n_violations = n_pairs − n_lhs, holds), one row per ordered pair. */
  def functionalDeps(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "FD discovery needs at least two columns")
    // sf10-forced reshape (BASELINE.md round-11): the original
    // distinct-then-regroup paid TWO corpus-scale exchanges — distinct()
    // partitions on (lhs, rhs, lv, rv) and the per-lv regroup re-shuffles
    // the ~|Σ π_{X,Y}| distinct relation AGAIN on (lhs, rhs, lv), with
    // constant label strings riding every row (581 s / 4.4 GB at 15M
    // orders — 20x wall for 10x data; spill, not I/O). But the per-lv
    // count k is only consumed as sum(k) and max(k) <= 1, both derivable
    // from TWO GLOBAL distinct counts per arm: holds <=> |π_{X,Y}| ==
    // |π_X| and n_violations = their difference. So FD discovery takes
    // [[uniqueCombinations]]' measured-linear shape instead: one mixed
    // distinct over pair arms PLUS single-column arms (int arm ids, no
    // label strings on the wire), then a combinable groupBy(arm) whose
    // second exchange carries <= arms x partitions partial rows. The
    // arms-row count relation is COLLECTED (<= p²+p rows — arm-bounded,
    // never data-bounded) and the derivation runs on the driver: both
    // branches read one local array, so there is no cache to leak (the
    // earlier .cache() left one InMemoryRelation per invocation for the
    // life of the session) and the whole corpus-scale distinct executes
    // exactly once.
    val n = cols.size
    val pairArms = for { (x, i) <- cols.zipWithIndex;
        (y, j) <- cols.zipWithIndex if i != j } yield
      struct(lit(i * n + j).as("arm"), col(x).cast("string").as("v1"),
        col(y).cast("string").as("v2"))
    // single-column arms: v2 = "" cannot collide — the arm id disambiguates
    val singleArms = cols.zipWithIndex.map { case (x, i) =>
      struct(lit(-(i + 1)).as("arm"), col(x).cast("string").as("v1"),
        lit("").as("v2")) }
    val counts: Map[Int, Long] = df
      .select(explode(array((pairArms ++ singleArms): _*)).as("e"))
      .select(col("e.*"))
      .distinct()
      .groupBy("arm").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    import df.sparkSession.implicits._
    // empty input -> empty counts map: return zero rows (the pre-reshape
    // plan's behavior), never Map.apply on a missing arm
    val rows =
      if (counts.isEmpty) Seq.empty[(String, String, Long, Long, Long, Boolean)]
      else for { (x, i) <- cols.zipWithIndex;
          (y, j) <- cols.zipWithIndex if i != j } yield {
        val nPairs = counts.getOrElse(i * n + j, 0L)
        val nLhs = counts.getOrElse(-(i + 1), 0L)
        (x, y, nLhs, nPairs, nPairs - nLhs, nPairs == nLhs)
      }
    rows.toDF("lhs", "rhs", "n_lhs", "n_pairs", "n_violations", "holds")
  }

  /** Exact unique-column-combination discovery (arity ≤ 2): which single
    * columns and which column pairs form a key of the relation? A combo
    * is unique iff its distinct-value count equals the row count. Same
    * distinct-before-shuffle shape as [[functionalDeps]]: rows explode
    * into (combo, v1, v2) instances (singles carry v2 = "", which cannot
    * collide with pairs — the combo name disambiguates) and map-side
    * `distinct()` bounds the shuffle by the sum of the combos' distinct
    * counts. The row total joins in from a broadcast single-row aggregate
    * (the repo's documented scalar pattern).
    * Output: (combo, n_distinct, n_rows, is_unique). */
  def uniqueCombinations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "UCC discovery of zero columns")
    val singles = cols.map(c =>
      struct(lit(c).as("combo"), col(c).cast("string").as("v1"),
        lit("").as("v2")))
    val pairs = for { (x, i) <- cols.zipWithIndex; y <- cols.drop(i + 1) }
      yield struct(lit(s"$x,$y").as("combo"), col(x).cast("string").as("v1"),
        col(y).cast("string").as("v2"))
    val counts = df
      .select(explode(array((singles ++ pairs): _*)).as("e")).select(col("e.*"))
      .distinct()
      .groupBy("combo").agg(count(lit(1)).as("n_distinct"))
    val total = df.agg(count(lit(1)).as("n_rows"))
    counts.crossJoin(broadcast(total))
      .withColumn("is_unique", col("n_distinct") === col("n_rows"))
  }

  /** Exact equi-join cardinality statistic — |A ⋈ B on k| computed
    * WITHOUT executing the join: Σ over matching keys of cA(k)·cB(k),
    * plus the hottest key's contribution (the skew share an optimizer
    * weighs against broadcast/salting) and both sides' key cardinalities.
    * Each side collapses to its per-key count relation in one combinable
    * exchange and MATERIALIZES once (localCheckpoint, key-bounded) so the
    * key-cardinality aggregates don't re-scan the facts; the count-join
    * is key-vocabulary-sized. Requires max cA(k)·cB(k) and the total to
    * fit int64 — counts, not keys. Output one row: (join_rows,
    * n_matching_keys, max_key_rows, n_keys_a, n_keys_b). */
  def joinSize(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String): DataFrame = {
    // keys keep their native type: a cast would null out non-integral
    // keys and silently merge them into one group. Single-shot
    // checkpoints — ContextCleaner reclaims the blocks (see keySkew)
    val ca = a.groupBy(col(aKey).as("k"))
      .agg(count(lit(1)).as("ca")).localCheckpoint()
    val cb = b.groupBy(col(bKey).as("k"))
      .agg(count(lit(1)).as("cb")).localCheckpoint()
    val joined = ca.join(cb, "k")
      .agg(coalesce(sum(expr("ca * cb")), lit(0L)).as("join_rows"),
        count(lit(1)).as("n_matching_keys"),
        coalesce(max(expr("ca * cb")), lit(0L)).as("max_key_rows"))
    joined
      .crossJoin(broadcast(ca.agg(count(lit(1)).as("n_keys_a"))))
      .crossJoin(broadcast(cb.agg(count(lit(1)).as("n_keys_b"))))
  }

  /** k-anonymity audit — the release-governance check run before a table
    * leaves the pipeline: every quasi-identifier combination shared by
    * fewer than `k` rows is a re-identification risk and is reported with
    * its group size. ONE map-side-combinable exchange (the groupBy is the
    * whole plan); the violating-combo relation is bounded by the quasi
    * space, and the fraction |violators|/|groups| is the generalization
    * signal (high => coarsen a column, e.g. bucket the balance). Quasi
    * values stringify so mixed-type identifier sets share one schema.
    * Output: (q_<col>..., group_size), group_size < k. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long = 5L): DataFrame = {
    require(quasi.nonEmpty, "k-anonymity of zero quasi-identifiers")
    val qs = quasi.map(c => col(c).cast("string").as(s"q_$c"))
    df.select(qs: _*)
      .groupBy(quasi.map(c => col(s"q_$c")): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }

  /** Per-group empirical CDF over distinct values — the quantile-
    * normalization TRANSFORM TABLE of feature preprocessing (map a raw
    * feature to its within-group rank share before cross-group
    * comparison): cdf_e6 = 1e6 · |rows in group with value <= v| div
    * group_n, integer-exact in both engines. Emitted as the DISTINCT-
    * value relation (value-cardinality bounded — the same counting shape
    * as [[groupQuantiles]]: one combinable histogram exchange + a
    * per-group cumulative window over distinct values, never a row
    * sort); callers join it back onto rows map-side (broadcast at
    * dimension scale, shuffled at fact scale).
    * Output: (group, v, n_rows_le, group_n, cdf_e6). */
  def groupCdf(df: DataFrame, groupCol: String, value: Column): DataFrame = {
    val hist = df.select(col(groupCol).as("g"), value.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    hist
      .withColumn("n_rows_le",
        sum("c").over(Window.partitionBy("g").orderBy("v")))
      .withColumn("group_n", sum("c").over(Window.partitionBy("g")))
      .selectExpr(s"g AS $groupCol", "v", "n_rows_le", "group_n",
        "n_rows_le * 1000000 div group_n AS cdf_e6")
  }

  /** l-diversity audit — [[kAnonymity]]'s companion: a quasi group can be
    * large enough for k-anonymity yet expose its members anyway when
    * (nearly) everyone in it shares the SENSITIVE value; groups whose
    * sensitive attribute takes fewer than `l` distinct values report with
    * their size and diversity. One combinable groupBy with an exact
    * distinct (quasi-space-bounded relation), same stringified-quasi
    * schema as the k audit.
    * Output: (q_<col>..., group_size, n_distinct_sensitive), diversity < l. */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
      l: Long = 3L): DataFrame = {
    require(quasi.nonEmpty, "l-diversity of zero quasi-identifiers")
    val qs = quasi.map(c => col(c).cast("string").as(s"q_$c"))
    df.select(qs :+ col(sensitive).cast("string").as("_s"): _*)
      .groupBy(quasi.map(c => col(s"q_$c")): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col("_s")).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)
  }

  /** Join-key skew report — the "will this key hash-partition evenly"
    * advisor read before picking a shuffle key (a hot key here is the
    * argument for salting or an AQE skew-join). ONE map-side-combinable
    * exchange collapses the fact to per-key counts; the totals are an
    * aggregate OF that relation (broadcast back as one row) and the
    * top-k cut is TakeOrderedAndProject. share_e6 and the top-k
    * cumulative share are integer floor divisions both engines replicate;
    * the cumulative window runs over exactly k rows. Ties order by
    * (n desc, key asc), so the cut is deterministic.
    * Output: (rank, key, n, share_e6, cum_share_e6, n_keys, n_rows). */
  def keySkew(df: DataFrame, key: Column, k: Int = 20): DataFrame = {
    // per-key counts MATERIALIZE once (localCheckpoint, key-cardinality-
    // bounded): the totals aggregate otherwise re-scans the fact. Single-
    // shot checkpoint: the caller consumes the returned frame, so the
    // block cannot unpersist here — Spark's ContextCleaner reclaims it
    // once the result is released (unlike the ITERATIVE loops, which drop
    // superseded blocks eagerly)
    val counts = df.select(key.cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = counts.agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"))
    val w = Window.orderBy(col("n").desc, col("key"))
    counts.orderBy(col("n").desc, col("key")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum("n").over(
        Window.orderBy(col("n").desc, col("key"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .selectExpr("rank", "key", "n",
        "n * 1000000 div n_rows AS share_e6",
        "cum_n * 1000000 div n_rows AS cum_share_e6",
        "n_keys", "n_rows")
  }
}
