package graft.rdf

import graft.core.{StringTrie, TextKernel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's auxiliary statistics programs, re-expressed as single
  * DataFrame group-aggregations (reference `programs/CountConditions.scala`,
  * `programs/CountDistinctValues.scala`, `programs/CheckHashCollisions.scala`
  * — each was a full Flink job; here each is one declarative plan that
  * Catalyst runs with map-side partial aggregation automatically).
  */
object TripleStats {

  /** All six condition shapes with raw occurrence counts
    * (reference programs/CountConditions.scala:192-221). Codes are the
    * primary-attribute bitmasks: s=1, p=2, o=4 and their pairs 3/5/6. */
  def conditionOccurrences(triples: DataFrame): DataFrame = {
    val s = col("subj"); val p = col("pred"); val o = col("obj")
    val e = lit("")
    def c(code: Int, v1: org.apache.spark.sql.Column, v2: org.apache.spark.sql.Column) =
      struct(lit(code).as("cond_code"), v1.as("v1"), v2.as("v2"))
    triples
      .select(explode(array(
        c(1, s, e), c(2, p, e), c(4, o, e),
        c(3, s, p), c(5, s, o), c(6, p, o))).as("c"))
      .groupBy(col("c.cond_code").as("cond_code"), col("c.v1").as("v1"), col("c.v2").as("v2"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per condition type: #distinct conditions and #occurrences
    * (the `CountConditions` histogram rolled up by type). */
  def countConditions(triples: DataFrame): DataFrame =
    conditionOccurrences(triples)
      .groupBy("cond_code")
      .agg(count(lit(1)).as("n_conditions"), sum("cnt").as("n_occurrences"))

  /** Distinct values over all three positions, split ref-like vs literal
    * (reference programs/CountDistinctValues.scala:112-119; its URL-vs-literal
    * split maps to contains-':' on the derived vocabulary). */
  def countDistinctValues(triples: DataFrame): DataFrame =
    triples.select(col("subj").as("v"))
      .union(triples.select(col("pred")))
      .union(triples.select(col("obj")))
      .distinct()
      .agg(
        count(lit(1)).as("n_values"),
        sum(when(col("v").contains(":"), 1L).otherwise(0L)).as("n_refs"),
        sum(when(col("v").contains(":"), 0L).otherwise(1L)).as("n_literals"))

  /** Degree distribution of the RDF graph — the first structural profile
    * of an unknown triple corpus: how many subjects emit k triples
    * (out-degree) and how many objects receive k (in-degree). Two
    * two-level aggregate chains: the first shuffle is bounded by the
    * distinct node vocabulary (map-side combine collapses each node's
    * triples per task), the second by the distinct DEGREE values — a
    * histogram-sized relation. No window, no sort until the caller's
    * ORDER BY. Output: (side 'out'|'in', degree, n_nodes). */
  def degreeDistribution(triples: DataFrame): DataFrame = {
    def side(node: String, label: String) =
      triples.groupBy(col(node).as("node")).agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .select(lit(label).as("side"), col("degree"), col("n_nodes"))
    side("subj", "out").unionAll(side("obj", "in"))
  }

  /** Characteristic sets (Neumann & Moerkotte's RDF structure profile):
    * the distinct PREDICATE SET each subject carries, and how many
    * subjects share each set — the statistic RDF optimizers estimate
    * star-join cardinalities from, and the natural "what entity shapes
    * does this graph contain" summary. Two map-side-combinable
    * aggregates: distinct (subj, pred) → per-subject sorted predicate
    * array (collect_set + array_sort inside the aggregate — subjects
    * with thousands of predicates stay a single buffer entry each, the
    * array is predicate-vocabulary bounded) → count per serialized set.
    * Top-k by (n_subjects desc, set) via TakeOrderedAndProject.
    * Output: (char_set, set_size, n_subjects). */
  def characteristicSets(triples: DataFrame, k: Int = 50): DataFrame = {
    val dict = predDictionary(triples)
    if (dict.length <= 64) {
      // BITMASK path (sf10-forced, BASELINE.md round-11): the string path
      // below shuffles every distinct (subj, pred-string) pair — 2.6 GB in
      // ONE stage at 232M triples, wall 14x for 10x data. With the
      // name-sorted predicate dictionary broadcast as a literal, each
      // triple becomes (subj, bit) map-side and bit_or's partial combine
      // collapses to ONE long per subject per task BEFORE the exchange —
      // no distinct(), no collect_set buffers, no string preds on the
      // wire. Masks decode back to the identical space-joined sorted set
      // string on the mask-bounded relation (<= 2^|preds| rows, in
      // practice the handful of entity shapes the corpus contains).
      val masks = subjectPredMasks(triples, dict)
        .groupBy("m").agg(count(lit(1)).as("n_subjects"))
      val names = typedLit(dict.toSeq)
      val bits = typedLit(dict.indices.map(1L << _))
      val idxs = sequence(lit(0), lit(dict.length - 1))
      masks.select(
          concat_ws(" ", filter(
            transform(idxs, i => when(
              col("m").bitwiseAND(element_at(bits, i + 1)) =!= 0L,
              element_at(names, i + 1))),
            x => x.isNotNull)).as("char_set"),
          bit_count(col("m")).cast("long").as("set_size"),
          col("n_subjects"))
        .orderBy(col("n_subjects").desc, col("char_set")).limit(k)
    } else
      triples.select("subj", "pred").distinct()
        .groupBy("subj")
        .agg(concat_ws(" ", array_sort(collect_set(col("pred"))))
          .as("char_set"))
        .groupBy("char_set")
        .agg(count(lit(1)).as("n_subjects"))
        .select(col("char_set"),
          (size(split(col("char_set"), " "))).cast("long").as("set_size"),
          col("n_subjects"))
        .orderBy(col("n_subjects").desc, col("char_set")).limit(k)
  }

  /** The sorted predicate vocabulary — one column-pruned, map-side
    * combined distinct, PROBED with limit(65) so the driver never holds
    * more than 65 rows: the bitmask path only exists for <= 64
    * predicates, so if the probe comes back full the vocabulary is too
    * large and the caller takes the string path without ever collecting
    * it (the very corpus shape the string fallback guards against).
    * NAME-sorted so bit index order == lexicographic order — mask
    * decodes and bit-pair fan-outs are then automatically in the same
    * order the string path's array_sort produced. */
  private def predDictionary(triples: DataFrame): Array[String] = {
    import triples.sparkSession.implicits._
    triples.select("pred").distinct().orderBy("pred")
      .limit(65).as[String].collect()
  }

  /** Per-subject predicate bitmask against a name-sorted dictionary of
    * <= 64 predicates: (subj, bit_or of shiftleft(1, dict index)). The
    * partial bit_or combine is what keeps the exchange at one long per
    * subject per map task. */
  private def subjectPredMasks(triples: DataFrame,
      dict: Array[String]): DataFrame =
    triples.select(col("subj"),
        (array_position(typedLit(dict.toSeq), col("pred")) - 1)
          .cast("int").as("i"))
      .select(col("subj"), expr("shiftleft(CAST(1 AS BIGINT), i)").as("b"))
      .groupBy("subj").agg(expr("bit_or(b)").as("m"))

  /** Predicate co-occurrence — the pairwise marginal of
    * [[characteristicSets]]: for every unordered predicate pair, how many
    * subjects carry BOTH (the statistic a star-join selectivity estimate
    * multiplies from when full characteristic sets are too sparse). ONE
    * wide exchange: groupBy(subj) with a map-side-combining collect_set
    * (duplicates die before the shuffle), then unordered pairs explode
    * from each sorted per-subject array IN PLACE — the crossSourceOverlap
    * pattern — and only the tiny (pred_a, pred_b) relation aggregates
    * after it. The former distinct-then-self-join shape paid two wide
    * exchanges for the same candidates (measured at sf1: 1,272 MB total
    * shuffle, 10.1 s); per-subject fan-out stays bounded by the predicate
    * vocabulary — Σ(preds-per-subject choose 2), never |subjects|².
    * Output: (pred_a, pred_b, n_subjects). */
  def predicateCooccurrence(triples: DataFrame): DataFrame = {
    // Stays the single-exchange collect_set shape ON PURPOSE: a bitmask
    // variant sharing [[characteristicSets]]' (subj, long) exchange was
    // built and measured at the round-11 sf10 soak — this path was
    // already one exchange, so the bitmask only traded buffer width for
    // an extra dictionary job and read SLOWER in both clean sf10 runs
    // (61/103 s vs 40 s; wall at this scale is disk-band-dominated and
    // the compressed shuffle shrank just 7% — LZ4 already crushes the
    // repeated pred strings). characteristicSets keeps the bitmask
    // because there it deletes two whole exchanges; here it deleted
    // none. Measured both, kept the simpler plan (BASELINE.md r11).
    // (xxhash64(subj), subj) grouping: identical groups, but the
    // ObjectHashAggregate's sort-based fallback (always taken past 128
    // groups) gets an 8-byte discriminating prefix instead of the shared
    // "order:"/"lineitem:" string prefixes (see CindEngine's line
    // formation — same move, same measured mechanism)
    val sets = triples.select("subj", "pred")
      .withColumn("sh", xxhash64(col("subj")))
      .groupBy("sh", "subj").agg(array_sort(collect_set(col("pred"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    // shared element_at index-pair fan-out (graft.scale.Pairs) — the
    // transform-over-slice form this replaced copies the array tail per
    // element (measured 3x slower at the basket soak)
    sets.select(explode(graft.scale.Pairs.unorderedPairs(col("ps"))).as("p"))
      .groupBy(col("p.a").as("pred_a"), col("p.b").as("pred_b"))
      .agg(count(lit(1)).as("n_subjects"))
  }

  /** Hash collisions over the distinct value vocabulary
    * (reference programs/CheckHashCollisions.scala:46-73; hash-agnostic
    * semantics — we use a 16-bit md5 prefix so both Spark and any SQL oracle
    * compute the identical bucketing). */
  def hashCollisions(triples: DataFrame): DataFrame =
    triples.select(col("subj").as("v"))
      .union(triples.select(col("pred")))
      .union(triples.select(col("obj")))
      .distinct()
      .groupBy(substring(md5(col("v")), 1, 4).as("hash"))
      .agg(count(lit(1)).as("n_values"))
      .filter(col("n_values") > 1)

  /** Longest-prefix URL shortening via the ported StringTrie (reference
    * operators/ShortenUrls.scala:17-60 over util/StringTrie.scala). The trie
    * is built once on the driver and shipped in the UDF closure — the Spark
    * analog of Flink's broadcast-set + open() pattern. Bracketed terms
    * (`<url>`) are shortened with the brackets stripped, exactly like the
    * reference (ShortenUrls.scala:37-45); bare values use the same
    * longest-prefix rule directly. */
  def shortenTriples(triples: DataFrame, prefixes: Seq[(String, String)]): DataFrame = {
    val trie = new StringTrie[String]
    prefixes.foreach { case (url, ns) => trie.put(url, ns) }
    val shorten = udf { (v: String) =>
      val inner =
        if (v != null && v.length >= 2 && v.charAt(0) == '<' && v.endsWith(">"))
          v.substring(1, v.length - 1)
        else v
      val e = trie.longestPrefixEntry(inner)
      if (e == null) v else e._2 + inner.substring(e._1.length)
    }
    triples.select(
      shorten(col("subj")).as("subj"),
      col("pred"),
      shorten(col("obj")).as("obj"))
  }

  /** Fold non-ASCII values into ASCII via 7-bit chunking (reference
    * operators/AsciifyTriples.scala:10-46 — semantics matched char-for-char
    * by the TextKernel.asciify kernel). */
  def asciifyTriples(triples: DataFrame): DataFrame = {
    val a = udf(TextKernel.asciify _)
    triples.select(a(col("subj")).as("subj"), a(col("pred")).as("pred"),
      a(col("obj")).as("obj"))
  }

  /** `--apply-hash` (reference programs/RDFind.scala:274-282): replace each
    * term by a short deterministic hash token. We use a 4-hex-char md5
    * prefix instead of the reference's 2x 7-bit-masked chars — the masked
    * chars include NUL, which no columnar format or SQL oracle handles
    * sanely; the feature (deprecated in the reference) is lossy hashing
    * either way. */
  def applyHash(triples: DataFrame): DataFrame = {
    def h(c: String) = substring(md5(col(c)), 1, 4).as(c)
    triples.select(h("subj"), h("pred"), h("obj"))
  }

  /** Hash-dictionary compression round-trip (reference `--hash-dictionary`:
    * plan/FrequentConditionPlanner.scala:59-95 builds the dictionary,
    * operators/ConditionCompressor.scala + util/HashCollisionHandler.scala
    * compress with `#hash` / `~value` collision escapes, operators/
    * ConditionDecompressor.scala:15-54 joins the dictionary back).
    *
    * Values whose hash is unique compress to `#hash`; values sharing a
    * hash keep themselves escaped as `~value`. Decompression is a
    * per-column broadcast-or-shuffle join on the hash. Returns the
    * decompressed triples — equal to the input by construction, which is
    * exactly what the oracle checks.
    */
  def dictionaryRoundTrip(triples: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    val values = triples.select(explode(array(col("subj"), col("pred"), col("obj"))).as("v"))
      .distinct()
    // ONE distinct pass over the vocabulary feeds the collision set AND the
    // dictionary — persist it, or each derives its own distinct shuffle
    val hashed = values.withColumn("h", substring(md5(col("v")), 1, 6)).persist()
    val nVocab = hashed.count()
    // collision handling: a hash maps to its value only if unambiguous.
    // The AMBIGUOUS hashes are the tiny exception set (collisions of a
    // properly-sized hash over the vocabulary — cf. the reference's
    // HashCollisionHandler, which also special-cases them): broadcast that
    // set, so compression is decided MAP-SIDE per value and the triple
    // stream never joins the full dictionary on the compress side.
    val colliding = hashed.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("h").persist()
    val dict = hashed
      .join(broadcast(colliding.withColumnRenamed("h", "ch")),
        col("h") === col("ch"), "left_anti")
      .persist()
    dict.count() // materialize before the broadcast/join uses below
    // dict.count() was hashed's LAST consumer (colliding's cache filled on
    // the same pass via the broadcast build) — release it here instead of
    // leaking a vocabulary-scale cache for the session (VERDICT r13 #4)
    hashed.unpersist()
    def compress(c: String) = {
      val d = broadcast(colliding.select(col("h").as(s"ch_$c")))
      (df: DataFrame) => df.join(d, substring(md5(df(c)), 1, 6) === col(s"ch_$c"), "left")
        .withColumn(c, when(col(s"ch_$c").isNotNull, concat(lit("~"), col(c)))
          .otherwise(concat(lit("#"), substring(md5(col(c)), 1, 6))))
        .drop(s"ch_$c")
    }
    // no broadcast() hints on the DECOMPRESS joins: the dictionary is the
    // FULL distinct value vocabulary — forcing it onto the driver/executor
    // heap makes memory the scale bound. AQE broadcasts it when (and only
    // when) it is small; at scale these become plain shuffle joins, the
    // reference's own ConditionDecompressor coGroup shape.
    // SHUFFLE_HASH guard (VERDICT r13 #3 / ADVICE r13): a ShuffledHashJoin
    // build map cannot spill, so the hint is only safe while one
    // partition's dictionary slice fits executor memory. nVocab is already
    // counted above; gate on measured rows per post-shuffle partition
    // (default 2M rows/partition ≈ low hundreds of MB of 6-char hash +
    // value strings) — past it the join stays unhinted and the planner's
    // spill-safe sort-merge shape returns. Tunable:
    // spark.graft.rdf.decompressHashRowsPerPartition (0 disables the hint).
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toLong
    val rowsPerPartCap = spark.conf
      .getOption("spark.graft.rdf.decompressHashRowsPerPartition")
      .map(_.toLong).getOrElse(2000000L)
    val hintShuffleHash = nVocab <= rowsPerPartCap * math.max(1L, shufflePartitions)
    def decompress(c: String) = {
      // SHUFFLE_HASH on the dictionary side: the planner's default is a
      // sort-merge join, which sorts the full triple stream once per
      // column (3x) plus the dictionary each time. A per-partition hash
      // build of the dictionary slice skips all six sorts; the build side
      // is one partition's share of the value vocabulary — scale-safe for
      // the same reason the unhinted shuffle join was (it grows with data
      // but shrinks with partition count), unlike a broadcast, PROVIDED
      // the slice fits memory (guarded above — partition count is a
      // session conf, not data-driven). r13 plan diff: 3x SortMergeJoin
      // LeftOuter -> 3x ShuffledHashJoin, 8 Sorts -> 2 (only the caller's
      // final orderBy remains).
      val d0 = dict.select(col("h").as(s"h_$c"), col("v").as(s"v_$c"))
      val d = if (hintShuffleHash) d0.hint("SHUFFLE_HASH") else d0
      (df: DataFrame) => df.join(d,
          when(df(c).startsWith("#"), substring(df(c), 2, 6)).otherwise(lit(null)) === col(s"h_$c"),
          "left")
        .withColumn(c, when(df(c).startsWith("~"), expr(s"substring($c, 2)"))
          .otherwise(col(s"v_$c")))
        .drop(s"h_$c", s"v_$c")
    }
    val compressed = Seq("subj", "pred", "obj").map(compress).foldLeft(triples)((d, f) => f(d))
    val out = Seq("subj", "pred", "obj").map(decompress).foldLeft(compressed)((d, f) => f(d))
      .select("subj", "pred", "obj")
    // colliding + dict leaked for the session before r14; materialize the
    // result once and release them (CacheOps contract). The result here is
    // triple-scale, not a compact summary — lineage is kept and the cache
    // spills, so this trades one cached copy for zero leaked internals.
    graft.core.CacheOps.cacheResult(out, Seq(colliding, dict))
  }

  /** SPARQL-style basic-graph-pattern STAR match: subjects satisfying
    * ALL the (pred, obj) constraints, projected through `projectPred`'s
    * object — `?s p1 o1 . ?s p2 o2 . ?s projectPred ?v`. Each constraint
    * is a LEFT SEMI join on the subject against a predicate-filtered
    * triple slice (predicate filters push into the scan; nothing from
    * the probe sides materializes), so selective constraints prune
    * early exactly as a SPARQL engine's ordered BGP evaluation would.
    * Output: (subj, value). */
  def bgpStar(triples: DataFrame, constraints: Seq[(String, String)],
      projectPred: String): DataFrame = {
    val proj = triples.filter(col("pred") === projectPred)
      .select(col("subj"), col("obj").as("value"))
    constraints.foldLeft(proj) { case (acc, (p, o)) =>
      acc.join(
        triples.filter(col("pred") === p && col("obj") === o).select("subj"),
        Seq("subj"), "left_semi")
    }
  }

  /** SPARQL-style OPTIONAL clause over a star match: the required
    * pattern keeps its semantics, and `optionalPred`'s object attaches
    * by LEFT OUTER join — subjects without the optional triple survive
    * with a null (surfaced as `defaultValue`, since engines hash nulls
    * differently). The optional join never filters: exactly SPARQL's
    * OPTIONAL. Output: (subj, value, opt_value). */
  def bgpOptional(triples: DataFrame, constraints: Seq[(String, String)],
      projectPred: String, optionalPred: String,
      defaultValue: String = "__none__"): DataFrame = {
    val opt = triples.filter(col("pred") === optionalPred)
      .select(col("subj"), col("obj").as("opt_value"))
    bgpStar(triples, constraints, projectPred)
      .join(opt, Seq("subj"), "left")
      .select(col("subj"), col("value"),
        coalesce(col("opt_value"), lit(defaultValue)).as("opt_value"))
  }

  /** SPARQL-style NEGATION (MINUS / FILTER NOT EXISTS): star-match
    * subjects that do NOT carry the excluded (pred, obj) triple — a LEFT
    * ANTI join on the subject against the excluded slice (nothing from
    * the probe side materializes; the predicate filter pushes into the
    * scan). Output: (subj, value). */
  def bgpMinus(triples: DataFrame, constraints: Seq[(String, String)],
      projectPred: String, minusPred: String, minusObj: String): DataFrame =
    bgpStar(triples, constraints, projectPred)
      .join(
        triples.filter(col("pred") === minusPred && col("obj") === minusObj)
          .select("subj"),
        Seq("subj"), "left_anti")

  /** SPARQL property-path TRANSITIVE CLOSURE — `?s (p1|p2|...)+ ?d`:
    * every (subject, destination) pair connected by one or MORE hops
    * over the listed predicates, the path query a triple store answers
    * with an iterative fixpoint (the depth is data-dependent, so no
    * fixed join chain can express it). Semi-naive evaluation: the
    * frontier holds only the pairs DISCOVERED last round (new-length
    * paths), each round extends it by one equi-join against the edge
    * slice and anti-joins the accumulated closure so already-known
    * pairs never re-join — the classic Datalog delta iteration, whose
    * per-round shuffle tracks the NEW pairs, not the whole closure.
    * Both running relations localCheckpoint eagerly (plan must build on
    * materialized results, not O(depth²) unrolled lineage — same
    * discipline as the connected-components loop in
    * [[graft.dedup.Dedup]]); the superseded round's blocks drop
    * immediately. The per-round emptiness check is a driver-side count
    * over the (bounded) frontier — the fixpoint's termination test,
    * inherent to any closure evaluation. `maxHops` bounds runaway
    * cyclic inputs; the closure over a cycle still terminates naturally
    * because the anti-join empties the frontier once all reachable
    * pairs are known. Output: (subj, dest), distinct. */
  def pathClosure(triples: DataFrame, preds: Seq[String],
      maxHops: Int = 32): DataFrame = {
    require(preds.nonEmpty, "need at least one predicate")
    val edges = triples.filter(col("pred").isin(preds: _*))
      .select(col("subj"), col("obj").as("dest")).distinct().persist()
    val hop = edges.select(col("subj").as("dest"), col("dest").as("_next"))
    var reach = edges.localCheckpoint()
    var frontier = reach
    var hops = 1
    while (hops < maxHops && !frontier.isEmpty) {
      val extended = frontier.join(hop, Seq("dest"))
        .select(col("subj"), col("_next").as("dest")).distinct()
      val fresh = extended.join(reach, Seq("subj", "dest"), "left_anti")
        .localCheckpoint()
      val prev = reach
      reach = reach.unionAll(fresh).localCheckpoint()
      graft.scale.Checkpoints.drop(prev)
      if (frontier ne prev) graft.scale.Checkpoints.drop(frontier)
      frontier = fresh
      hops += 1
    }
    edges.unpersist()
    reach
  }

  /** SPARQL-style CHAIN (path) pattern:
    * `?s p1 ?x . ?x p2 ?y . ... ?z pN ?v` — the multi-hop traversal a
    * triple store answers with one hash join per hop, each on the
    * previous hop's object against the next predicate's subjects.
    * Predicate filters push into every scan; the intermediate relation
    * after each hop carries only (subj, frontier). Output: (subj, value)
    * — the start subject and the path's terminal object. */
  def bgpChain(triples: DataFrame, preds: Seq[String]): DataFrame = {
    require(preds.nonEmpty, "need at least one predicate hop")
    val first = triples.filter(col("pred") === preds.head)
      .select(col("subj"), col("obj").as("value"))
    preds.tail.foldLeft(first) { (acc, p) =>
      acc.join(
        triples.filter(col("pred") === p)
          .select(col("subj").as("value"), col("obj").as("_next")),
        Seq("value"))
        .select(col("subj"), col("_next").as("value"))
    }
  }
}
