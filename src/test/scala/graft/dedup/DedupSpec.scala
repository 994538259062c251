package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  lazy val realDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("exactDups keeps the smallest doc_id per content group") {
    val r = Dedup.exactDups(docs((1L, "same text here"), (2L, "same text here"),
      (3L, "other"))).collect().map(x => (x.getLong(0), x.getBoolean(2))).toMap
    assert(r == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("incrementalDedup: delta probes corpus only, best match, ties to min id") {
    // corpus: 1 and 2 identical, 3 distinct; delta: 100 duplicates 1/2
    // (tie -> dup_of 1), 101 near-dups 3 (3 of 4 shingles -> 75%), 102 is
    // novel (absent), 103 duplicates 1/2 but must NEVER match fellow
    // delta doc 100 (corpus-only probing)
    val d = docs(
      (1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w4"), (3L, "q r s t u"),
      (100L, "w1 w2 w3 w4"), (101L, "q r s t u v"), (102L, "zz yy xx ww"),
      (103L, "w1 w2 w3 w4"))
    val r = Dedup.incrementalDedup(d, col("doc_id") >= 100, 50)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1).toSeq
    assert(r == Seq((100L, 1L, 100L), (101L, 3L, 75L), (103L, 1L, 100L)))
  }

  test("jaccardPairs finds overlapping docs with exact similarity") {
    // doc1/doc2 share most trigram shingles; doc3 shares none
    val r = Dedup.jaccardPairs(docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"), (3L, "p q r s t u v w")), 50)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L)
    // 6 shingles each; 5 shared -> jaccard = 5/7 = 71%
    assert(row.getLong(2) == 5L && row.getLong(5) == 71L)
  }

  test("minhashLshPairs EQUALS exact jaccardPairs on the fixture (oracle precondition)") {
    // deterministic signatures (xxhash64) + exact verification of the
    // candidates: on this fixture the banding misses no qualifying pair, so
    // the full rows (counts, sizes, jaccard) must be identical — this is
    // what licenses giving dedup_minhash_pairs the exact-Jaccard oracle
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val exact = Dedup.jaccardPairs(realDocs, 50).collect().map(key).toSet
    val lsh = Dedup.minhashLshPairs(realDocs, 50).collect().map(key).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    assert(lsh == exact, s"\nmissed=${exact -- lsh}\nextra=${lsh -- exact}")
  }

  test("hot-shingle cap drops boilerplate shingles and bounds the self-join") {
    // 30 docs share identical boilerplate ("x y z w" -> shingles "x y z",
    // "y z w" with df=30); their tails are unique. Uncapped, the boilerplate
    // alone pairs every doc with every other (C(30,2) join groups); capped
    // at 10, the hot shingles vanish and no pair reaches 20% Jaccard.
    val skewed = docs((1L to 30L).map(i => (i, s"x y z w u$i v$i t$i")): _*)
    val uncapped = Dedup.jaccardPairs(skewed, 20, maxShingleDf = Int.MaxValue)
    assert(uncapped.count() == 435L) // 30*29/2 — the quadratic blow-up
    val capped = Dedup.jaccardPairs(skewed, 20, maxShingleDf = 10)
    assert(capped.count() == 0L)
    // docs overlapping beyond the boilerplate are still found
    val withDup = docs(((1L to 30L).map(i => (i, s"x y z w u$i v$i t$i")) :+
      (99L, "x y z w u1 v1 t1")): _*)
    val pairs = Dedup.jaccardPairs(withDup, 50, maxShingleDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 99L)))
  }

  test("duplicateClusters finds transitive components; singletons keep themselves") {
    // 1~2 and 2~3 are exactly 50% shingle-Jaccard, 1~3 only 20%: the cluster
    // {1,2,3} exists only through transitivity (label must propagate 2 hops)
    val d = docs((1L, "a b c d e"), (2L, "b c d e f"), (3L, "c d e f g"),
      (9L, "z y x w v"))
    val out = Dedup.duplicateClusters(d, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (9L, 9L, true)))
  }

  test("ngramWindowDups: cross-doc windows only, short docs 0/0, self-repeats ignored") {
    val r = Dedup.ngramWindowDups(docs(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // 8 windows, shares "w3 w4 w5"
      (2L, "w3 w4 w5 x y z"),                 // 4 windows, 1 shared
      (3L, "short doc"),                      // < n tokens -> 0/0
      (4L, "r r r r")), 3)                    // "r r r" twice, SAME doc: not shared
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((8L, 1L)), 2L -> ((4L, 1L)),
      3L -> ((0L, 0L)), 4L -> ((2L, 0L))))
  }

  test("canonicalDocs: longest member wins, ties to smallest id, singletons self-elect") {
    import spark.implicits._
    // cluster {1,2,3} via transitivity (same texts as the clusters test);
    // doc 3 is longest; 9 is a singleton
    val d = Seq(
      (1L, "a b c d e", 9L), (2L, "b c d e f", 9L), (3L, "c d e f gg", 10L),
      (9L, "z y x w v", 9L)).toDF("doc_id", "text", "n_chars")
    val out = Dedup.canonicalDocs(d, 50).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    assert(out == Set((1L, 3L, 3L, 10L), (9L, 9L, 1L, 9L)))
    // tie case: equal lengths -> smallest doc_id
    val tie = Seq((5L, "m n o p q", 9L), (6L, "n o p q m", 9L))
      .toDF("doc_id", "text", "n_chars")
    val t = Dedup.canonicalDocs(tie, 50).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(t.contains((5L, 5L)))
  }

  test("simhash: identical docs collide, near-dups are close, signatures via SQL too") {
    val sigs = Dedup.simhashSignatures(docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "a b c d e f g x")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 16)
    val pairs = Dedup.simhashPairs(docs((1L, "a b c d e f g h"), (2L, "a b c d e f g h")), 0)
      .collect()
    assert(pairs.length == 1 && pairs.head.getInt(2) == 0)
    // the Catalyst expression is SQL-callable through GraftExtensions
    val ext = new graft.plans.GraftExtensions
    // function registration happens at session build; simulate via expression parity
    val viaExpr = Dedup.simhashSignatures(docs((9L, "x y z"))).collect().head.getLong(1)
    assert(viaExpr != 0L)
  }

  test("paragraphDedup: global first occurrence keeps, later repeats drop, order survives") {
    // span=3: doc1 = [a b c][d e f]; doc2 repeats chunk "a b c" (drops) and
    // adds [x y z]; doc3 has a partial tail chunk [d] (unique -> kept) after
    // a repeated head; doc4 repeats a chunk WITHIN itself
    val r = Dedup.paragraphDedup(docs(
      (1L, "a b c d e f"), (2L, "a b c x y z"),
      (3L, "a b c d"), (4L, "p q r p q r")), span = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((2L, 2L, "a b c d e f")))
    assert(r(2L) == ((2L, 1L, "x y z")))
    assert(r(3L) == ((2L, 1L, "d")))
    assert(r(4L) == ((2L, 1L, "p q r")))
  }

  test("paragraphDedup: a fully-duplicated document reassembles to the empty string") {
    val r = Dedup.paragraphDedup(docs((1L, "a b c"), (2L, "a b c")), span = 3)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r(1L) == "a b c" && r(2L) == "")
  }

  def srcDocs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("crossSourceOverlap: distinct shared windows per unordered source pair") {
    // n=2 windows; "b c" occurs in A (twice, counted once) and B; "c d" in
    // B only; C shares nothing; a window in all of A,B,D yields 3 pairs
    val r = Dedup.crossSourceOverlap(srcDocs(
      (1L, "a b c", "A"), (2L, "z b c", "A"), // "b c" twice in A
      (3L, "b c d", "B"),
      (4L, "x y", "C"),
      (5L, "b c q", "D")), n = 2)
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    assert(r == Map(("A", "B") -> 1L, ("A", "D") -> 1L, ("B", "D") -> 1L))
  }

  test("crossSourceOverlap: docs shorter than the window contribute nothing") {
    val r = Dedup.crossSourceOverlap(srcDocs(
      (1L, "a", "A"), (2L, "a", "B")), n = 2).collect()
    assert(r.isEmpty)
  }

  test("paragraphDedup EQUALS the sequential brute force on the real corpus") {
    // the in-test oracle replays the corpus one doc at a time in
    // (doc_id, idx) order with a mutable seen-set — the textbook
    // formulation the distributed min-struct election must reproduce
    val span = 5
    val all = realDocs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.HashSet[String]()
    val expected = all.map { case (id, text) =>
      val chunks = text.split(" ", -1).grouped(span).map(_.mkString(" ")).toSeq
      val kept = chunks.filter(seen.add)
      id -> ((chunks.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = Dedup.paragraphDedup(realDocs, span).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(got == expected)
    // the dedup actually fired on this corpus (otherwise the test is vacuous)
    assert(got.values.exists(v => v._2 < v._1))
  }

  test("containmentPairs: a quoted sub-document scores containment 100 where Jaccard misses it") {
    // doc 2 is doc 1's text embedded in a much longer document: every
    // shingle of 1 appears in 2 (containment 100) but the union is large
    val small = "q1 q2 q3 q4 q5"
    val fix = docs(
      (1L, small),
      (2L, s"p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 $small r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"),
      (3L, "z1 z2 z3 z4 z5"))
    // Jaccard at 50% finds nothing (3 shared shingles / 25 union = 12%)
    assert(Dedup.jaccardPairs(fix, 50).count() == 0L)
    val r = Dedup.containmentPairs(fix, 80).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // ONE directed row: 1 contained in 2 (3/3 shingles), never the reverse
    assert(r.toSeq == Seq((1L, 2L, 3L, 3L, 100L)))
  }

  test("dupSpans merges overlapping and ADJACENT duplicated windows into maximal spans") {
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val c12 = toks("c", 12); val a8 = toks("a", 8); val b8 = toks("b", 8)
    val fix = docs(
      (1L, c12),                      // 12-token block shared with doc 2
      (2L, s"$c12 u1 u2"),            // same block + unique tail
      (3L, s"$a8 x1 x2 $b8"),         // two shared blocks split by a gap
      (4L, s"$a8 q1 q2 q3"),          // carries A only
      (5L, s"$b8 r1 r2 r3"),          // carries B only
      (6L, s"$a8 $b8"),               // A then B back-to-back: adjacency merge
      (7L, "too short"),              // < n tokens: no windows at all
      (8L, s"${toks("m", 8)} ${toks("m", 8)}")) // intra-doc repeat only: excluded
    val got = Dedup.dupSpans(fix, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = Set(
      (1L, 1L, 12L, 12L), (2L, 1L, 12L, 12L),
      (3L, 1L, 8L, 8L), (3L, 11L, 18L, 8L), // gap splits two islands
      (4L, 1L, 8L, 8L), (5L, 1L, 8L, 8L),
      (6L, 1L, 16L, 16L))                   // starts 1 and 9 fuse (9 <= 8+1)
    assert(got == want)
  }

  test("vocabOverlap: distinct-token intersections and integer Jaccard per source pair") {
    import spark.implicits._
    val fix = Seq(
      (1L, "a b c d", "s1"), (2L, "a a b", "s1"), // s1 vocab {a,b,c,d}
      (3L, "a b x", "s2"),                        // s2 vocab {a,b,x}
      (4L, "z", "s3"))                            // s3 vocab {z} — no overlap
      .toDF("doc_id", "text", "source")
    val r = Dedup.vocabOverlap(fix).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    // one qualifying pair: {a,b} shared, jaccard = 2/5 = 40%
    assert(r.toSeq == Seq(("s1", "s2", 2L, 4L, 3L, 40L)))
  }

  test("windowNovelty: owners score their windows, restatements score zero") {
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val a10 = toks("a", 10)
    val fix = docs(
      (1L, a10),                    // owns its 3 windows
      (2L, a10),                    // pure restatement of doc 1: 0 novel
      (3L, s"$a10 ${toks("b", 8)}"), // restated prefix + a novel tail
      (4L, "short"))                // no windows at all
    val got = Dedup.windowNovelty(fix, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 3: 11 windows (18 tokens); starts 1..3 are doc 1's, 4..11 novel
    assert(got == Map(
      1L -> ((3L, 3L)), 2L -> ((3L, 0L)),
      3L -> ((11L, 8L)), 4L -> ((0L, 0L))))
  }

  test("cleanDupSpans keeps exactly one occurrence of each duplicated region (the owner's)") {
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val c12 = toks("c", 12); val a8 = toks("a", 8); val b8 = toks("b", 8)
    val fix = docs(
      (1L, c12), (2L, s"$c12 u1 u2"),
      (3L, s"$a8 x1 x2 $b8"), (4L, s"$a8 q1 q2 q3"), (5L, s"$b8 r1 r2 r3"),
      (6L, s"$a8 $b8"), (7L, "too short"),
      (8L, s"${toks("m", 8)} ${toks("m", 8)}"))
    val got = Dedup.cleanDupSpans(fix, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // owners (min doc_id per window: 1 for C, 3 for A and B) keep their
    // text; every other copy loses the span; doc 6 empties entirely
    assert(got == Map(
      1L -> ((12L, 12L, c12)),
      2L -> ((14L, 2L, "u1 u2")),
      3L -> ((18L, 18L, s"$a8 x1 x2 $b8")),
      4L -> ((11L, 3L, "q1 q2 q3")),
      5L -> ((11L, 3L, "r1 r2 r3")),
      6L -> ((16L, 0L, "")),
      7L -> ((2L, 2L, "too short")),
      8L -> ((16L, 16L, s"${toks("m", 8)} ${toks("m", 8)}"))))
  }

  test("cleanDupSpans strongHash (md5 keys) is result-identical to the 64-bit path") {
    // the collision-safe cleaning-grade key must change NOTHING below
    // collision scale — same spans, same rewrites, byte for byte
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val c12 = toks("c", 12); val a8 = toks("a", 8)
    val fix = docs(
      (1L, c12), (2L, s"$c12 u1 u2"), (3L, s"$a8 x1 $a8"),
      (4L, s"$a8 q1 q2"), (5L, "too short"))
    def rows(strong: Boolean) =
      Dedup.cleanDupSpans(fix, 8, strongHash = strong).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1).toSeq
    assert(rows(strong = true) == rows(strong = false))
    val spans = Dedup.dupSpans(fix, 8, strongHash = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => x).toSeq
    val spans64 = Dedup.dupSpans(fix, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => x).toSeq
    assert(spans == spans64 && spans.nonEmpty)
  }

  test("sourceDupReport: per-source dup mass; cross-source repeats count in both") {
    import spark.implicits._
    val d = Seq(
      (1L, "dup", "web"), (2L, "dup", "web"), (3L, "solo", "web"),
      (4L, "dup", "books"))   // same text, other source: unique THERE
      .toDF("doc_id", "text", "source")
    val r = Dedup.sourceDupReport(d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r == Map("web" -> ((3L, 2L, 1L)), "books" -> ((1L, 1L, 0L))))
  }

  test("editNeighborPairs matches the all-pairs levenshtein==1 oracle") {
    import spark.implicits._
    // substitutions (abc/abd), insert/delete (abc/abcd, abc/ab), a
    // multi-key false-positive candidate (abc/acb shares TWO deletion
    // keys but is distance 2), and an equal-name pair (7/8) which is
    // exact-dup territory, not linkage
    val names = Seq(1L -> "abc", 2L -> "abd", 3L -> "abcd", 4L -> "ab",
      5L -> "acb", 6L -> "xyz", 7L -> "same", 8L -> "same")
    val df = names.toDF("id", "name")
    val got = Dedup.editNeighborPairs(df, "id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) == 1
    } yield (ia, ib)).sorted
    assert(got == want)
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) &&
      got.contains((1L, 4L)) && !got.contains((1L, 5L)) &&
      !got.contains((7L, 8L)))
  }
}
