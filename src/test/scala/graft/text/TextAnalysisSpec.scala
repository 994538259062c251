package graft.text

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import TextAnalysis._

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("tokenStats counts tokens, distincts, chars, stopwords") {
    val r = tokenStats(docs((1L, "the fast fox the end"))).collect().head
    assert(r.getInt(1) == 5)            // n_tokens
    assert(r.getInt(2) == 4)            // n_distinct ("the" twice)
    assert(r.getInt(3) == 20)           // n_chars
    assert(r.getInt(4) == 4)            // max token len
    assert(r.getInt(5) == 2)            // stopwords ("the" x2)
  }

  test("langId picks argmax with alphabetical tiebreak") {
    // "table value" -> fr:2; "hash sort" -> zh:2; empty -> all 0 -> de first
    val r = langId(docs((1L, "table value join"), (2L, "hash sort sort"),
      (3L, "xyz"))).collect().map(x => x.getLong(0) -> ((x.getString(1), x.getInt(2)))).toMap
    assert(r == Map(1L -> (("fr", 2)), 2L -> (("zh", 3)), 3L -> (("de", 0))))
  }

  test("shingles produce n-2 trigrams; fingerprint is min md5") {
    import org.apache.spark.sql.functions.col
    val s = docs((1L, "a b c d")).select(shingles(col("text"))).collect().head.getSeq[String](0)
    assert(s == Seq("a b c", "b c d"))
    val fp = fingerprint(docs((1L, "a b c d"))).collect().head.getString(1)
    val md5s = Seq("a b c", "b c d").map(x =>
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes)
        .map("%02x".format(_)).mkString)
    assert(fp == md5s.min)
    // stable under a tail edit that keeps some shingles
    val fp2 = fingerprint(docs((1L, "a b c d zz"))).collect().head.getString(1)
    assert(fp2 <= fp) // min over a superset can only stay or shrink
  }

  test("qualityScore buckets") {
    val r = qualityScore(docs(
      (1L, "x y"),                                  // <10 tokens -> 0
      (2L, Seq.fill(20)("w").mkString(" ")),        // repetition 95% -> 1
      (3L, (1 to 20).map(i => s"t$i").mkString(" ")))) // clean -> 3
      .collect().map(x => (x.getLong(0), x.getInt(4))).toMap
    assert(r == Map(1L -> 0, 2L -> 1, 3L -> 3))
  }

  test("bigramScore: common-pattern docs outscore word salad; short docs get 0") {
    import spark.implicits._
    // "a b" appears in 3 docs (count 3, log2 -> 1 per hit); doc 3's bigrams
    // are unique (count 1, log2 -> 0); doc 4 has one token -> no bigrams
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"), (4L, "solo"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramScore(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // doc 1: bigrams "a b"(3) + "b c"(2) -> floor(log2(3)) + floor(log2(2)) = 1 + 1
    assert(r(1L) == ((2L, 2L)) && r(2L) == ((2L, 2L)))
    assert(r(3L) == ((2L, 0L))) // "x y","y z" unique -> log2(1) = 0
    assert(r(4L) == ((0L, 0L)))
  }

  test("lmBits: conditional surprisal normalizes by prefix frequency") {
    import spark.implicits._
    // model: "a b" n=3, "b a" n=1, "a z" n=1; prefix c1: a=4, b=1; V=3
    // bits("a b") = floor(log2((4+3)*1024 div 4)) = floor(log2(1792)) = 10
    // bits("b a") = floor(log2((1+3)*1024 div 2)) = log2(2048) = 11
    // bits("a z") = floor(log2((4+3)*1024 div 2)) = floor(log2(3584)) = 11
    // -> the rare continuation of the common prefix ("a z") costs MORE
    // than the common one ("a b"), unlike the unconditioned bigramScore
    val d = Seq((1L, "a b a b"), (2L, "a b"), (3L, "a z"), (4L, "solo"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.lmBits(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(1L) == ((3L, 31L, 10333L))) // a b x2 (20) + b a (11)
    assert(r(2L) == ((1L, 10L, 10000L)))
    assert(r(3L) == ((1L, 11L, 11000L)))
    assert(r(4L) == ((0L, 0L, 0L)))
  }

  test("tfIdf ranks rare terms above common ones with integer scores") {
    // 4 docs: "rare" appears in 1 doc (idf=floor(log2(4))=2), "the" in all
    // 4 (idf=0); doc 1's top term must be "rare" with score tf*2
    val d = docs(
      (1L, "the rare rare the"), (2L, "the x"), (3L, "the y"), (4L, "the z"))
    val top = TextAnalysis.tfIdf(d, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(top((1L, 1)) == (("rare", 4L))) // tf=2 * idf=2
    // "the" scores 0 everywhere (idf = floor(log2(4/4)) = 0)
    assert(top.collect { case ((_, _), ("the", s)) => s }.forall(_ == 0L))
  }

  test("vocabTopK: counts across docs, rank ties break on token asc, k cap") {
    val r = vocabTopK(docs(
      (1L, "b a a c"), (2L, "a b d d"), (3L, "d c")), 3)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
    // counts: a=3, d=3, b=2, c=2 -> top-3 = a(3), d(3), b(2)
    assert(r.toSeq == Seq((1, "a", 3L), (2, "d", 3L), (3, "b", 2L)))
  }

  test("heavyHitters: exact tokens at/above ceil(phi*N), threshold edges") {
    // N = 20 tokens; phi = 0.25 -> threshold ceil(5) = 5
    // a x6 (above), b x5 (exactly at -> included), c x4 (below), rest singletons
    val text = (Seq.fill(6)("a") ++ Seq.fill(5)("b") ++ Seq.fill(4)("c") ++
      Seq("d", "e", "f", "g", "h")).mkString(" ")
    val r = heavyHitters(docs((1L, text)), 0.25, cap = 8)
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(("a", 6L), ("b", 5L)))
  }

  test("heavyHitters survives an adversarial tail larger than the sketch cap") {
    // 400 distinct singleton tokens (>> cap=128) + one heavy token: the
    // MG trims must never evict the heavy hitter (guarantee: undercount
    // <= N/(cap+1) < phi*N)
    val tail = (0 until 400).map(i => f"t$i%03d")
    val text = (tail ++ Seq.fill(40)("heavy")).mkString(" ")
    // N = 440, phi = 0.05 -> threshold ceil(22) = 22: only "heavy"
    val r = heavyHitters(docs((1L, text)), 0.05, cap = 128).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("heavy"))
    assert(r.head.getLong(1) == 40L) // recount is exact despite sketch undercount
  }

  test("bpeFirstMerges: adjacent in-word char pairs, duplicates counted, rank ties on pair") {
    // "abab" -> a b, b a, a b; "ab cd" -> a b / c d; single chars contribute nothing
    val r = bpeFirstMerges(docs((1L, "abab ab cd x"), (2L, "ab")), 3).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
    // counts: "a b" = 4 (abab x2, ab, ab), "b a" = 1, "c d" = 1 (tie -> b a < c d)
    assert(r.toSeq == Seq((1, "a b", 4L), (2, "b a", 1L), (3, "c d", 1L)))
  }

  test("bpeTrain: iterated merges with greedy overlap handling (hand-verified)") {
    // corpus "aaab aaab ab": round 1 merges (a,a) cnt 4 — "aaab"'s two
    // overlapping (a,a) marks are one island, only the FIRST merges;
    // round 2 (a,b) cnt 3; round 3 the learned symbols pair: (aa,ab) cnt 2
    val r = bpeTrain(docs((1L, "aaab aaab ab")), 3).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq == Seq((1, "a a", 4L), (2, "a b", 3L), (3, "aa ab", 2L)))
  }

  test("bpeTrain EQUALS a sequential reference trainer on the real corpus") {
    def refBpe(words: Map[String, Long], k: Int): Seq[(Int, String, Long)] = {
      var vocab: Map[Vector[String], Long] =
        words.map { case (w, f) => w.split("").toVector -> f }
      (1 to k).map { i =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).foreach {
            case Seq(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + f
            case _ => ()
          }
        }
        val ((x, y), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == x && syms(j + 1) == y) {
              out += x + y; j += 2
            } else { out += syms(j); j += 1 }
          }
          out.result()
        }(_._2)(_ + _)
        (i, s"$x $y", cnt)
      }
    }
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = real.selectExpr("explode(split(text, ' ')) AS w")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refBpe(words, 4)
    val got = bpeTrain(real, 4).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq
    assert(got == expected)
  }

  test("bpeEncode: per-document post-merge token counts match the sequential reference") {
    // reference: train k merges (same greedy top-pair semantics as refBpe)
    // while TRACKING each word's segmentation, then count per document
    def refEncode(words: Map[String, Long], k: Int): Map[String, Int] = {
      var seg: Map[String, Vector[String]] =
        words.keys.map(w => w -> w.split("").toVector).toMap
      (1 to k).foreach { _ =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        seg.foreach { case (w, syms) =>
          syms.sliding(2).foreach {
            case Seq(x, y) =>
              counts((x, y)) = counts.getOrElse((x, y), 0L) + words(w)
            case _ => ()
          }
        }
        val ((x, y), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        seg = seg.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == x && syms(j + 1) == y) {
              out += x + y; j += 2
            } else { out += syms(j); j += 1 }
          }
          w -> out.result()
        }
      }
      seg.map { case (w, s) => w -> s.size }
    }
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = real.selectExpr("explode(split(text, ' ')) AS w")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nsyms = refEncode(words, 3)
    val expected = real.select("doc_id", "text").collect().map { r =>
      val t = r.getString(1).split(" ", -1)
      r.getLong(0) -> ((t.length.toLong, t.map(nsyms(_).toLong).sum))
    }.toMap
    val got = bpeEncode(real, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // merges actually compressed something (non-vacuous)
    assert(got.values.exists { case (nw, nb) => nb < nw * 10 })
  }

  test("cmsEstimates: one-sided guarantee, exact at wide sketches, collisions overcount") {
    val text = (("the " * 10) + ("cat " * 5) + (1 to 30).map(i => s"u$i").mkString(" ")).trim
    val fix = docs((1L, text))
    // wide sketch: 4x1024 cells over ~45 tokens -> collisions vanishingly
    // unlikely, estimates equal exact counts
    val wide = TextAnalysis.cmsEstimates(fix, 4, 1024, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(wide.nonEmpty)
    wide.foreach { case (t, exact, est) =>
      assert(est == exact, s"wide sketch should be exact for $t") }
    assert(wide.find(_._1 == "the").exists(_._2 == 10L))
    // brutal 1x2 sketch: everything collides into two cells — the
    // one-sided bound (estimate >= exact, never under) must still hold,
    // and SOME token must overcount
    val tiny = TextAnalysis.cmsEstimates(fix, 1, 2, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    tiny.foreach { case (t, exact, est) =>
      assert(est >= exact, s"CMS may never undercount ($t)") }
    assert(tiny.exists { case (_, exact, est) => est > exact })
  }

  test("hllRegisters: exactly 2^p rows, merge-by-max, estimate near the exact count") {
    val n = 5000
    val text = (1 to n).map(i => s"tok$i").mkString(" ")
    val fix = docs((1L, text))
    val p = 10; val m = 1 << p
    val regs = TextAnalysis.hllRegisters(fix, p).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(regs.length == m && regs.map(_._1).toSet == (0L until m.toLong).toSet)
    // the standard HLL estimate from the integer registers lands within
    // the ~3x standard-error band (1.04/sqrt(1024) ~ 3.25%) of exact
    val alpha = 0.7213 / (1 + 1.079 / m)
    val est = alpha * m * m / regs.map { case (_, r) => math.pow(2.0, -r) }.sum
    assert(math.abs(est - n) / n < 0.10, s"HLL estimate $est vs exact $n")
    // duplicates cannot move a register: rescanning the same corpus twice
    // merges to the identical relation (the mergeable-summary property)
    val doubled = docs((1L, text), (2L, text))
    val again = TextAnalysis.hllRegisters(doubled, p).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sorted.sameElements(regs.sorted))
  }

  test("bm25TopK: integer-exact Okapi scores, per-query top-k") {
    val fix = docs(
      (1L, "dup merge fast"),
      (2L, "dup dup dup slow slow slow slow slow"),
      (3L, "merge merge merge merge"),
      (4L, "other tokens only here"))
    // independent reference: same fixed-point BM25 on plain Long math
    val texts = Map(1L -> "dup merge fast",
      2L -> "dup dup dup slow slow slow slow slow",
      3L -> "merge merge merge merge", 4L -> "other tokens only here")
    val toks = texts.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = toks.size.toLong
    val tTot = toks.values.map(_.size.toLong).sum
    def df(term: String) = toks.values.count(_.contains(term)).toLong
    def contrib(id: Long, term: String): Long = {
      val tf = toks(id).count(_ == term).toLong
      if (tf == 0) return 0L
      val dl = toks(id).size.toLong
      val idf = 63 - java.lang.Long.numberOfLeadingZeros(n * 1024 / df(term))
      idf * 22 * tf * tTot * 10000 / (10 * tf * tTot + 3 * tTot + 9 * dl * n)
    }
    val queries = Seq(1 -> Seq("dup", "merge"), 2 -> Seq("slow"), 3 -> Seq("zzz"))
    // a (query, doc) row exists iff the doc contains at least one query term
    val expected = queries.flatMap { case (qid, ts) =>
      toks.keys.toSeq
        .filter(id => ts.exists(toks(id).contains))
        .map(id => (id, ts.map(contrib(id, _)).sum))
        .sortBy { case (id, s) => (-s, id) }
        .zipWithIndex
        .map { case ((id, s), i) => (qid, (i + 1).toLong, id, s) }
    }.sortBy(r => (r._1, r._2))
    val got = TextAnalysis.bm25TopK(fix, queries)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the all-miss query contributes no rows at all
    assert(!got.exists(_._1 == 3))
    // rank 1 of query 2 is the high-tf doc
    assert(got.find(r => r._1 == 2 && r._2 == 1L).map(_._3).contains(2L))
  }

  test("classifierScore: hash-derived linear score over unigram+bigram features") {
    // reference scorer: same md5-hex-derived integer weight per feature
    def w(f: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (hex(0).toInt * 256 + hex(1).toInt) % 1001 - 500
    }
    def ref(text: String): (Long, Long) = {
      val t = text.split(" ", -1).toSeq
      val feats = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      (feats.size.toLong, feats.map(w).sum)
    }
    val texts = Seq("the quick brown fox", "single", "a a a a", "")
    val r = classifierScore(docs(texts.zipWithIndex.map {
        case (t, i) => (i.toLong, t) }: _*))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    for ((t, i) <- texts.zipWithIndex) {
      val (nf, sc) = ref(t)
      assert(r(i.toLong) == ((nf, sc, sc >= 0)), s"doc $i '$t'")
    }
  }

  test("knBigrams: hand-computed integer fractions; contexts sum to 1") {
    import spark.implicits._
    // "a b a b a c": c(a,b)=2 c(b,a)=2 c(a,c)=1; T=3 types;
    // left a: cw1=3 nw1=2; left b: cw1=2 nw1=1; every ncw2=1
    val d = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = TextAnalysis.knBigrams(d, 100).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map(
      ("a", "b") -> ((2L, 21L, 36L)),    // p = 7/12
      ("b", "a") -> ((2L, 18L, 24L)),    // p = 3/4
      ("a", "c") -> ((1L, 9L, 36L))))    // p = 1/4
    // KN mass check for context a over the full type vocabulary {a,b,c}:
    // seen 21/36 + 9/36, unseen (a,a) backoff 3*nw1*ncw2/den = 6/36 -> 1
    assert(21L + 9L + 3 * 2 * 1 == 36L)
  }

  test("kmvDistinct: not-full sketch is exact; full sketch uses (k-1)/theta") {
    import spark.implicits._
    // source A: 4 distinct shingles (sketch of k=2 is FULL -> estimator
    // branch); source B: 1 shingle (not full -> exact branch)
    val d = Seq(
      (1L, "a b c d e f", "A"),   // shingles: abc bcd cde def
      (2L, "x y z", "B"))         // shingle: xyz
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.kmvDistinct(d, 2).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4)))).toMap
    val (kuA, thetaA, estA, exA) = r("A")
    assert(kuA == 2L && exA == 4L)
    assert(estA == math.rint(1 * 4294967296.0 / thetaA * 1e6) / 1e6)
    val (kuB, _, estB, exB) = r("B")
    assert(kuB == 1L && estB == 1.0 && exB == 1L)
  }

  test("kmvOverlap: identical sources estimate Jaccard 1, disjoint 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e", "A"), (2L, "a b c d e", "B"),  // identical sets
      (3L, "p q r s t", "C"))                          // disjoint
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.kmvOverlap(d, 64).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getDouble(5)))).toMap
    val (kuAB, ncAB, jAB) = r(("A", "B"))
    assert(kuAB == 3L && ncAB == 3L && jAB == 1.0)   // 3 shingles, all shared
    val (_, ncAC, jAC) = r(("A", "C"))
    assert(ncAC == 0L && jAC == 0.0)
  }

  test("classifierAuc: midrank U matches the direct pairwise count") {
    import spark.implicits._
    // four texts with known integer scores; labels chosen so ties
    // exercise the midrank path (docs 2 and 3 share a score iff their
    // texts are identical — use the same text for a guaranteed tie)
    val fix = Seq(
      (0L, "the quick brown fox", "en"), (1L, "a a a a", "de"),
      (2L, "single", "en"), (3L, "single", "de"))
      .toDF("doc_id", "text", "lang")
    val scores = TextAnalysis.classifierScore(fix.select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val pos = Seq(0L, 2L); val neg = Seq(1L, 3L)
    // AUC * (P*N) = #(pos>neg) + 0.5*#(pos==neg); u2 doubles it
    val u2want = (for (p <- pos; n <- neg) yield {
      if (scores(p) > scores(n)) 2L
      else if (scores(p) == scores(n)) 1L else 0L
    }).sum
    val r = TextAnalysis.classifierAuc(fix, "en").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getLong(2) == u2want)
    assert(r.getDouble(3) ==
      math.rint(u2want.toDouble / (2.0 * 2 * 2) * 1e6) / 1e6)
  }

  test("scoreCalibration: fixed-width bins, negative scores floor down") {
    import spark.implicits._
    val fix = Seq(
      (0L, "the quick brown fox", "en"), (1L, "a a a a", "de"),
      (2L, "single", "en"))
      .toDF("doc_id", "text", "lang")
    val scores = TextAnalysis.classifierScore(fix.select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = Seq(0L, 1L, 2L).groupBy(d => math.floor(scores(d) / 5000.0).toLong)
      .map { case (bin, ds) =>
        bin -> ((ds.size.toLong, ds.count(d => d == 0L || d == 2L).toLong))
      }
    val got = TextAnalysis.scoreCalibration(fix, "en", 5000L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("zipfFit: exact two-point fit — slope -1, intercept ln4, r2 1") {
    // counts a=4 (rank 1), b=2 (rank 2): the points (ln1, ln4), (ln2, ln2)
    // lie on y = -x + ln4 exactly, so the regression is closed-form
    val r = TextAnalysis.zipfFit(docs((0L, "a a a a b b")), 10).collect()
    assert(r.length == 1)
    val x = r.head
    assert(x.getLong(0) == 2L)
    assert(x.getDouble(1) == -1.0)
    assert(x.getDouble(2) == math.rint(math.log(4) * 1e6) / 1e6 ||
      math.abs(x.getDouble(2) - math.log(4)) < 1e-6)
    assert(x.getDouble(3) == 1.0)
  }

  test("collocations: integer lift ranking, marginals from the count relation") {
    import spark.implicits._
    val docs = Seq((1L, "x y x y x y x y x y")).toDF("doc_id", "text")
    val r = TextAnalysis.collocations(docs, 2L, 10).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    // bigrams: "x y" x5, "y x" x4; N=9; marginals x:5/y:4 (w1), y:5/x:4 (w2)
    // lift(y x) = 4*9*10000 div 16 = 22500 > lift(x y) = 5*9*10000 div 25
    assert(r.toSeq == Seq(
      ("y x", 4L, 4L, 4L, 22500L),
      ("x y", 5L, 5L, 5L, 18000L)))
    // minCount prunes: only the 5-count bigram survives at minCount=5
    val pruned = TextAnalysis.collocations(docs, 5L, 10).collect()
    assert(pruned.map(_.getString(0)).toSeq == Seq("x y"))
  }
}
