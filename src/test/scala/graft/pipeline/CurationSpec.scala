package graft.pipeline

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // >= 10 tokens, low repetition, low stopword rate -> bucket 3
  private val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("curate: quality verdict outranks duplicate; canonical survives") {
    val d = docs(
      (1L, good),                       // canonical of {1,2} -> keep
      (2L, good + " extra"),            // near-dup of 1 -> duplicate
      (3L, "short doc"),                // < 10 tokens -> quality
      (4L, "p q r s t u v w x y z"))    // unique, good -> keep
    val r = Curation.curate(d, 50).collect()
      .map(x => x.getLong(0) -> (x.getString(4), x.getBoolean(5))).toMap
    assert(r(1L) == (("", true)))
    assert(r(2L) == (("duplicate", false)))
    assert(r(3L) == (("quality", false)))
    assert(r(4L) == (("", true)))
  }

  test("curate: a low-quality canonical does not resurrect its duplicates") {
    // 5 and 6 are near-dups (7 of 10 shingles shared -> jaccard 70%); the
    // canonical 5 fails quality (9 tokens < 10) while 6 passes -> both are
    // dropped, each with its OWN reason (quality for 5, duplicate for 6):
    // clustering on the full corpus means a dropped canonical never
    // resurrects its duplicates
    val base = "b c d e f g h i j"
    val r = Curation.curate(docs((5L, base), (6L, base + " k l m")), 50).collect()
      .map(x => x.getLong(0) -> x.getString(4)).toMap
    assert(r(5L) == "quality")
    assert(r(6L) == "duplicate")
  }

  test("curate canonical=true: the LONGEST cluster member represents") {
    val d = docs(
      (1L, good),            // min-id rep of {1,2} but SHORTER
      (2L, good + " extra"), // longest member -> canonical under the flag
      (4L, "p q r s t u v w x y z"))
    val r = Curation.curate(d, 50, canonical = true).collect()
      .map(x => x.getLong(0) -> (x.getString(4), x.getBoolean(5))).toMap
    assert(r(1L) == (("duplicate", false)))
    assert(r(2L) == (("", true)))
    assert(r(4L) == (("", true)))
    // default rule on the same fixture keeps 1 — the flag flips only the
    // representative, never the cluster membership
    val base = Curation.curate(d, 50).collect()
      .map(x => x.getLong(0) -> x.getBoolean(5)).toMap
    assert(base(1L) && !base(2L))
  }

  test("curate: cluster_id is the min doc_id of the near-dup component") {
    val r = Curation.curate(docs((7L, good), (9L, good + " x"), (8L, good + " y")), 50)
      .collect().map(x => (x.getLong(0), x.getLong(3))).toMap
    assert(r == Map(7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("budgetSample: cumulative sums in doc_id order, cutoff at budget") {
    val d = docs((1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"))
    val r = Curation.budgetSample(d, budgetTokens = 5, numBuckets = 2)
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getBoolean(3))))
      .toMap
    assert(r(1L) == ((3L, 3L, true)))
    assert(r(2L) == ((2L, 5L, true)))
    assert(r(3L) == ((4L, 9L, false)))
    assert(r(4L) == ((1L, 10L, false)))
  }

  test("ppsSample: picks = slots crossed, a giant doc draws multiple times") {
    // tokens: 3, 2, 12, 1 -> total 18, n=6 -> step 3; slots at 3,6,9,12,15,18
    // doc 1 covers (0,3]: slot 3 -> 1 pick; doc 2 (3,5]: none;
    // doc 3 (5,17]: slots 6,9,12,15 -> 4 picks; doc 4 (17,18]: slot 18 -> 1
    val d = docs((1L, "a b c"), (2L, "d e"),
      (3L, "f g h i j k l m n o p q"), (4L, "r"))
    val r = Curation.ppsSample(d, 6, numBuckets = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((3L, 1L)), 3L -> ((12L, 4L)), 4L -> ((1L, 1L))))
    // total picks == n whenever step divides total
    assert(r.values.map(_._2).sum == 6L)
  }

  test("budgetSample: bucketed prefix sum equals the single-partition truth") {
    import org.apache.spark.sql.functions._
    val rows = (0L until 97L).map(i => (i * 3 % 97, ("tok " * (i % 7 + 1).toInt).trim))
    val d = docs(rows: _*)
    // numBuckets exceeding, equal to, and far below the doc count
    for (nb <- Seq(1, 4, 64, 500)) {
      val got = Curation.budgetSample(d, 100, numBuckets = nb)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
      val want = got.map(_._1).zip(
        got.map(_._1).map(id => rows.filter(_._1 <= id).map(_._2.split(" ").length.toLong).sum))
      assert(got.toSeq == want.toSeq, s"numBuckets=$nb")
    }
  }

  test("mixBySource: per-source rates, default for unlisted, mod-100 draw") {
    import spark.implicits._
    val d = Seq(
      (10L, "keep me", "web"), (90L, "drop me", "web"),   // web@50: 10<50, 90>=50
      (99L, "always", "code"),                            // code@100: kept
      (24L, "default", "misc"), (25L, "default", "misc")) // default 25
      .toDF("doc_id", "text", "source")
    val r = Curation.mixBySource(d, Map("web" -> 50, "code" -> 100), 25)
      .collect().map(x => x.getLong(0) -> (x.getInt(2), x.getBoolean(3))).toMap
    assert(r(10L) == ((50, true)) && r(90L) == ((50, false)))
    assert(r(99L) == ((100, true)))
    assert(r(24L) == ((25, true)) && r(25L) == ((25, false)))
  }

  test("corpusStats: per (source, lang) doc/token/quality totals") {
    import spark.implicits._
    val d = Seq(
      (1L, good, "en", "web"),            // 10 tokens, bucket 3
      (2L, "tiny doc", "en", "web"),      // 2 tokens, bucket 0
      (3L, good + " more", "de", "web"),  // 11 tokens, bucket 3
      (4L, good, "en", "code"))           // 10 tokens, bucket 3
      .toDF("doc_id", "text", "lang", "source")
    val r = Curation.corpusStats(d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(("web", "en")) == ((2L, 12L, 1L)))
    assert(r(("web", "de")) == ((1L, 11L, 1L)))
    assert(r(("code", "en")) == ((1L, 10L, 1L)))
  }

  test("decontaminate: shared shingles flag a train doc; clean docs pass") {
    val train = docs(
      (1L, "alpha beta gamma delta epsilon"), // shares 3 shingles with bench
      (2L, "one two three four five"),        // disjoint -> clean
      (3L, "xx yy"))                          // < 3 tokens -> no shingles
    val bench = docs((100L, "alpha beta gamma delta epsilon zeta"))
    val r = Curation.decontaminate(train, bench).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r(1L) == ((3L, true)))
    assert(r(2L) == ((0L, false)))
    assert(r(3L) == ((0L, false)))
  }

  test("decontaminate: bloom prefilter does not change the exact result") {
    val rows = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} tail$i end$i"))
    val train = docs(rows.filter(_._1 % 5 != 0): _*)
    val bench = docs(rows.filter(_._1 % 5 == 0): _*)
    val a = Curation.decontaminate(train, bench, bloomPrefilter = true)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.decontaminate(train, bench, bloomPrefilter = false)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.exists(_.getBoolean(2))) // the fixture does contaminate
  }

  test("decontaminate: randomized agreement with a brute-force shingle check") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    def text() = Seq.fill(rnd.nextInt(9) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val all = (0L until 80L).map(i => (i, text()))
    val (benchRows, trainRows) = all.partition(_._1 % 4 == 0)
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val benchSet = benchRows.flatMap(r => sh(r._2)).toSet
    val want = trainRows.map { case (id, t) =>
      val n = sh(t).count(benchSet.contains)
      (id, n.toLong, n > 0)
    }.sortBy(_._1)
    val got = Curation.decontaminate(docs(trainRows: _*), docs(benchRows: _*))
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq
    assert(got == want)
  }

  test("leakageSplit: brute-force agreement — split coin, eviction, keeps") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    def text() = Seq.fill(rnd.nextInt(8) + 3)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val all = (0L until 120L).map(i => (i, text()))
    // the reference model, straight from the contract: md5 bucket splits,
    // train docs sharing any 3-shingle with any test doc are evicted
    def bucket(id: Long): Int = {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(m.substring(0, 4), 16) % 100
    }
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val (testRows, trainRows) = all.partition(r => bucket(r._1) >= 90)
    assert(testRows.nonEmpty && trainRows.nonEmpty)
    val testSh = testRows.flatMap(r => sh(r._2)).toSet
    val want = all.map { case (id, t) =>
      val isTest = bucket(id) >= 90
      val n = if (isTest) 0L else sh(t).count(testSh.contains).toLong
      (id, if (isTest) "test" else "train", n, isTest || n == 0L)
    }.sortBy(_._1)
    val got = Curation.leakageSplit(docs(all: _*), 10)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getBoolean(3))).toSeq
    assert(got == want)
    // the dense tiny-vocab fixture must actually evict someone
    assert(got.exists(r => r._2 == "train" && !r._4))
  }

  test("capPerSource: bounded aggregator equals the ranking window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col => c, row_number}
    val d = (0L until 60L).map { i =>
      val text = if (i % 3 == 0) good else "short doc" // bucket 3 vs 0
      (i, text, s"src${i % 4}")
    }.toDF("doc_id", "text", "source")
    val got = Curation.capPerSource(d, 5)
      .orderBy("source", "rank").collect()
      .map(x => (x.getString(0), x.getInt(1), x.getLong(2), x.getInt(3))).toSeq
    val w = Window.partitionBy("source")
      .orderBy(c("quality_bucket").desc, c("doc_id"))
    val want = graft.text.TextAnalysis.withQuality(d)
      .withColumn("rank", row_number().over(w)).filter(c("rank") <= 5)
      .select("source", "rank", "doc_id", "quality_bucket")
      .orderBy("source", "rank").collect()
      .map(x => (x.getString(0), x.getInt(1), x.getLong(2), x.getInt(3))).toSeq
    assert(got == want)
    assert(got.count(_._1 == "src0") == 5) // the cap binds (15 docs/src)
  }

  test("capPerSource: null sources form their own capped bucket") {
    import spark.implicits._
    val d = (0L until 20L).map { i =>
      val src = if (i % 2 == 0) null else s"src${i % 3}"
      (i, if (i % 3 == 0) good else "short doc", src)
    }.toDF("doc_id", "text", "source")
    val got = Curation.capPerSource(d, 3).collect()
      .map(x => (Option(x.getString(0)), x.getInt(1), x.getLong(2)))
    val nulls = got.filter(_._1.isEmpty)
    assert(nulls.length == 3)                       // capped like any source
    assert(nulls.map(_._2).sorted.toSeq == Seq(1, 2, 3))
    assert(got.filter(_._1.contains("src1")).nonEmpty)
  }

  test("budgetSample: empty input yields empty output with the right schema") {
    val d = docs().select(col("doc_id"), col("text"))
    val r = Curation.budgetSample(d, 10)
    assert(r.columns.toSeq == Seq("doc_id", "n_tokens", "cum_tokens", "in_budget"))
    assert(r.count() == 0)
  }

  test("splitCorpus: every doc assigned, splits follow the md5 bucket ranges") {
    val d = docs((0L until 500L).map(i => (i, good)): _*)
    val r = Curation.splitCorpus(d, Seq(("train", 90), ("valid", 5), ("test", 5)))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2)))
    assert(r.length == 500)
    r.foreach { case (id, b, sp) =>
      // bucket recomputed independently (JVM md5 of the decimal id string)
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val want = (((m(0) & 0xff) << 8) | (m(1) & 0xff)) % 100
      assert(b == want, s"doc $id bucket $b != $want")
      assert(sp == (if (b < 90) "train" else if (b < 95) "valid" else "test"))
    }
    // rough proportion sanity on 500 uniform hashes
    val byName = r.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byName("train") > 400 && byName.getOrElse("valid", 0) > 0)
  }

  test("splitCorpus: assignment is stable under corpus membership changes") {
    val all = Curation.splitCorpus(docs((0L until 200L).map(i => (i, good)): _*),
      Seq(("a", 50), ("b", 50))).collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    val subset = Curation.splitCorpus(docs((0L until 200L by 3).map(i => (i, good)): _*),
      Seq(("a", 50), ("b", 50))).collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    subset.foreach { case (id, sp) => assert(all(id) == sp) }
  }

  test("splitCorpus: rejects percents that do not sum to 100") {
    intercept[IllegalArgumentException](
      Curation.splitCorpus(docs((1L, good)), Seq(("train", 90), ("valid", 5))))
  }

  test("temperatureMix: sqrt-temperature weights sum to ~1e6, exact on squares") {
    // srcA: 1 doc x 4 tokens (sqrt=2); srcB: 2 docs x 8 tokens (sqrt=4);
    // total 6 -> 333333 / 666667 ppm
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d", "srcA"),
      (2L, "a b c d e f g h", "srcB"), (3L, "p q r s t u v w", "srcB"))
      .toDF("doc_id", "text", "source")
    val r = Curation.temperatureMix(d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("srcA") == ((1L, 4L, 333333L)))
    assert(r("srcB") == ((2L, 16L, 666667L)))
  }

  test("qualityTiers: per-language ntile ranks clean docs into tier 1") {
    import spark.implicits._
    // 6 'en' docs: 2 clean (bucket 3), 2 stopword-heavy (bucket 2),
    // 2 short (bucket 0); one 'fr' doc must tier independently
    val d = Seq(
      (1L, good, "en"), (2L, good + " lambda", "en"),
      (3L, "the a the a the a the a the a x1 x2 y z w v", "en"),
      (4L, "the a the a the a the a the a q1 q2 r s t u", "en"),
      (5L, "tiny one", "en"), (6L, "tiny two", "en"),
      (7L, "bonjour le monde", "fr"))
      .toDF("doc_id", "text", "lang")
    val r = Curation.qualityTiers(d).collect()
      .map(x => x.getLong(0) -> ((x.getInt(3), x.getString(1)))).toMap
    assert(r(1L)._1 == 1 && r(2L)._1 == 1)
    assert(r(3L)._1 == 2 && r(4L)._1 == 2)
    assert(r(5L)._1 == 3 && r(6L)._1 == 3)
    assert(r(7L) == ((1, "fr"))) // sole doc of its language -> tier 1
  }

  test("shardAssign: token-balanced cuts, documents never split, all shards covered") {
    import spark.implicits._
    // 8 docs x 4 tokens = 32 tokens over 4 shards -> exactly 2 docs each
    val even = (0L until 8L).map(i => (i, "a b c d"))
    val r = Curation.shardAssign(even.toDF("doc_id", "text"), 4).collect()
      .map(x => x.getLong(0) -> x.getInt(2)).toMap
    assert(r == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1,
      4L -> 2, 5L -> 2, 6L -> 3, 7L -> 3))
    // a huge head doc claims shard 0 alone; the clamp keeps the tail in range
    val skew = Seq((0L, Seq.fill(100)("t").mkString(" ")), (1L, "x"), (2L, "y"))
    val s = Curation.shardAssign(skew.toDF("doc_id", "text"), 4).collect()
      .map(x => x.getLong(0) -> x.getInt(2)).toMap
    assert(s(0L) == 0 && s(1L) == 3 && s(2L) == 3)
  }

  test("stratifiedSample: exact n, largest-remainder quotas, deterministic picks") {
    import spark.implicits._
    // strata sizes 5/3/2 over n=6: exact quotas 3.0/1.8/1.2 -> floors
    // 3/1/1 (sum 5), one leftover seat -> largest remainder (.8) wins it
    val fix = ((1L to 5L).map(i => (i, s"t$i", "web", "en")) ++
      (6L to 8L).map(i => (i, s"t$i", "web", "fr")) ++
      (9L to 10L).map(i => (i, s"t$i", "book", "en")))
      .toDF("doc_id", "text", "source", "lang")
    val r = Curation.stratifiedSample(fix, 6).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(r.length == 6)
    val bySt = r.groupBy(x => (x._2, x._3)).view.mapValues(_.length).toMap
    assert(bySt == Map(("web", "en") -> 3, ("web", "fr") -> 2, ("book", "en") -> 1))
    // pick_rank is 1..quota within each stratum
    for (((src, lg), q) <- bySt)
      assert(r.filter(x => x._2 == src && x._3 == lg).map(_._4).sorted
        .sameElements(1L to q.toLong))
    // deterministic: a second run picks the identical doc set
    val again = Curation.stratifiedSample(fix, 6).collect().map(_.getLong(0)).toSet
    assert(again == r.map(_._1).toSet)
  }

  test("stratifiedSample: hot-stratum aggregator path is result-identical to the window path") {
    import spark.implicits._
    // 90%-one-stratum fixture: 90 web/en docs + 7 web/fr + 3 book/en.
    // threshold 10 routes ONLY the dominant stratum through the bounded
    // bottom-k aggregator; threshold MaxValue keeps everything on the
    // ranking window. Same rows, ranks, and strata either way.
    val fix = ((1L to 90L).map(i => (i, s"t$i", "web", "en")) ++
      (91L to 97L).map(i => (i, s"t$i", "web", "fr")) ++
      (98L to 100L).map(i => (i, s"t$i", "book", "en")))
      .toDF("doc_id", "text", "source", "lang")
    def rows(thr: Long) =
      Curation.stratifiedSample(fix, 20, hotStratumThreshold = thr).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
        .sortBy(_._1).toSeq
    val hot = rows(10)
    assert(hot == rows(Long.MaxValue))
    assert(hot.length == 20)
    // the dominant stratum holds 90% of the corpus and so 18 of 20 seats
    assert(hot.count(x => x._2 == "web" && x._3 == "en") == 18)
  }

  test("writePartitionedCorpus: lang/source directories, pruned read-back") {
    import spark.implicits._
    val fix = Seq(
      (1L, "t1", "web", "en"), (2L, "t2", "web", "fr"),
      (3L, "t3", "book", "en"), (4L, "t4", "book", "fr"))
      .toDF("doc_id", "text", "source", "lang")
    val path = java.nio.file.Files.createTempDirectory("corpus_").toString
    try {
      Curation.writePartitionedCorpus(fix, path)
      // hive layout on disk
      assert(new java.io.File(s"$path/lang=en/source=web").isDirectory)
      assert(new java.io.File(s"$path/lang=fr/source=book").isDirectory)
      // a lang-scoped read PRUNES: the filter lands in PartitionFilters
      // and only the matching directories' rows come back
      val back = spark.read.parquet(path).filter(col("lang") === "en")
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        "lang filter must prune partitions, not scan-and-filter")
      assert(back.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq ==
        Seq(1L, 3L))
      // round trip is lossless across the partition-column move
      val all = spark.read.parquet(path)
        .select("doc_id", "text", "source", "lang")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3))).sortBy(_._1).toSeq
      assert(all == fix.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3))).sortBy(_._1).toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("paretoDocs: exact skyline — twins kept, same-x and strict dominated die") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),          // (4, 1000000) frontier
      (2L, "a a b b"),          // (4, 500000) dominated same-x by 1
      (3L, "a a a b"),          // (4, 500000) twin of 2, also dominated
      (4L, "a b"),              // (2, 1000000) dominated by 1 (strict x, equal y)
      (5L, "a a a a a a a a"),  // (8, 125000) frontier (max x)
      (6L, "a b c a b c"),      // (6, 500000) frontier
      (7L, "x y z x y z"))      // (6, 500000) frontier TWIN of 6 — both kept
      .toDF("doc_id", "text")
    for (w <- Seq(1L, 2L, 100L)) {
      val r = Curation.paretoDocs(docs, w).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(r == Set((1L, 4L, 1000000L), (5L, 8L, 125000L),
        (6L, 6L, 500000L), (7L, 6L, 500000L)), s"bucketWidth=$w")
    }
  }

  test("paretoDocs equals the brute-force dominance skyline on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val xy = docs.selectExpr("doc_id",
      "CAST(size(split(text, ' ')) AS LONG) AS n_tokens",
      "CAST(size(array_distinct(split(text, ' '))) AS LONG) * 1000000 " +
        "div CAST(size(split(text, ' ')) AS LONG) AS uniq_e6")
    val brute = xy.as("a").join(xy.as("b"),
        col("b.n_tokens") >= col("a.n_tokens") &&
          col("b.uniq_e6") >= col("a.uniq_e6") &&
          (col("b.n_tokens") > col("a.n_tokens") ||
            col("b.uniq_e6") > col("a.uniq_e6")),
        "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (w <- Seq(1L, 16L)) {
      val fast = Curation.paretoDocs(docs, w).collect().map(_.getLong(0)).toSet
      assert(fast == brute && fast.nonEmpty, s"bucketWidth=$w")
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
