package graft.pipeline

import graft.SparkSpec

class CurateMainSpec extends SparkSpec {

  private val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("parseArgs: flags, mix map, single input") {
    val c = CurateMain.parseArgs(Seq("--output", "/tmp/o", "--mix", "web:30,code:100",
      "--mix-default", "10", "--budget", "5000", "--min-quality", "2", "/tmp/in.parquet"))
    assert(c.input.contains("/tmp/in.parquet") && c.output.contains("/tmp/o"))
    assert(c.mix == Map("web" -> 30, "code" -> 100) && c.mixDefault == 10)
    assert(c.budget.contains(5000L) && c.minQuality == 2)
    intercept[IllegalArgumentException](CurateMain.parseArgs(Seq("--nope", "x")))
    intercept[IllegalArgumentException](CurateMain.parseArgs(Seq("--output", "/tmp/o")))
  }

  test("decide: curation, mixing and budget compose into one keep column") {
    val d = docs(
      (10L, good, "web"),            // good, canonical, web@100 -> budget decides
      (60L, good + " xx", "web"),    // near-dup of 10 -> duplicate
      (20L, "tiny", "web"),          // quality drop
      (30L, "p q r s t u v w x y z1 z2", "junk"), // good but junk@0 -> mix drop
      (40L, "m n o p2 q2 r2 s2 t2 u2 v2 w2", "web")) // good, kept, budget decides
    val c = CurateMain.Config(mix = Map("junk" -> 0), mixDefault = 100,
      budget = Some(15L))
    val r = CurateMain.decide(d, c).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    // budget 15: doc 10 (10 tokens, cum 10) fits; doc 40 (11 tokens, cum 21) not
    assert(r == Map(10L -> true, 60L -> false, 20L -> false, 30L -> false, 40L -> false))
  }

  test("run: parquet in -> decision table + stats parquet out (e2e)") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("curate").toString
    docs((1L, good, "web"), (2L, "tiny", "web"), (3L, good + " more", "code"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.parquet(s"$tmp/in")
    CurateMain.run(spark, CurateMain.parseArgs(Seq(
      "--output", s"$tmp/out", "--stats", s"$tmp/stats",
      "--mix", "code:0", s"$tmp/in")))
    val out = spark.read.parquet(s"$tmp/out")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    // 1 kept; 2 fails quality; 3 good but its source is mixed out
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
    val stats = spark.read.parquet(s"$tmp/stats")
    assert(stats.columns.toSet ==
      Set("source", "lang", "n_docs", "n_tokens", "n_quality_docs"))
    assert(stats.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head.getLong(0) == 3L)
    assert(spark.read.parquet(s"$tmp/out")
      .filter(col("kept_mix")).count() == 2) // web docs survive mixing
  }

  test("parseArgs: benchmark and source-cap flags") {
    val c = CurateMain.parseArgs(Seq("--benchmark", "/tmp/b.parquet",
      "--source-cap", "7", "/tmp/in.parquet"))
    assert(c.benchmark.contains("/tmp/b.parquet") && c.sourceCap.contains(7))
  }

  test("decide: benchmark decontamination is a hard exclusion") {
    val d = docs(
      (1L, good, "web"),                               // overlaps bench -> dropped
      (2L, "p q r s t u v w x y z1 z2", "web"))        // clean -> kept
    val bench = docs((100L, good + " tail", "eval")).select("doc_id", "text")
    val r = CurateMain.decide(d, CurateMain.Config(), Some(bench)).collect()
      .map(x => (x.getAs[Long]("doc_id"),
        (x.getAs[Boolean]("contaminated"), x.getAs[Boolean]("keep")))).toMap
    assert(r(1L) == ((true, false)))
    assert(r(2L) == ((false, true)))
  }

  test("decide: source cap binds over survivors, not the full corpus") {
    // src0 has 3 good docs (distinct texts — no near-dup clustering) and 1
    // quality-dropped doc; cap 2 keeps the two best surviving ids and the
    // quality drop does not consume a slot
    val d = docs(
      (1L, good, "src0"),
      (2L, "lambda mu nu xi omicron pi rho sigma tau upsilon", "src0"),
      (3L, "phi chi psi omega aleph beth gimel daleth he waw", "src0"),
      (4L, "tiny", "src0"),
      (5L, "zero one two three four five six seven eight nine", "src1"))
    val r = CurateMain.decide(d, CurateMain.Config(sourceCap = Some(2))).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    assert(r == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> true))
  }

  test("decide without mix/budget equals plain curate keep") {
    val d = docs((1L, good, "a"), (2L, "small", "b"))
    val r = CurateMain.decide(d, CurateMain.Config()).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    assert(r == Map(1L -> true, 2L -> false))
  }

  test("--split annotates every row with its hash split without touching keep") {
    val d = docs((0L until 60L).map(i => (i, good, "web")): _*)
    val c = CurateMain.Config(splits = Seq("train" -> 90, "valid" -> 10))
    val base = CurateMain.decide(d, CurateMain.Config()).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    val r = CurateMain.decide(d, c).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("split"),
        x.getAs[Boolean]("keep")))
    assert(r.length == 60)
    val want = Curation.splitCorpus(d, Seq("train" -> 90, "valid" -> 10))
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    r.foreach { case (id, sp, keep) =>
      assert(sp == want(id) && keep == base(id))
    }
    // flag parses too
    assert(CurateMain.parseArgs(Seq("--split", "train:90,valid:10", "/tmp/in"))
      .splits == Seq("train" -> 90, "valid" -> 10))
  }

  test("--canonical elects the longest cluster member in the decision table") {
    val d = docs((1L, good, "web"), (2L, good + " extra", "web"),
      (4L, "p q r s t u v w x y z", "web"))
    val keep = CurateMain.decide(d, CurateMain.Config(canonical = true))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    assert(keep == Map(1L -> false, 2L -> true, 4L -> true))
    assert(CurateMain.parseArgs(Seq("--canonical", "/tmp/in")).canonical)
    assert(!CurateMain.parseArgs(Seq("/tmp/in")).canonical)
  }

  test("--clean-output ships curated survivors chunk-deduped; --mix-report writes weights") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("curateclean").toString
    // docs 1 and 3 are quality-kept and share their FIRST 3-token chunk;
    // doc 2 fails quality (and so never claims a chunk)
    docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "web"),
      (2L, "tiny", "web"),
      (3L, "alpha beta gamma one two three four five six seven", "code"))
      .write.parquet(s"$tmp/in")
    CurateMain.run(spark, CurateMain.parseArgs(Seq(
      "--clean-output", s"$tmp/clean", "--paragraph-span", "3",
      "--mix-report", s"$tmp/mix", s"$tmp/in")))
    val clean = spark.read.parquet(s"$tmp/clean").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[String]("cleaned_text")))).toMap
    assert(!clean.contains(2L)) // dropped docs never reach the shipped corpus
    assert(clean(1L)._1 == 4L) // all 4 chunks kept (first claimant)
    assert(clean(3L)._1 == 3L &&
      clean(3L)._2 == "one two three four five six seven")
    val mix = spark.read.parquet(s"$tmp/mix").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("weight_ppm")).toMap
    assert(mix.keySet == Set("web", "code") &&
      mix.values.sum >= 999998L && mix.values.sum <= 1000002L)
  }

  test("parseArgs: stratified and span-clean flags") {
    val c = CurateMain.parseArgs(Seq("--stratified", "100",
      "--span-clean", "--span-window", "10", "/tmp/in"))
    assert(c.stratified.contains(100L) && c.spanClean && c.spanWindow == 10)
    assert(!CurateMain.parseArgs(Seq("/tmp/in")).spanClean)
  }

  test("--stratified caps keep at exactly N survivors; --span-clean rewrites spans") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("curatestrat").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // unique tails long enough that the shared prefix stays under the
    // 50% near-dup threshold (8 shared / 28 union shingles = 28%)
    docs(((1L to 8L).map(i =>
      (i, s"$base w$i x$i y$i z$i v$i u$i t$i s$i r$i q$i", "web")) :+
      (99L, "tiny", "web")): _*)
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.parquet(s"$tmp/in")
    CurateMain.run(spark, CurateMain.parseArgs(Seq(
      "--output", s"$tmp/out", "--stratified", "4", s"$tmp/in")))
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.filter(col("keep")).count() == 4L)
    assert(out.filter(col("in_sample")).count() == 4L)
    // span-clean: the 8 survivors share their 10-token prefix; the owner
    // keeps it, every other survivor's prefix span is removed
    CurateMain.run(spark, CurateMain.parseArgs(Seq(
      "--clean-output", s"$tmp/clean", "--span-clean", s"$tmp/in")))
    val clean = spark.read.parquet(s"$tmp/clean").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("cleaned_text")).toMap
    val owner = clean.keySet.min
    assert(clean(owner).startsWith("alpha beta gamma"))
    assert(clean.filter(_._1 != owner).values.forall(!_.contains("alpha")))
  }
}
