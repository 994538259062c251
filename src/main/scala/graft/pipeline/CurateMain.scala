package graft.pipeline

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runnable corpus-curation program — the training-data counterpart of the
  * CIND CLI (graft.Main): a documents table in, the keep/drop decision
  * table (and optionally a corpus report) out.
  *
  * {{{
  * graft.pipeline.CurateMain [flags] <documents path (parquet)>
  *   --output PATH        decision-table parquet (doc_id, lang_guess,
  *                        quality_bucket, cluster_id, drop_reason, keep
  *                        [, sample_pct, kept_mix][, cum_tokens, in_budget])
  *   --stats PATH         corpus composition report parquet (source, lang,
  *                        n_docs, n_tokens, n_quality_docs)
  *   --min-jaccard N      near-dup threshold percent        (default 50)
  *   --min-quality N      minimum quality bucket to keep    (default 3)
  *   --mix SRC:PCT,...    source-proportional sampling rates (mod-100 draw);
  *                        unlisted sources keep --mix-default
  *   --mix-default N      rate for unlisted sources         (default 100)
  *   --budget N           token budget: annotate the running token total
  *                        over surviving docs and cut at N
  *   --benchmark PATH     held-out eval parquet: drop training docs sharing
  *                        any 3-token shingle with it (adds n_overlap,
  *                        contaminated columns)
  *   --split N:P,...      annotate a deterministic corpus split (name:pct
  *                        pairs summing to 100, e.g. train:90,valid:5,test:5)
  *   --source-cap N       keep at most N docs per source (quality desc,
  *                        doc_id asc) among the survivors so far
  *   --clean-output PATH  SHIPPED corpus parquet: curated survivors with
  *                        repeated --paragraph-span-token chunks removed
  *                        corpus-wide and the remainder reassembled
  *   --paragraph-span N   chunk width for --clean-output    (default 20)
  *   --mix-report PATH    sqrt-temperature per-source sampling weights
  *   --stratified N       final exact-N stratified subsample of the
  *                        survivors (largest-remainder quotas over
  *                        (source, lang), md5-shuffled picks; adds an
  *                        in_sample column)
  *   --span-clean         --clean-output removes duplicated SPANS
  *                        (keep-first exact-substring dedup over
  *                        --span-window-token windows) instead of
  *                        repeated chunks
  *   --span-window N      window width for --span-clean     (default 8)
  *   --canonical          duplicate clusters keep their LONGEST member
  *                        (tie: smallest doc_id) instead of the smallest id
  *   --master M           Spark master                      (default local[*])
  * }}}
  *
  * Stage order = the batch curation contract: quality/dedup verdicts and
  * benchmark decontamination first (hard exclusions over the full corpus),
  * then the per-source cap over the survivors, then mixing, then the
  * budget cutoff over what mixing kept — so caps and budget are spent on
  * documents that would actually ship.
  */
object CurateMain {

  final case class Config(
      input: Option[String] = None,
      output: Option[String] = None,
      statsOut: Option[String] = None,
      minJaccard: Int = 50,
      minQuality: Int = 3,
      mix: Map[String, Int] = Map.empty,
      mixDefault: Int = 100,
      budget: Option[Long] = None,
      benchmark: Option[String] = None,
      sourceCap: Option[Int] = None,
      splits: Seq[(String, Int)] = Nil,
      canonical: Boolean = false,
      paragraphSpan: Int = 20,
      cleanOutput: Option[String] = None,
      mixReport: Option[String] = None,
      stratified: Option[Long] = None,
      spanClean: Boolean = false,
      spanWindow: Int = 8,
      master: String = "local[*]")

  def parseArgs(args: Seq[String]): Config = {
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Config = rest match {
      case Nil => c
      case "--output" :: v :: t      => loop(t, c.copy(output = Some(v)))
      case "--stats" :: v :: t       => loop(t, c.copy(statsOut = Some(v)))
      case "--min-jaccard" :: v :: t => loop(t, c.copy(minJaccard = v.toInt))
      case "--min-quality" :: v :: t => loop(t, c.copy(minQuality = v.toInt))
      case "--mix" :: v :: t =>
        val m = v.split(",").map { kv =>
          val Array(src, pct) = kv.split(":")
          src -> pct.toInt
        }.toMap
        loop(t, c.copy(mix = c.mix ++ m))
      case "--mix-default" :: v :: t => loop(t, c.copy(mixDefault = v.toInt))
      case "--budget" :: v :: t      => loop(t, c.copy(budget = Some(v.toLong)))
      case "--benchmark" :: v :: t   => loop(t, c.copy(benchmark = Some(v)))
      case "--source-cap" :: v :: t  => loop(t, c.copy(sourceCap = Some(v.toInt)))
      case "--split" :: v :: t =>
        val sp = v.split(",").toSeq.map { kv =>
          val Array(name, pct) = kv.split(":")
          name -> pct.toInt
        }
        loop(t, c.copy(splits = sp))
      case "--canonical" :: t        => loop(t, c.copy(canonical = true))
      case "--paragraph-span" :: v :: t => loop(t, c.copy(paragraphSpan = v.toInt))
      case "--clean-output" :: v :: t => loop(t, c.copy(cleanOutput = Some(v)))
      case "--mix-report" :: v :: t  => loop(t, c.copy(mixReport = Some(v)))
      case "--stratified" :: v :: t  => loop(t, c.copy(stratified = Some(v.toLong)))
      case "--span-clean" :: t       => loop(t, c.copy(spanClean = true))
      case "--span-window" :: v :: t => loop(t, c.copy(spanWindow = v.toInt))
      case "--master" :: v :: t      => loop(t, c.copy(master = v))
      case flag :: _ if flag.startsWith("--") =>
        throw new IllegalArgumentException(s"unknown flag $flag")
      case path :: t =>
        require(c.input.isEmpty, s"exactly one input path expected, got extra $path")
        loop(t, c.copy(input = Some(path)))
    }
    val c = loop(args.toList, Config())
    require(c.input.nonEmpty, "a documents parquet path is required")
    c
  }

  /** The composed decision table for `docs`; columns grow with the enabled
    * stages (mix -> sample_pct/kept_mix; budget -> cum_tokens/in_budget).
    * The final `keep` column reflects ALL enabled stages. */
  def decide(docs: DataFrame, c: Config,
      bench: Option[DataFrame] = None): DataFrame = {
    var table = Curation.curate(docs, c.minJaccard,
      minQualityBucket = c.minQuality, canonical = c.canonical)
    bench.foreach { b =>
      // hard exclusion like quality: a contaminated doc never ships
      val dec = Curation.decontaminate(docs, b)
        .select(col("doc_id"), col("n_overlap"), col("contaminated"))
      table = table.join(dec, "doc_id")
        .withColumn("keep", col("keep") && !col("contaminated"))
    }
    c.sourceCap.foreach { n =>
      // cap binds over the survivors so far, so excluded docs don't use up
      // a source's slots; in_cap joins back as a left-semi membership flag
      val kept = docs.join(table.filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val capped = Curation.capPerSource(kept, n).select("doc_id")
      table = table.join(capped.withColumn("in_cap", lit(true)), Seq("doc_id"), "left")
        .withColumn("in_cap", coalesce(col("in_cap"), lit(false)))
        .withColumn("keep", col("keep") && col("in_cap"))
    }
    if (c.mix.nonEmpty || c.mixDefault != 100) {
      val mixed = Curation.mixBySource(docs, c.mix, c.mixDefault)
        .select(col("doc_id"), col("sample_pct"), col("kept").as("kept_mix"))
      table = table.join(mixed, "doc_id")
        .withColumn("keep", col("keep") && col("kept_mix"))
    }
    if (c.splits.nonEmpty) {
      // pure annotation (membership-stable hash split) — never affects keep
      table = table.join(
        Curation.splitCorpus(docs, c.splits).select("doc_id", "split"), "doc_id")
    }
    c.budget.foreach { b =>
      // the budget is spent over the documents every earlier stage kept,
      // in doc_id order; dropped docs carry in_budget=false. The decision
      // table carries no text column, so surviving ids semi-join back to
      // the source docs for token counting.
      val kept = docs.join(table.filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val sampled = Curation.budgetSample(kept, b)
        .select(col("doc_id"), col("cum_tokens"), col("in_budget"))
      table = table.join(sampled, Seq("doc_id"), "left")
        .withColumn("in_budget", coalesce(col("in_budget"), lit(false)))
        .withColumn("keep", col("keep") && col("in_budget"))
    }
    c.stratified.foreach { n =>
      // the FINAL stage: an exact-n stratified subsample of everything
      // the earlier stages kept (quotas computed over the survivors, so
      // the sample composition reflects the shipped corpus)
      val kept = docs.join(table.filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val picked = Curation.stratifiedSample(kept, n).select("doc_id")
      table = table.join(picked.withColumn("in_sample", lit(true)),
          Seq("doc_id"), "left")
        .withColumn("in_sample", coalesce(col("in_sample"), lit(false)))
        .withColumn("keep", col("keep") && col("in_sample"))
    }
    table
  }

  def run(spark: SparkSession, c: Config): Unit = {
    val docs = spark.read.parquet(c.input.get)
    val bench = c.benchmark.map(spark.read.parquet(_))
    c.output.foreach { path =>
      decide(docs, c, bench).write.mode("overwrite").parquet(path)
      println(s"Outputting curation decisions to $path.")
    }
    c.statsOut.foreach { path =>
      Curation.corpusStats(docs).write.mode("overwrite").parquet(path)
      println(s"Outputting corpus stats to $path.")
    }
    c.cleanOutput.foreach { path =>
      // the SHIPPED corpus: curated survivors with cross-corpus repeated
      // chunks removed and the remainder reassembled in order
      val kept = docs.join(
        decide(docs, c, bench).filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      if (c.spanClean) {
        Dedup.cleanDupSpans(kept, c.spanWindow)
          .write.mode("overwrite").parquet(path)
        println(s"Outputting span-deduped corpus to $path.")
      } else {
        Dedup.paragraphDedup(kept, c.paragraphSpan)
          .write.mode("overwrite").parquet(path)
        println(s"Outputting chunk-deduped corpus to $path.")
      }
    }
    c.mixReport.foreach { path =>
      Curation.temperatureMix(docs).write.mode("overwrite").parquet(path)
      println(s"Outputting temperature-mix report to $path.")
    }
    if (c.output.isEmpty && c.statsOut.isEmpty && c.cleanOutput.isEmpty &&
        c.mixReport.isEmpty) {
      val d = decide(docs, c, bench)
      println(s"${d.filter(col("keep")).count()} of ${d.count()} documents kept " +
        "(no --output given).")
    }
  }

  def main(args: Array[String]): Unit = {
    val c = parseArgs(args.toIndexedSeq)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(c.master)
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, c) finally spark.stop()
  }
}
