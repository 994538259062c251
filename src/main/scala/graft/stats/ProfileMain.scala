package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runnable release-governance gate — the audit counterpart of the
  * curation CLI (graft.pipeline.CurateMain): a table path in, one
  * parquet verdict table per enabled audit out, with a one-line PASS /
  * FAIL summary per audit on stdout. The audits are the library
  * operators ([[Profile.kAnonymity]], [[Profile.lDiversity]],
  * [[Profile.keySkew]], [[Profile.qualityChecks]], [[Profile.ksDrift]])
  * — this program only composes them over parquet in/out, so a release
  * pipeline can gate on it without writing Spark code.
  *
  * {{{
  * graft.stats.ProfileMain [audits] --output DIR <table path (parquet)>
  *   --output DIR           each enabled audit writes DIR/<audit>.parquet
  *   --k-anon COLS[:K]      k-anonymity over comma-separated quasi cols
  *                          (default K = 5); verdict = violating combos
  *   --l-div COLS:SENS[:L]  l-diversity of SENS within the quasi combos
  *                          (default L = 3); verdict = low-diversity combos
  *   --key-skew COL[:K]     top-K hash-partition skew report (default 20)
  *   --quality KEYCOL       constraint suite keyed on KEYCOL
  *   --not-null C1,C2       quality: columns that must be non-null
  *   --non-negative C1,C2   quality: columns that must be >= 0
  *   --domain COL:V1|V2     quality: allowed value set (repeatable)
  *   --drift SLICE:A:B:VAL  two-sample KS distance of VAL between the
  *                          SLICE=A and SLICE=B rows
  *   --master M             Spark master (default local[*])
  * }}}
  *
  * Gate semantics (printed, and the process exit code): k-anon / l-div
  * PASS on zero violating groups, quality PASSes when every check row
  * passes; key-skew and drift are advisory reports (always PASS — the
  * thresholds that would fail them are a policy choice, not a library
  * one). Exit code 1 when any gating audit fails — the contract a CI
  * release job consumes.
  */
object ProfileMain {

  final case class Config(
      input: Option[String] = None,
      output: Option[String] = None,
      kAnon: Option[(Seq[String], Long)] = None,
      lDiv: Option[(Seq[String], String, Long)] = None,
      keySkew: Option[(String, Int)] = None,
      qualityKey: Option[String] = None,
      notNull: Seq[String] = Nil,
      nonNegative: Seq[String] = Nil,
      domains: Map[String, Seq[String]] = Map.empty,
      drift: Option[(String, String, String, String)] = None,
      master: String = "local[*]")

  def parseArgs(args: Seq[String]): Config = {
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Config = rest match {
      case Nil => c
      case "--output" :: v :: t => loop(t, c.copy(output = Some(v)))
      case "--k-anon" :: v :: t =>
        val (cols, k) = v.split(":") match {
          case Array(cs) => (cs, 5L)
          case Array(cs, kk) => (cs, kk.toLong)
        }
        loop(t, c.copy(kAnon = Some((cols.split(",").toSeq, k))))
      case "--l-div" :: v :: t =>
        val p = v.split(":")
        require(p.length == 2 || p.length == 3,
          s"--l-div wants COLS:SENSITIVE[:L], got $v")
        loop(t, c.copy(lDiv = Some((p(0).split(",").toSeq, p(1),
          if (p.length == 3) p(2).toLong else 3L))))
      case "--key-skew" :: v :: t =>
        val (col0, k) = v.split(":") match {
          case Array(cc) => (cc, 20)
          case Array(cc, kk) => (cc, kk.toInt)
        }
        loop(t, c.copy(keySkew = Some((col0, k))))
      case "--quality" :: v :: t => loop(t, c.copy(qualityKey = Some(v)))
      case "--not-null" :: v :: t =>
        loop(t, c.copy(notNull = v.split(",").toSeq))
      case "--non-negative" :: v :: t =>
        loop(t, c.copy(nonNegative = v.split(",").toSeq))
      case "--domain" :: v :: t =>
        val Array(cc, vals) = v.split(":", 2)
        loop(t, c.copy(domains = c.domains + (cc -> vals.split("\\|").toSeq)))
      case "--drift" :: v :: t =>
        val p = v.split(":")
        require(p.length == 4, s"--drift wants SLICE:A:B:VALUE, got $v")
        loop(t, c.copy(drift = Some((p(0), p(1), p(2), p(3)))))
      case "--master" :: v :: t => loop(t, c.copy(master = v))
      case flag :: _ if flag.startsWith("--") =>
        throw new IllegalArgumentException(s"unknown flag $flag")
      case path :: t =>
        require(c.input.isEmpty, s"exactly one input path expected, got extra $path")
        loop(t, c.copy(input = Some(path)))
    }
    val c = loop(args.toList, Config())
    require(c.input.nonEmpty, "a table parquet path is required")
    require(c.kAnon.nonEmpty || c.lDiv.nonEmpty || c.keySkew.nonEmpty ||
      c.qualityKey.nonEmpty || c.drift.nonEmpty,
      "enable at least one audit (--k-anon/--l-div/--key-skew/--quality/--drift)")
    require(c.output.nonEmpty, "--output DIR is required")
    c
  }

  /** Run every enabled audit; write each verdict parquet; return
    * (audit name, passed) per GATING audit (advisory reports excluded). */
  def run(spark: SparkSession, c: Config): Seq[(String, Boolean)] = {
    val df = spark.read.parquet(c.input.get)
    val out = c.output.get
    def write(name: String, v: DataFrame): DataFrame = {
      v.write.mode("overwrite").parquet(s"$out/$name.parquet")
      spark.read.parquet(s"$out/$name.parquet") // re-read: verdict == artifact
    }
    val gates = Seq.newBuilder[(String, Boolean)]
    c.kAnon.foreach { case (quasi, k) =>
      val n = write("k_anon", Profile.kAnonymity(df, quasi, k)).count()
      gates += (("k_anon", n == 0L))
      println(s"k_anon: $n groups below k=$k -> ${if (n == 0) "PASS" else "FAIL"}")
    }
    c.lDiv.foreach { case (quasi, sens, l) =>
      val n = write("l_div", Profile.lDiversity(df, quasi, sens, l)).count()
      gates += (("l_div", n == 0L))
      println(s"l_div: $n groups below l=$l -> ${if (n == 0) "PASS" else "FAIL"}")
    }
    c.keySkew.foreach { case (kc, k) =>
      val top = write("key_skew", Profile.keySkew(df, col(kc), k))
      val hot = top.orderBy("rank").select("share_e6").head.getLong(0)
      println(s"key_skew: hottest '$kc' share ${hot / 10000.0}% (advisory)")
    }
    c.qualityKey.foreach { key =>
      val v = write("quality",
        Profile.qualityChecks(df, key, c.notNull, c.domains, c.nonNegative))
      val failed = v.filter(!col("passed")).count()
      gates += (("quality", failed == 0L))
      println(s"quality: $failed of ${v.count()} checks failed -> " +
        (if (failed == 0) "PASS" else "FAIL"))
    }
    c.drift.foreach { case (slice, a, b, value) =>
      val d = write("drift", Profile.ksDrift(df, slice, a, b, col(value)))
        .head.getAs[Double]("d")
      println(s"drift: KS($slice=$a vs $b over $value) = $d (advisory)")
    }
    gates.result()
  }

  def main(args: Array[String]): Unit = {
    val c = parseArgs(args.toIndexedSeq)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(c.master)
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gates = try run(spark, c) finally spark.stop()
    if (gates.exists(!_._2)) sys.exit(1)
  }
}
