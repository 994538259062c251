package graft.rdf

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** RDF triple inputs for the CIND engine.
  *
  * Two sources:
  *   1. `derive(spark, dir)` — a deterministic triple view over the driver's
  *      TPC-H-ish parquet tables (see TESTDATA.md). `DUCKDB_CTE` is the exact
  *      same derivation in ANSI SQL, so every oracle query and the Spark
  *      engine consume identical relations (FIXTURES.md §3).
  *   2. `parseNTriples` — N-Triples/N-Quads text parsing for reference-parity
  *      file inputs (reference programs/RDFind.scala:211-237: `#` comment
  *      filter, whitespace-separated terms, trailing `.`, optional 4th field
  *      ignored).
  */
object TripleSource {

  /** (table, subj prefix+key, Seq(pred -> obj expression)) — kept in one
    * place so the Spark and SQL derivations cannot drift. Only int keys and
    * low-cardinality strings: no doubles/timestamps, whose text rendering
    * differs across engines. */
  private case class Derivation(table: String, keyCol: String, subjPrefix: String,
      preds: Seq[(String, String, Boolean)]) // (pred, column, isRefToEntity w/ prefix)

  private val derivations = Seq(
    Derivation("orders", "o_orderkey", "order:", Seq(
      ("status", "o_orderstatus", false),
      ("priority", "o_orderpriority", false),
      ("customer", "o_custkey", true))),
    Derivation("customer", "c_custkey", "customer:", Seq(
      ("segment", "c_mktsegment", false),
      ("nation", "c_nationkey", true))),
    Derivation("supplier", "s_suppkey", "supplier:", Seq(
      ("nation", "s_nationkey", true))),
    Derivation("nation", "n_nationkey", "nation:", Seq(
      ("name", "n_name", false),
      ("region", "n_regionkey", true))),
    Derivation("region", "r_regionkey", "region:", Seq(
      ("name", "r_name", false))),
    Derivation("part", "p_partkey", "part:", Seq(
      ("brand", "p_brand", false),
      ("ptype", "p_type", false))),
    Derivation("lineitem", "l_orderkey", "lineitem:", Seq(
      ("part", "l_partkey", true),
      ("supplier", "l_suppkey", true),
      ("flag", "l_returnflag", false)))
  )

  /** Entity prefix for reference columns, keyed by (table, column). */
  private val refPrefix = Map(
    "o_custkey" -> "customer:", "c_nationkey" -> "nation:",
    "s_nationkey" -> "nation:", "n_regionkey" -> "region:",
    "l_partkey" -> "part:", "l_suppkey" -> "supplier:")

  /** Lineitem needs a composite subject key; everything else uses keyCol. */
  private def subjSqlExpr(d: Derivation): String =
    if (d.table == "lineitem")
      s"'${d.subjPrefix}' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
    else s"'${d.subjPrefix}' || CAST(${d.keyCol} AS VARCHAR)"

  private def objSqlExpr(col: String, isRef: Boolean): String =
    if (isRef) s"'${refPrefix(col)}' || CAST($col AS VARCHAR)" else col

  /** The derivation as a DuckDB/ANSI CTE body (no WITH keyword):
    * `triples AS (SELECT ... UNION ALL ...)`. */
  val DUCKDB_CTE: String = {
    val arms = for {
      d <- derivations
      (pred, col, isRef) <- d.preds
    } yield s"SELECT ${subjSqlExpr(d)} AS subj, '$pred' AS pred, ${objSqlExpr(col, isRef)} AS obj FROM ${d.table}"
    "triples AS (" + arms.mkString(" UNION ALL ") + ")"
  }

  /** Same derivation on Spark: ONE pruned parquet scan per table, fanned out
    * to its (pred, obj) pairs with a single generate — at scale this reads
    * each base table once instead of once per predicate. */
  def derive(spark: SparkSession, dir: String): DataFrame = {
    val frames = derivations.map { d =>
      val t = graft.Tables.read(spark, dir, d.table)
      val subj =
        if (d.table == "lineitem")
          concat(lit(d.subjPrefix), col("l_orderkey").cast("string"),
            lit(":"), col("l_linenumber").cast("string"))
        else concat(lit(d.subjPrefix), col(d.keyCol).cast("string"))
      val pairs = d.preds.map { case (pred, objCol, isRef) =>
        val obj =
          if (isRef) concat(lit(refPrefix(objCol)), col(objCol).cast("string"))
          else col(objCol).cast("string")
        struct(lit(pred).as("pred"), obj.as("obj"))
      }
      t.select(subj.as("subj"), explode(array(pairs: _*)).as("po"))
        .select(col("subj"), col("po.pred").as("pred"), col("po.obj").as("obj"))
    }
    val df = frames.reduce(_.unionAll(_))
    // Small-file inputs yield one scan partition per parquet file (9 here),
    // strangling the CPU-bound capture fan-out downstream (profiled: the
    // two heaviest CIND map stages ran 9-wide on 32 cores). One cheap
    // round-robin shuffle of the raw triples fixes local parallelism; at
    // real scale the scan already yields >= defaultParallelism partitions
    // and this is a no-op. The partition estimate mirrors Spark's own
    // FilePartition packing (maxSplitBytes) over cheap file metadata —
    // the old `df.rdd.getNumPartitions` probe built the full physical
    // plan + RDD graph on the driver on EVERY query invocation (~0.1-0.3 s
    // each, ~40 triple queries in the bench) for the same yes/no answer.
    val want = spark.sparkContext.defaultParallelism
    if (estimatedScanPartitions(spark, dir) < want) df.repartition(want) else df
  }

  /** Spark's FilePartition sizing over the derivation's parquet files,
    * computed PER TABLE exactly as Spark packs each scan with its own
    * maxSplitBytes (ADVICE r13: pooling all tables into one computation
    * strictly under-estimated the union's real partition count, which
    * could trigger a repartition the plan-probe would have skipped):
    * per scan, maxSplitBytes = min(maxPartitionBytes, max(openCost,
    * tableBytesWithCost / minPartitionNum)), partitions ~
    * ceil(tableBytesWithCost / maxSplitBytes); the union's count is the
    * sum. Metadata-only (one getFileStatus per table); an unexpected
    * IOException is logged (stderr) and treated as an empty table rather
    * than silently zeroed. */
  private def estimatedScanPartitions(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    def bytesSuffix(key: String, default: Long): Long =
      spark.conf.getOption(key)
        .map(v => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
        .getOrElse(default)
    val maxPartitionBytes = bytesSuffix("spark.sql.files.maxPartitionBytes", 128L << 20)
    val openCost = bytesSuffix("spark.sql.files.openCostInBytes", 4L << 20)
    val minPartitionNum = spark.conf.getOption("spark.sql.files.minPartitionNum")
      .map(_.toLong).getOrElse(spark.sparkContext.defaultParallelism.toLong)
    derivations.map { d =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/${d.table}.parquet")
      val fs = p.getFileSystem(conf)
      val statuses =
        try {
          val st = fs.getFileStatus(p)
          if (st.isDirectory) fs.listStatus(p).toSeq.filterNot(_.isDirectory)
          else Seq(st)
        } catch {
          case _: java.io.FileNotFoundException => Seq.empty
          case e: java.io.IOException =>
            System.err.println(s"graft.rdf: listing $p failed ($e); " +
              "treating table as empty for the partition estimate")
            Seq.empty
        }
      val tableBytes = statuses.map(_.getLen + openCost).sum
      if (tableBytes <= 0L) 0L
      else {
        val maxSplitBytes = math.min(maxPartitionBytes,
          math.max(openCost, tableBytes / math.max(1L, minPartitionNum)))
        (tableBytes + maxSplitBytes - 1) / maxSplitBytes
      }
    }.sum
  }

  /** Read triple files into (subj, pred, obj): N-Triples / N-Quads /
    * tab-separated, plain or compressed, glob patterns and directories
    * (reference MultiFileTextInputFormat.java:50-368 + the extension
    * dispatch in programs/RDFind.scala:220-237). Spark's text source
    * natively expands globs, splits multi-file inputs, and decodes
    * gzip/deflate by extension — the input-format plumbing the reference
    * hand-rolled — and [[parseLine]]'s whitespace splitting with an
    * optional ignored 4th term subsumes all three of its parser variants
    * (NTriplesParser, NTriplesParser('\t'), NQuadsParser). */
  def readTriples(spark: SparkSession, paths: Seq[String]): DataFrame =
    parseNTriples(spark.read.textFile(paths: _*))

  /** Estimate the number of triples in text inputs WITHOUT a full pass
    * (reference programs/RDFind.scala:109-136): parse the first
    * `sampleLines` lines, count the parseable (non-comment, 3-term) ones,
    * and extrapolate by total byte size. Drives Bloom-filter sizing in
    * [[graft.Main]] (reference FrequentConditionPlanner.scala:34-38:
    * expected elements = estTriples / minSupport) — an estimate only ever
    * sizes sketches, so being off means looser filters, never wrong
    * results. Compressed inputs extrapolate compressed bytes with the
    * sample's uncompressed line size (same bias as the reference's
    * byte-ratio trick; fine for sizing). */
  def estimateTripleCount(spark: SparkSession, paths: Seq[String],
      sampleLines: Int = 10000): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val totalBytes = paths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filterNot(_.isDirectory)
        else Seq(st)
      }.map(_.getLen).sum
    }.sum
    val sample = spark.read.textFile(paths: _*).limit(sampleLines).collect()
    if (sample.isEmpty || totalBytes == 0L) return 0L
    // +1 per line for the newline the text source strips
    val sampleBytes = sample.map(_.getBytes("UTF-8").length.toLong + 1L).sum
    val parseable = sample.count(l =>
      l.nonEmpty && !l.startsWith("#") && parseLine(l).isDefined)
    math.round(parseable.toDouble * totalBytes / sampleBytes)
  }

  private val PrefixPattern = """@prefix\s+(\S+): <(\S+)>\s*\.\n?""".r
  private val BasePattern = """@prefix\s+<(\S+)>\s*\.\n?""".r

  /** Parse Turtle-style `@prefix pfx: <url> .` lines into (prefix, url)
    * (reference operators/ParseRdfPrefixes.scala:13-28; a bare
    * `@prefix <url> .` base gets prefix ""). Unlike the reference (which
    * throws), non-prefix lines are skipped so prefixes can be pulled
    * straight out of a mixed Turtle-ish input. */
  def parseRdfPrefixes(lines: Dataset[String]): Dataset[(String, String)] = {
    import lines.sparkSession.implicits._
    lines.flatMap {
      case PrefixPattern(p, url) => Some((p, url))
      case BasePattern(url)      => Some(("", url))
      case _                     => None
    }
  }

  /** Parse N-Triples / N-Quads lines into (subj, pred, obj). Lines starting
    * with '#' are dropped; `<uri>` brackets are kept as-is (they are part of
    * the value space, matching the reference's raw-term handling); quoted
    * literals may contain spaces; an optional 4th term (N-Quads graph) and
    * the trailing '.' are ignored.
    */
  def parseNTriples(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    lines
      .filter(l => l != null && l.nonEmpty && !l.startsWith("#"))
      .flatMap(parseLine)
      .toDF("subj", "pred", "obj")
  }

  private[rdf] def parseLine(line: String): Option[(String, String, String)] = {
    val terms = new scala.collection.mutable.ArrayBuffer[String](4)
    var i = 0
    val n = line.length
    while (i < n && terms.length < 3) {
      while (i < n && (line.charAt(i) == ' ' || line.charAt(i) == '\t')) i += 1
      if (i < n) {
        val start = i
        if (line.charAt(i) == '"') {
          i += 1
          while (i < n && line.charAt(i) != '"') {
            if (line.charAt(i) == '\\') i += 1
            i += 1
          }
          if (i < n) i += 1 // closing quote
          // language tag / datatype suffix sticks to the literal
          while (i < n && line.charAt(i) != ' ' && line.charAt(i) != '\t') i += 1
        } else {
          while (i < n && line.charAt(i) != ' ' && line.charAt(i) != '\t') i += 1
        }
        terms += line.substring(start, i)
      }
    }
    if (terms.length == 3) Some((terms(0), terms(1), terms(2))) else None
  }
}
