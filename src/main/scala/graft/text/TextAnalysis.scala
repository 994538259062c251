package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over a
  * `documents(doc_id, text, ...)` table. Everything here is built from
  * codegen'd `org.apache.spark.sql.functions` (split / higher-order array
  * functions) — no UDFs, no shuffles except where aggregation is inherent.
  * All outputs are integers/strings so a SQL oracle can reproduce them
  * bit-for-bit (no floating point in results).
  */
object TextAnalysis {

  /** Tokenization contract shared with the SQL oracles: split on single
    * spaces (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  val Stopwords: Seq[String] = Seq("the", "a")

  /** Deterministic marker vocabularies for the language-ID heuristic.
    * A real pipeline would use character n-gram profiles; the *plumbing*
    * (per-doc scoring + argmax with alphabetical tiebreak) is the operator
    * under test and is exactly reproducible in SQL. Ordered alphabetically —
    * CASE priority = tiebreak order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("window", "group", "order"),
    "en" -> Seq("the", "a", "join"),
    "es" -> Seq("data", "query", "row"),
    "fr" -> Seq("table", "value", "line"),
    "zh" -> Seq("hash", "sort", "scan"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words.map(lit(_)): _*)))

  /** Per-document token statistics: (doc_id, n_tokens, n_distinct_tokens,
    * n_chars, max_token_len, n_stopwords). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"),
      length(col("text")).as("n_chars"),
      array_max(transform(t, w => length(w))).as("max_token_len"),
      countIn(t, Stopwords).as("n_stopwords"))
  }

  /** BPE-style subtoken counting: a GPT-2-flavoured regex partitions text
    * into letter runs, digit runs, and single non-alphanumeric marks — the
    * pre-tokenization a byte-pair encoder would refine. Counts only
    * (integer outputs, oracle-exact); the regex sticks to portable
    * character classes so Java and RE2-family engines agree.
    * Output: (doc_id, n_word_runs, n_digit_runs, n_marks, n_subtokens). */
  def subtokenCounts(docs: DataFrame): DataFrame = {
    def n(pattern: String) =
      size(regexp_extract_all(lower(col("text")), lit(pattern), lit(0)))
    docs.select(
      col("doc_id"),
      n("[a-z]+").as("n_word_runs"),
      n("[0-9]+").as("n_digit_runs"),
      n("[^a-z0-9 ]").as("n_marks"))
      .withColumn("n_subtokens",
        col("n_word_runs") + col("n_digit_runs") + col("n_marks"))
  }

  /** Adds `lang_guess` and `lang_score` columns map-side (no shuffle, no
    * join) — the composable form consumed by [[langId]] and the curation
    * pipeline. Argmax of marker hits, ties broken alphabetically. */
  def withLangId(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val scored = docs.select(
      (col("*") +: LangMarkers.map { case (lang, words) =>
        countIn(t, words).as(s"s_$lang")
      }): _*)
    val mx = greatest(LangMarkers.map(m => col(s"s_${m._1}")): _*)
    val guess = LangMarkers.foldRight(lit(null: String)) { case ((lang, _), acc) =>
      when(col(s"s_$lang") === mx, lang).otherwise(acc)
    }
    // foldRight builds WHEN de ... WHEN zh ELSE null: first (alphabetically
    // smallest) matching lang wins, mirroring the oracle's CASE order
    scored.withColumn("lang_guess", guess).withColumn("lang_score", mx)
      .drop(LangMarkers.map(m => s"s_${m._1}"): _*)
  }

  /** Language-ID: (doc_id, lang_guess, lang_score). */
  def langId(docs: DataFrame): DataFrame =
    withLangId(docs).select("doc_id", "lang_guess", "lang_score")

  /** Adds `n_tokens`, `repetition_pct`, `stopword_pct`, `quality_bucket`
    * columns map-side — the composable form consumed by [[qualityScore]]
    * and the curation pipeline. All integer-valued; bucket 0 = worst. */
  def withQuality(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    val nd = size(array_distinct(t))
    val ns = countIn(t, Stopwords)
    docs
      .withColumn("n_tokens", n)
      .withColumn("repetition_pct", floor(lit(100) * (n - nd) / n))
      .withColumn("stopword_pct", floor(lit(100) * ns / n))
      .withColumn("quality_bucket",
        when(col("n_tokens") < 10, 0)
          .when(col("repetition_pct") >= 80, 1)
          .when(col("stopword_pct") >= 30, 2)
          .otherwise(3))
  }

  /** Quality signals: (doc_id, n_tokens, repetition_pct, stopword_pct,
    * quality_bucket). */
  def qualityScore(docs: DataFrame): DataFrame =
    withQuality(docs).select("doc_id", "n_tokens", "repetition_pct",
      "stopword_pct", "quality_bucket")

  /** 3-token shingles of a document (the unit for fingerprinting and
    * near-dup detection). Empty array when the document has < 3 tokens. */
  def shingles(text: Column): Column = {
    val t = tokens(text)
    when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
      .otherwise(array())
  }

  /** Corpus TF-IDF: the top-k characteristic terms per document, scored
    * with INTEGER arithmetic so any SQL engine reproduces it bit-for-bit —
    * idf = floor(log2(N / df)) via the length of the binary rendering
    * (no floating log whose last ulp could flip a ranking). Three shuffles
    * at scale: (doc, term) tf counts, term df counts, and the per-doc
    * ranking window (partitioned by doc_id — never global). Output:
    * (doc_id, rank, term, score). */
  def tfIdf(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(total))
      .withColumn("idf", (length(bin(expr("n_docs DIV df"))) - 1).cast("long"))
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
  }

  /** Adjacent token pairs of a document ("a b", "b c", ...); empty array
    * below 2 tokens. */
  def bigrams(text: Column): Column = {
    val t = tokens(text)
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array())
  }

  /** Corpus-bigram language-model scoring — the n-gram perplexity proxy of
    * quality filtering: documents whose adjacent-token pairs are common in
    * the corpus score high, word-salad scores low. Integer arithmetic
    * end-to-end (score = sum over bigram occurrences of
    * floor(log2(corpus count)), via binary-string length like tfIdf) so a
    * SQL oracle reproduces it bit-for-bit. Two shuffles: the corpus model
    * (bigram counts, map-side combinable) and the per-doc sum; the
    * model-attach join is a plain equi-join on the bigram — hot bigrams
    * (stopword pairs) are exactly the AQE skew-join case, and the model
    * relation can swap to a broadcast under a frequency cap at scale.
    * Output: (doc_id, n_bigrams, score) — 0/0 for sub-2-token docs. */
  def bigramScore(docs: DataFrame): DataFrame = {
    val bg = docs.select(col("doc_id"), explode(bigrams(col("text"))).as("bg"))
    val model = bg.groupBy("bg").agg(count(lit(1)).as("n"))
    val scored = bg.join(model, "bg")
      .groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"),
        sum(length(bin(col("n"))) - 1).as("score"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Winnowing-style document fingerprint: the minimum md5 over all 3-token
    * shingles — a 1-permutation MinHash, stable under small edits and exactly
    * reproducible in SQL (md5 is engine-independent). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_min(transform(shingles(col("text")), s => md5(s))).as("fingerprint"))

  /** Rolling-hash document fingerprint: minimum Rabin-Karp hash over all
    * `window`-byte windows, via the native O(n) expression
    * [[graft.functions.RollingHashMin]] (one multiply-subtract-add per
    * byte — character-level winnowing where [[fingerprint]] is
    * token-level). -1 for documents shorter than the window. */
  def rollingFingerprint(docs: DataFrame, window: Int = 16): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    docs.select(col("doc_id"),
      ColumnBridge.column(graft.functions.RollingHashMin(
        ColumnBridge.expression(col("text")), window)).as("rolling_fp"))
  }
}
