package graft.rdf

import graft.core.StringTrie
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
    * analog of Flink's broadcast-set + open() pattern. */
  def shortenTriples(triples: DataFrame, prefixes: Seq[(String, String)]): DataFrame = {
    val trie = new StringTrie[String]
    prefixes.foreach { case (url, ns) => trie.put(url, ns) }
    val shorten = udf { (v: String) =>
      val e = trie.longestPrefixEntry(v)
      if (e == null) v else e._2 + v.substring(e._1.length)
    }
    triples.select(
      shorten(col("subj")).as("subj"),
      col("pred"),
      shorten(col("obj")).as("obj"))
  }
}
