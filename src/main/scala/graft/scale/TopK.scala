package graft.scale

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate. */
final case class ScoredRow(key: Long, id: Long, score: Double)

/** Bounded top-k buffer: parallel arrays sorted by (score desc, id asc),
  * never longer than k. */
final case class TopKBuf(scores: Array[Double], ids: Array[Long])

/** Bounded top-k per key WITHOUT a ranking window. The window shape
  * (`row_number over (partition by key order by score)`) SORTS every
  * key's full candidate list — O(n log n) and all candidates buffered;
  * this typed Aggregator keeps only k entries per group, so memory per
  * aggregation buffer is O(k) and work is O(n log k), with partial
  * aggregation combining map-side. The tradeoff is leaving whole-stage
  * codegen (ObjectHashAggregate) — worth it when candidates-per-key is
  * large (the ANN scorers' regime at scale), not for tiny groups; the
  * ranking-window formulation remains in the sim scorers where measured
  * candidate lists are small. Ties break by ascending id — the same
  * deterministic order the window queries use. */
final class TopKAggregator(k: Int) extends Aggregator[ScoredRow, TopKBuf, Array[(Long, Double)]] {
  require(k > 0)

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  // true if (s1, i1) ranks strictly better than (s2, i2)
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def reduce(b: TopKBuf, r: ScoredRow): TopKBuf = {
    val n = b.scores.length
    if (n == k && !better(r.score, r.id, b.scores(n - 1), b.ids(n - 1))) b
    else {
      // insertion position by (score desc, id asc)
      var p = 0
      while (p < n && !better(r.score, r.id, b.scores(p), b.ids(p))) p += 1
      val m = math.min(n + 1, k)
      val ss = new Array[Double](m); val is = new Array[Long](m)
      System.arraycopy(b.scores, 0, ss, 0, p)
      System.arraycopy(b.ids, 0, is, 0, p)
      if (p < m) { ss(p) = r.score; is(p) = r.id }
      val tail = m - p - 1
      if (tail > 0) {
        System.arraycopy(b.scores, p, ss, p + 1, tail)
        System.arraycopy(b.ids, p, is, p + 1, tail)
      }
      TopKBuf(ss, is)
    }
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    val m = math.min(a.scores.length + b.scores.length, k)
    val ss = new Array[Double](m); val is = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA = j >= b.scores.length ||
        (i < a.scores.length && better(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
      if (takeA) { ss(o) = a.scores(i); is(o) = a.ids(i); i += 1 }
      else { ss(o) = b.scores(j); is(o) = b.ids(j); j += 1 }
      o += 1
    }
    TopKBuf(ss, is)
  }

  override def finish(b: TopKBuf): Array[(Long, Double)] =
    b.ids.zip(b.scores)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.Encoders.kryo[Array[(Long, Double)]]
}

/** One candidate with a STRING sort key (ascending order domain). */
final case class StrKeyRow(key: Long, id: Long, skey: String)

/** Bounded bottom-k buffer: parallel arrays sorted by (skey asc, id asc),
  * never longer than k. */
final case class BottomKStrBuf(skeys: Array[String], ids: Array[Long])

/** Bounded BOTTOM-k per key by (skey asc, id asc) — the ascending,
  * string-keyed twin of [[TopKAggregator]], for orders that are not
  * representable as a double without truncation (md5-shuffled sampling
  * picks the k smallest hex digests EXACTLY; a 52-bit double prefix
  * would reorder prefix-colliding pairs, which at 10^10 rows is a
  * certainty, not a tail risk). Same scale contract: O(k) buffer per
  * group, O(n log k) work, map-side partial combine — never a full
  * per-key sort. */
final class BottomKStrAggregator(k: Int)
    extends Aggregator[StrKeyRow, BottomKStrBuf, Array[(Long, String)]] {
  require(k > 0)

  override def zero: BottomKStrBuf = BottomKStrBuf(Array.empty, Array.empty)

  // true if (s1, i1) ranks strictly better (smaller) than (s2, i2)
  private def better(s1: String, i1: Long, s2: String, i2: Long): Boolean = {
    val c = s1.compareTo(s2)
    c < 0 || (c == 0 && i1 < i2)
  }

  override def reduce(b: BottomKStrBuf, r: StrKeyRow): BottomKStrBuf = {
    val n = b.skeys.length
    if (n == k && !better(r.skey, r.id, b.skeys(n - 1), b.ids(n - 1))) b
    else {
      var p = 0
      while (p < n && !better(r.skey, r.id, b.skeys(p), b.ids(p))) p += 1
      val m = math.min(n + 1, k)
      val ss = new Array[String](m); val is = new Array[Long](m)
      System.arraycopy(b.skeys, 0, ss, 0, p)
      System.arraycopy(b.ids, 0, is, 0, p)
      if (p < m) { ss(p) = r.skey; is(p) = r.id }
      val tail = m - p - 1
      if (tail > 0) {
        System.arraycopy(b.skeys, p, ss, p + 1, tail)
        System.arraycopy(b.ids, p, is, p + 1, tail)
      }
      BottomKStrBuf(ss, is)
    }
  }

  override def merge(a: BottomKStrBuf, b: BottomKStrBuf): BottomKStrBuf = {
    val m = math.min(a.skeys.length + b.skeys.length, k)
    val ss = new Array[String](m); val is = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA = j >= b.skeys.length ||
        (i < a.skeys.length && better(a.skeys(i), a.ids(i), b.skeys(j), b.ids(j)))
      if (takeA) { ss(o) = a.skeys(i); is(o) = a.ids(i); i += 1 }
      else { ss(o) = b.skeys(j); is(o) = b.ids(j); j += 1 }
      o += 1
    }
    BottomKStrBuf(ss, is)
  }

  override def finish(b: BottomKStrBuf): Array[(Long, String)] =
    b.ids.zip(b.skeys)

  override def bufferEncoder: Encoder[BottomKStrBuf] = Encoders.product[BottomKStrBuf]
  override def outputEncoder: Encoder[Array[(Long, String)]] =
    org.apache.spark.sql.Encoders.kryo[Array[(Long, String)]]
}

object TopK {

  /** Bottom-k rows per key from a (key, id, skey) relation:
    * (key, rank, id), rank 1..k by (skey asc, id asc). Result-identical
    * to the ranking-window formulation (spec-pinned). */
  def bottomKStrPerKey(df: DataFrame, key: String, id: String, skey: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new BottomKStrAggregator(k)
    df.select(col(key).cast("long").as("key"), col(id).cast("long").as("id"),
        col(skey).cast("string").as("skey"))
      .as[StrKeyRow]
      .groupByKey(_.key)
      .agg(agg.toColumn.name("bottom"))
      .flatMap { case (key, bottom) =>
        bottom.iterator.zipWithIndex.map { case ((id, _), r) =>
          (key, r + 1, id)
        }
      }
      .toDF(key, "rank", id)
  }

  /** Top-k rows per key from a (key, id, score) relation:
    * (key, rank, id, score), rank 1..k by (score desc, id asc). Result-
    * identical to the ranking-window formulation (spec-pinned). */
  def topKPerKey(df: DataFrame, key: String, id: String, score: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k)
    df.select(col(key).cast("long").as("key"), col(id).cast("long").as("id"),
        col(score).cast("double").as("score"))
      .as[ScoredRow]
      .groupByKey(_.key)
      .agg(agg.toColumn.name("top"))
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((id, score), r) =>
          (key, r + 1, id, score)
        }
      }
      .toDF(key, "rank", id, score)
  }
}
