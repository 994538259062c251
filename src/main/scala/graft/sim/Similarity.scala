package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *     set against the full collection; the per-pair dot product is a
  *     codegen'd zip_with/aggregate, no UDF.
  *   - [[lshTopK]]: random-hyperplane LSH — deterministic signed projections
  *     bucket the collection; only same-bucket pairs are scored. At 100 TB
  *     this is the scale path: the bucket join replaces the cross product,
  *     and bucket skew is bounded because signatures are balanced bits.
  */
object Similarity {

  /** Cosine similarity of two ARRAY<FLOAT> columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbours for each query vector (queries = rows matching
    * `queryPred`, e.g. vec_id % 100 == 0). Output:
    * (query_id, rank, neighbor_id), rank 1..k by descending cosine with
    * vec_id as the deterministic tiebreak. Self-pairs excluded. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  val NumPlanes = 16

  /** Deterministic pseudo-random hyperplanes (seeded, fixed across runs). */
  private def planes(dims: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(42)
    Array.fill(NumPlanes)(Array.fill(dims)(rnd.nextGaussian()))
  }

  /** Signed-projection signature: bit p = sign(v . plane_p). */
  def signature(emb: Column, dims: Int): Column = {
    val ps = planes(dims)
    (0 until NumPlanes).map { p =>
      val plane = lit(ps(p))  // literal ARRAY<DOUBLE>, folded into the plan
      val d = aggregate(zip_with(emb, plane, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << p)).otherwise(0L)
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** Approximate top-k via multi-table banded LSH: the 16-bit signature is
    * split into 4 bands of 4 bits; a vector is a candidate for a query iff
    * they agree on at least one band (union over tables, like MinHash-LSH
    * banding). Only candidates are scored — at scale the band-bucket join
    * replaces the cross product. Output shape matches [[bruteForceTopK]];
    * recall measured against it in the spec. */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int, dims: Int,
      bandBits: Int = 4): DataFrame = {
    val bands = NumPlanes / bandBits
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame): DataFrame = df
      .withColumn("sig", signature(col("embedding"), dims))
      .select(col("*"), posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bucket")))
    val b = banded(emb)
    val q = banded(emb.filter(queryPred))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("band").as("q_band"), col("bucket").as("q_bucket"))
    val candidates = b.join(broadcast(q),
        col("band") === col("q_band") && col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("q_emb"), col("embedding"))
      .dropDuplicates("query_id", "vec_id")
    val scored = candidates.select(col("query_id"), col("vec_id"),
      cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path:
    * a small coarse-quantizer codebook partitions the collection into
    * inverted lists; queries probe only the nProbe nearest lists. The
    * codebook here is a deterministic seed sample (the numCentroids
    * smallest vec_ids) — production systems would k-means-refine it, which
    * changes only codebook quality, not the dataflow: assignment is a
    * broadcast argmin, lists are a hash-partitioned relation, probing is a
    * broadcast join on centroid id. Output shape matches
    * [[bruteForceTopK]]; recall bounded in the spec. */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int,
      numCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = broadcast(emb.orderBy("vec_id").limit(numCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent")))
    def nearestCentroids(df: DataFrame, n: Int, idCol: String): DataFrame = {
      val w = Window.partitionBy(idCol).orderBy(col("cs").desc, col("cent_id"))
      df.crossJoin(cents)
        .withColumn("cs", cosine(col("embedding"), col("cent")))
        .withColumn("cr", row_number().over(w))
        .filter(col("cr") <= n)
        .drop("cs", "cr", "cent")
    }
    val lists = nearestCentroids(emb, 1, "vec_id") // inverted lists
    val probes = nearestCentroids(emb.filter(queryPred), nProbe, "vec_id")
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cent_id"))
    val scored = lists.join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** Embedding near-duplicate pairs: cosine >= minCosine, via LSH buckets
    * (both full-signature agreement improbable for non-near vectors). */
  def cosineNearDupPairs(emb: DataFrame, minCosine: Double, dims: Int): DataFrame = {
    val sig = emb.withColumn("bucket", signature(col("embedding"), dims))
    sig.as("x").join(sig.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id_a"), col("y.vec_id").as("vec_id_b"),
        cosine(col("x.embedding"), col("y.embedding")).as("score"))
      .filter(col("score") >= minCosine)
  }
}
