package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  lazy val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val e = emb(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f)))
    val r = Similarity.bruteForceTopK(e, col("vec_id") === 0, 3).collect()
      .map(x => (x.getInt(1), x.getLong(2)))
    assert(r.toSeq == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("lshTopK achieves reasonable recall@10 against brute force on real embeddings") {
    val queries = col("vec_id") % 50 === 0
    val brute = Similarity.bruteForceTopK(real, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(real, queries, 10, dims = 64).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall") // 8-bit buckets prune ~255/256 of pairs
    assert(lsh.nonEmpty)
  }

  test("ivfTopK achieves reasonable recall@10 against brute force") {
    val queries = col("vec_id") % 50 === 0
    val brute = Similarity.bruteForceTopK(real, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(real, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall") // 4 of 16 lists probed
  }

  test("pqTopK: ADC ranking approximates exact integer-L2 ranking") {
    import spark.implicits._
    val queries = col("vec_id") % 50 === 0
    // exact squared-L2 top-10 in the SAME quantized integer space PQ codes
    val qz = real.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1024).cast("long")).as("qe"))
    val qs = qz.filter(queries).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val all = qz.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val exact = qs.map { case (qid, q) =>
      qid -> all.filter(_._1 != qid)
        .map { case (vid, v) =>
          (vid, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (vid, d) => (d, vid) }.take(10).map(_._1).toSet
    }.toMap
    val pq = Similarity.pqTopK(real, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    assert(pq.keySet == exact.keySet)
    // per-QUERY hit counts (a set-typed .keys.map would dedup equal counts)
    val hits = exact.toSeq.map { case (q, s) => (s & pq(q)).size }.sum
    val recall = hits.toDouble / (exact.size * 10)
    assert(recall >= 0.6, s"PQ recall@10 $recall") // ADC candidates + exact rerank
    // re-ranked distances are the EXACT integer L2 and ascend with rank
    val byQ = Similarity.pqTopK(real, queries, 10).collect()
      .groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      val ds = sorted.map(_.getLong(3))
      assert(ds.sameElements(ds.sorted), "l2_dist ascends with rank")
      sorted.foreach { r =>
        val vid = r.getLong(2)
        val q = qs.find(_._1 == r.getLong(0)).get._2
        val v = all.find(_._1 == vid).get._2
        val want = v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        assert(r.getLong(3) == want, "reported distance is the exact integer L2")
      }
    }
  }

  test("ivfPqTopK: full probe equals the full PQ scan; partial probe recalls") {
    val queries = col("vec_id") % 50 === 0
    val full = Similarity.pqTopK(real, queries, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    // nProbe = nLists: every list probed -> candidate set identical to the
    // full crossJoin's -> identical output
    val allProbe = Similarity.ivfPqTopK(real, queries, 10,
      nLists = 16, nProbe = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(allProbe == full)
    // partial probe: a subset of the scored pairs -> recall against the
    // full scan is high but bounded; every returned distance is exact
    val part = Similarity.ivfPqTopK(real, queries, 10,
      nLists = 16, nProbe = 4).collect()
    val fullIds = full.groupBy(_._1).map { case (q, s) => q -> s.map(_._3) }
    val hits = part.count(r => fullIds(r.getLong(0)).contains(r.getLong(2)))
    assert(hits.toDouble / full.size >= 0.4,
      s"ivfpq@4/16 recall vs full PQ scan: $hits/${full.size}")
  }

  test("persisted IVF-PQ index: re-open == retrain, bit for bit") {
    val queries = col("vec_id") % 50 === 0
    val path = java.nio.file.Files.createTempDirectory("ivfpq_spec").toString
    Similarity.writeIvfPqIndex(real, path, nLists = 16)
    val idx = Similarity.readIvfPqIndex(spark, path)
    // the re-opened codebooks ARE the trained ones (collect round-trip)
    assert(idx.numSub == 4 && idx.coarse.length == 16 && idx.fine.length == 16)
    val fromIndex = Similarity.ivfPqTopKIndexed(real, queries, 10, idx, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val retrained = Similarity.ivfPqTopK(real, queries, 10,
      nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(fromIndex.sorted.toSeq == retrained.sorted.toSeq)
    // the persisted lists are PARTITIONED by cent_id: one directory per
    // inverted list, so a probed search scans only the probed lists
    val dirs = new java.io.File(s"$path/lists.parquet").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cent_id="))
    assert(dirs.nonEmpty && dirs.length <= 16, dirs.toSeq.toString)
  }

  test("ivfPqResidualTopK: recall >= the non-residual path at equal params, distances exact") {
    import org.apache.spark.sql.DataFrame
    // the sf0.01 fixture (2k vectors, ~125/list): residual training needs
    // enough rows per list for its statistical advantage to be measurable
    // — at sf0.001 (~12/list) both paths are within one hit of each other
    val real = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = col("vec_id") % 50 === 0
    // exact integer-L2 ground truth over the quantized vectors
    val qz = real.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * 1024).cast("long")).as("qe"))
    val all = qz.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val qs = all.filter(_._1 % 50 == 0)
    val exact = qs.map { case (qid, q) =>
      qid -> all.filter(_._1 != qid)
        .map { case (vid, v) =>
          (vid, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (vid, d) => (d, vid) }.take(10).map(_._1).toSet
    }.toMap
    def recallOf(df: DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
      exact.toSeq.map { case (q, s) =>
        (s & got.getOrElse(q, Set.empty)).size }.sum.toDouble / (exact.size * 10)
    }
    val nonRes = recallOf(Similarity.ivfPqTopK(real, queries, 10,
      nLists = 16, nProbe = 4))
    val res = Similarity.ivfPqResidualTopK(real, queries, 10,
      nLists = 16, nProbe = 4)
    val resRecall = recallOf(res)
    // the residual codebook spends its anchors on the within-list spread
    // the coarse quantizer already removed — at equal (nLists, nProbe,
    // numSub) it must not LOSE recall vs the shared-codebook path
    assert(resRecall >= nonRes,
      s"residual recall $resRecall < non-residual $nonRes")
    // reported distances are the exact integer L2 of the quantized vectors
    val byId = all.toMap
    res.collect().foreach { r =>
      val (q, v) = (byId(r.getLong(0)), byId(r.getLong(2)))
      val want = v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(r.getLong(3) == want, "rerank distance is the exact integer L2")
    }
  }

  test("pqCodes: deterministic codes in [0, K), one per subspace") {
    val codes = Similarity.pqCodes(real, numSub = 4, kAnchors = 16).collect()
    assert(codes.length == real.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 16))
    }
    val again = Similarity.pqCodes(real, numSub = 4, kAnchors = 16).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    codes.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Int](1)))
  }

  test("rangeSearch returns exactly the pairs at or above the radius") {
    val e = emb(
      (0L, Seq(1f, 0f)),   // query
      (1L, Seq(2f, 0f)),   // cos 1.0
      (2L, Seq(1f, 1f)),   // cos ~0.7071
      (3L, Seq(0f, 1f)),   // cos 0
      (4L, Seq(-1f, 0f)))  // cos -1
    val r = Similarity.rangeSearch(e, col("vec_id") === 0, 0.7).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == Set((0L, 1L), (0L, 2L)))
    // tighten past sqrt(2)/2 and the diagonal vector drops out
    val tight = Similarity.rangeSearch(e, col("vec_id") === 0, 0.8).collect()
      .map(x => x.getLong(1)).toSet
    assert(tight == Set(1L))
  }

  test("cosineNearDupPairs finds only genuinely close pairs") {
    val e = emb((0L, Seq(1f, 0f, 0f)), (1L, Seq(0.999f, 0.001f, 0f)), (2L, Seq(0f, 1f, 0f)))
    val r = Similarity.cosineNearDupPairs(e, 0.99, dims = 3).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((0L, 1L)))
  }

  test("cosineNearDupPairs finds every scaled copy (identical signature => recall 1)") {
    val base = real.select("vec_id", "embedding").filter(col("vec_id") < 100)
    val dups = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val got = Similarity.cosineNearDupPairs(base.unionByName(dups), 0.95, dims = 64)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (0L until 100L by 10).map(i => (i, i + 1000)).toSet
    assert(got == want, s"\nmissed=${want -- got}\nextra=${got -- want}")
  }

  test("quantizeInt8 codes bound dequantization error by scale/127") {
    val e = emb((1L, Seq(0.5f, -1.0f, 0.25f)), (2L, Seq(2.0f, 0f, -4.0f)))
    val q = Similarity.quantizeInt8(e).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(q((1L, 0)) == 63 && q((1L, 1)) == -127 && q((1L, 2)) == 31)
    assert(q((2L, 0)) == 63 && q((2L, 1)) == 0 && q((2L, 2)) == -127)
    // floor(x*127/scale) reconstructs to within scale/127 + one code step
    for (((vid, dim), code) <- q) {
      val orig = (if (vid == 1L) Seq(0.5f, -1.0f, 0.25f) else Seq(2.0f, 0f, -4.0f))(dim)
      val scale = if (vid == 1L) 1.0 else 4.0
      assert(math.abs(code * scale / 127.0 - orig) <= scale / 127.0 + 1e-9)
    }
  }

  test("labelPurity: tight clusters classify to their own centroid") {
    import spark.implicits._
    // two well-separated clusters on orthogonal axes + one planted outlier
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f), 0), (2L, Array(0.9f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.1f), 1), (4L, Array(0.1f, 0.9f, 0.0f), 1),
      (5L, Array(0.0f, 1.0f, 0.0f), 0)) // labeled 0, sits in cluster 1
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelPurity(rows).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getBoolean(3))).toMap
    assert(r(1L) == ((0L, true)) && r(2L) == ((0L, true)))
    assert(r(3L) == ((1L, true)) && r(4L) == ((1L, true)))
    assert(r(5L)._2 == false) // the mislabeled outlier is flagged
  }

  test("centroidOutliers: cross-multiplied distance, per-label top-k, id ties") {
    import spark.implicits._
    // label 0 (n=3): quantized dims v1=(0,0), v2=(0,512), v3=(0,-512);
    // centroid sums s=(0,0); d2n2 = sum((q*3 - 0)^2): v1=0, v2=v3=1536^2
    // -> tie breaks to the smaller vec_id. label 1 (n=1): always d2n2=0
    val rows = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.0f, 0.5f), 0),
      (3L, Array(0.0f, -0.5f), 0), (4L, Array(1.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidOutliers(rows, 2).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(r == Seq(
      (0, 1L, 2L, 2359296L), (0, 2L, 3L, 2359296L), (1, 1L, 4L, 0L)))
  }

  test("knnClassify: majority of k neighbors, vote ties break to smallest label") {
    import spark.implicits._
    // query 0 at the origin axis; neighbors: two label-1 vecs slightly
    // closer than two label-2 vecs -> with k=4 votes tie 2-2, pred = 1;
    // with k=3 votes are 2-1 -> pred = 1 as majority
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 9),
      (1L, Array(1.0f, 0.01f), 1), (2L, Array(1.0f, -0.01f), 1),
      (3L, Array(1.0f, 0.02f), 2), (4L, Array(1.0f, -0.02f), 2),
      (5L, Array(-1.0f, 0.0f), 3)) // far: never in top-4
      .toDF("vec_id", "embedding", "label")
    val r4 = Similarity.knnClassify(rows, col("vec_id") === 0, 4).collect().head
    assert((r4.getLong(0), r4.getLong(1), r4.getLong(2), r4.getLong(3),
      r4.getBoolean(4)) == ((0L, 9L, 1L, 2L, false)))
    val r3 = Similarity.knnClassify(rows, col("vec_id") === 0, 3).collect().head
    assert(r3.getLong(2) == 1L && r3.getLong(3) == 2L)
  }

  test("labelCentroids: element-wise float means per label") {
    import spark.implicits._
    val rows = Seq((1L, Array(1.0f, 3.0f), 7), (2L, Array(3.0f, 5.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val c = Similarity.labelCentroids(rows).collect()
    assert(c.length == 1 && c.head.getInt(0) == 7)
    assert(c.head.getSeq[Float](1) == Seq(2.0f, 4.0f))
  }

  test("wide LSH signature (64 planes / 16-bit bands) prunes candidates, keeps exact scores") {
    val queries = col("vec_id") % 50 === 0
    val wide = Similarity.lshTopK(real, queries, 10, dims = 64,
      bandBits = 16, numPlanes = 64).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val narrow = Similarity.lshTopK(real, queries, 10, dims = 64).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // 65536 buckets/band vs 16: the wide layout must return a (possibly
    // empty-per-query) CANDIDATE-pruned subset of valid neighbours; every
    // returned pair must also rank under the narrow layout's larger
    // candidate set OR be a genuine neighbour narrow happened to bucket away
    assert(wide.size <= narrow.size + 10) // wide never explodes the result
    // identical-direction vectors still collide on every band: recall 1.0
    // for scaled copies regardless of width (same argument as near-dup)
    import spark.implicits._
    val base = real.select("vec_id", "embedding").filter(col("vec_id") < 40)
    val dup = base.filter(col("vec_id") === 0)
      .select(lit(999L).as("vec_id"),
        transform(col("embedding"), x => x * lit(3.0f)).as("embedding"))
    val got = Similarity.lshTopK(base.unionByName(dup), col("vec_id") === 999, 1,
      dims = 64, bandBits = 16, numPlanes = 64).collect()
    assert(got.length == 1 && got.head.getLong(2) == 0L)
  }

  test("lshTopK shuffle fallback (query set over the broadcast cap) matches the broadcast path") {
    // every vector is a query — the non-selective predicate the broadcast
    // contract must survive: with the cap forced to 0 the bucket join runs
    // shuffled, and the result must be identical to the broadcast path
    val queries = col("vec_id") < 200
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bcast = rows(Similarity.lshTopK(real, queries, 5, dims = 64))
    val shuffled = rows(Similarity.lshTopK(real, queries, 5, dims = 64,
      maxBroadcastQueries = 0L))
    assert(shuffled == bcast)
    assert(bcast.nonEmpty)
  }

  test("ivfRecall sweep: recall rises with nProbe and hits 100 at full probe") {
    val r = Similarity.ivfRecall(real, col("vec_id") % 50 === 0, 10, Seq(1, 4, 16))
      .collect().map(x => x.getInt(0) -> (x.getLong(2), x.getLong(3))).toMap
    val hits = Seq(1, 4, 16).map(r(_)._1)
    assert(hits == hits.sorted) // more probes can only add candidates
    assert(r(16)._2 == 100L) // probing every one of the 16 lists == brute force
  }

  test("ivfCodebook auto-sizes to ~sqrt(n) when numCentroids <= 0") {
    val cb = Similarity.ivfCodebook(real, numCentroids = 0, kmeansIters = 0)
    val n = real.count()
    assert(cb.length == math.max(16, math.sqrt(n.toDouble).toInt))
  }

  test("lshRecall sweep: integer output, denser banding has >= recall") {
    val r = Similarity.lshRecall(real, col("vec_id") % 50 === 0, 10, dims = 64,
      Seq((16, 4), (64, 16))).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r.keySet == Set((16, 4), (64, 16)))
    val (nq1, hits16, pct16) = r((16, 4))
    val (nq2, hits64, pct64) = r((64, 16))
    assert(nq1 == nq2 && nq1 > 0)
    for (p <- Seq(pct16, pct64)) assert(p >= 0 && p <= 100)
    // 16 buckets/band collide far more than 65536/band: recall can only drop
    assert(hits16 >= hits64, s"hits16=$hits16 hits64=$hits64")
    assert(pct16 == 100 * hits16 / (10 * nq1))
  }

  test("semanticDedup: scaled copies dedup to their originals; originals kept") {
    val dups = real.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val r = Similarity.semanticDedup(
      real.select("vec_id", "embedding").unionByName(dups), 0.95,
      numCentroids = 16)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    val byId = r.map(x => x._1 -> x).toMap
    assert(r.length == real.count() + dups.count())
    // every injected copy is a duplicate of exactly its original
    dups.select("vec_id").collect().map(_.getLong(0)).foreach { cid =>
      val (_, _, rep, isDup) = byId(cid)
      assert(isDup && rep == cid - 100000, s"copy $cid -> $rep")
    }
    // natural max cosine ~0.6 < 0.95: every original is its own representative
    r.filter(_._1 < 100000).foreach { case (id, _, rep, isDup) =>
      assert(!isDup && rep == id)
    }
    // representative ids are always <= their member ids (min-id election)
    r.foreach { case (id, _, rep, _) => assert(rep <= id) }
  }

  test("semanticDedup matches brute-force within-cluster search on real embeddings") {
    val e = real.select("vec_id", "embedding")
      .unionByName(real.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val got = Similarity.semanticDedup(e, 0.95, numCentroids = 16)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // brute force: same codebook, nearest centroid, min tau-neighbor per cluster
    val cents = Similarity.ivfCodebook(e, 16, 2)
    val vecs = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val assign = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, c) => (cid, cos(v, c)) }
        .maxBy { case (cid, s) => (s, -cid) } // argmax cosine, min cent_id tie
      (id, v, best._1)
    }
    val want = assign.map { case (id, v, cl) =>
      val nbrs = assign.filter { case (oid, ov, ocl) =>
        ocl == cl && oid < id && cos(v, ov) >= 0.95 }
      id -> ((cl, if (nbrs.isEmpty) id else nbrs.map(_._1).min))
    }.toMap
    assert(got == want)
  }

  test("semanticDedup banded hot-cluster path is result-identical on a skewed fixture") {
    // skew: 120 scaled copies of ONE vector pile into a single hot cluster
    // (cosine is scale-invariant), dwarfing every other list
    val seedVec = real.filter(col("vec_id") === 0).select("embedding")
    val copies = seedVec.crossJoin(spark.range(1, 121).toDF("i"))
      .select((col("i") + 200000).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0f) + col("i") / lit(100.0f)).cast("float"))
          .as("embedding"))
    val e = real.select("vec_id", "embedding").unionByName(copies)
    def run(threshold: Long) = Similarity.semanticDedup(e, 0.95,
        numCentroids = 16, bandedThreshold = threshold)
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3))).toSet
    val exact = run(Long.MaxValue) // every cluster on the exact path
    val banded = run(1L)           // every cluster >1 row on the banded path
    assert(exact == banded)
    // the hot pile actually deduped: every copy's min qualifying neighbor
    // is vec 0 itself (the only smaller-id vector at cosine 1.0)
    val reps = exact.filter(_._1 > 200000).map(_._3)
    assert(reps == Set(0L))
  }

  test("hardNegatives: same-label neighbors are excluded even when nearest") {
    import spark.implicits._
    // vec 1 is the query's EXACT direction but shares its label -> excluded;
    // vec 2 (slightly off, other label) must rank first instead
    val e = Seq(
      (0L, Seq(1f, 0f), 7L), (1L, Seq(2f, 0f), 7L),
      (2L, Seq(1f, 0.1f), 3L), (3L, Seq(0f, 1f), 4L))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(e, col("vec_id") === 0, 2).collect()
      .map(x => (x.getInt(1), x.getLong(2), x.getLong(3))).sortBy(_._1)
    assert(r.toSeq == Seq((1, 2L, 3L), (2, 3L, 4L)))
  }

  test("hardNegatives equals brute-force top-k restricted to other labels") {
    val brute = Similarity.bruteForceTopK(real, col("vec_id") % 50 === 0, 50)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val labels = real.collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    val expected = brute.groupBy(_._1).toSeq.flatMap { case (q, ns) =>
      ns.sortBy(_._2).map(_._3).filter(n => labels(n) != labels(q))
        .take(5).zipWithIndex.map { case (n, i) => (q, i + 1, n) }
    }.toSet
    val got = Similarity.hardNegatives(real, col("vec_id") % 50 === 0, 5)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
    assert(got == expected)
  }

  test("semanticDecontaminate: copies flag with their source, clean rows report 0") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (100L, Array(1.5f, 0f, 0f, 0f)),     // test: scaled copy of 0
      (200L, Array(0f, 0f, -2f, 1f)))      // test: matches nothing
      .toDF("vec_id", "embedding")
    val r = Similarity.semanticDecontaminate(emb,
        col("vec_id") >= 100, 0.95, dims = 4)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(100L -> ((1L, 0L)), 200L -> ((0L, -1L))))
  }

  test("mmrRerank: diversity displaces the near-copy at rank 2") {
    import spark.implicits._
    // query (1,0); candidates 1 and 2 are EXACT copies (rel ~.9939,
    // mutual cos 1), candidate 3 their mirror (same rel, cos13 ~.9756).
    // Rank 1 = v1 (tie to smallest id). At lambda=50 the copy scores
    // .5*(rel-1) < 0 while the mirror scores .5*(rel-.9756) > 0 -> v3.
    val emb = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.9f, -0.1f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.mmrRerank(emb, col("vec_id") === 0, k = 2, m = 3,
        lambdaPct = 50)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(1L -> 1L, 2L -> 3L))
    // sanity: pure relevance (lambda=100) keeps the near-copy at rank 2
    val r100 = Similarity.mmrRerank(emb, col("vec_id") === 0, k = 2, m = 3,
        lambdaPct = 100)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toMap
    assert(r100 == Map(1L -> 1L, 2L -> 2L))
  }
}
