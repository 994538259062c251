package graft.stats

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("profile counts rows, nulls, distincts and renders min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b")), (2L, Some("a")), (3L, None), (3L, Some("a")))
      .toDF("id", "tag")
    val r = Profile.profile(df, Seq("id", "tag")).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4), x.getString(5)))
      .toMap
    assert(r("id") == ((4L, 0L, 3L, "1", "3")))
    assert(r("tag") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profile aggregates numerically before rendering (10 > 9)") {
    import spark.implicits._
    val df = Seq(9L, 10L).toDF("v")
    val r = Profile.profile(df, Seq("v")).collect().head
    assert(r.getString(4) == "9" && r.getString(5) == "10")
  }

  test("profile is a single job: one row per requested column") {
    import spark.implicits._
    val df = Seq((1, "x", 2.0)).toDF("a", "b", "c")
    assert(Profile.profile(df, Seq("a", "b", "c")).count() == 3)
  }

  test("quantiles: rank-at-floor((n-1)q) over a hand-checked column") {
    import spark.implicits._
    // n=5 sorted values [1,2,4,8,16]: ranks floor(4q/100) = 0,1,2,3,4
    val df = Seq(8, 1, 16, 2, 4).toDF("v")
    val r = Profile.quantiles(df, Seq("v"), Seq(0, 25, 50, 75, 100)).collect()
      .map(x => x.getInt(1) -> x.getDouble(2)).toMap
    assert(r == Map(0 -> 1.0, 25 -> 2.0, 50 -> 4.0, 75 -> 8.0, 100 -> 16.0))
    // n=4 [1,2,4,8]: q50 -> rank floor(1.5)=1 -> value 2 (no interpolation)
    val r4 = Profile.quantiles(Seq(1, 2, 4, 8).toDF("v"), Seq("v"), Seq(50))
      .collect().head.getDouble(2)
    assert(r4 == 2.0)
    // duplicates count as rows, not distinct values: [1,1,1,9] q50 -> 1
    val rd = Profile.quantiles(Seq(1, 1, 1, 9).toDF("v"), Seq("v"), Seq(50))
      .collect().head.getDouble(2)
    assert(rd == 1.0)
  }

  test("histogram: integer-exact buckets, empty cells emitted, counts total") {
    import spark.implicits._
    // values 0..9 into 4 buckets over span 10: widths 10/4 -> boundaries at
    // v*4 div 10: bucket 0 = {0,1,2}, 1 = {3,4}, 2 = {5,6,7}, 3 = {8,9}
    val df = (0 to 9).map(_.toDouble).toDF("x")
    val r = Profile.histogram(df, "x", 4).orderBy("bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((0L, 0L, 3L), (1L, 2L, 2L), (2L, 5L, 3L), (3L, 7L, 2L)))
    // a gap in the data leaves its bucket present with n=0
    val sparse = Seq(0.0, 9.0).toDF("x")
    val s = Profile.histogram(sparse, "x", 5).orderBy("bucket").collect()
      .map(x => (x.getLong(0), x.getLong(2))).toSeq
    assert(s == Seq((0L, 1L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)))
    // scaled (cents) path: every count lands, totals preserved
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val h = Profile.histogram(li, "l_extendedprice", 20, scale = 100L).collect()
    assert(h.length == 20)
    assert(h.map(_.getLong(2)).sum == li.filter("l_extendedprice IS NOT NULL").count())
  }

  test("approx profile stays within the documented rsd of the exact counts") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, i % 97)).toDF("u", "m")
    val exact = Profile.profile(df, Seq("u", "m")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profile(df, Seq("u", "m"), approx = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    for ((c, e) <- exact)
      assert(math.abs(approx(c) - e) <= math.max(1L, (e * 0.05).toLong),
        s"$c: approx ${approx(c)} vs exact $e")
  }

  test("correlationMoments: hand-checked sums, pairwise-complete null handling") {
    import spark.implicits._
    val df = Seq(
      (1, 2, Some(10)), (2, 4, None), (3, 6, Some(30)))
      .toDF("x", "y", "z")
    val r = Profile.correlationMoments(df, Seq("x", "y", "z")).collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        ((row.getLong(2), row.getLong(3), row.getLong(4),
          row.getLong(5), row.getLong(6), row.getLong(7)))).toMap
    assert(r.size == 3)
    assert(r(("x", "y")) == ((3L, 6L, 12L, 14L, 56L, 28L)))
    // the None row drops from every z pair, not from (x, y)
    assert(r(("x", "z")) == ((2L, 4L, 40L, 10L, 1000L, 100L)))
    assert(r(("y", "z")) == ((2L, 8L, 40L, 40L, 1000L, 200L)))
  }

  test("profileDiff: integer deltas and min/max movement flags") {
    import spark.implicits._
    val before = Seq((1L, Some("a")), (2L, Some("b"))).toDF("id", "tag")
    val after = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (9L, Some("b")))
      .toDF("id", "tag")
    val r = Profile.profileDiff(before, after, Seq("id", "tag")).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4), x.getBoolean(5))))
      .toMap
    // id: +2 rows, 0 nulls, +2 distinct (3, 9), min same (1), max 2 -> 9
    assert(r("id") == ((2L, 0L, 2L, false, true)))
    // tag: +2 rows, +1 null, +0 distinct, min/max unchanged (a / b)
    assert(r("tag") == ((2L, 1L, 0L, false, false)))
  }

  test("frequentValues: top-k per column, count-desc value-asc ties, nulls dropped") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1)), ("a", Some(2)), ("b", Some(2)), ("b", None), ("c", Some(2)))
      .toDF("s", "i")
    val r = Profile.frequentValues(df, Seq("s", "i"), 2).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getLong(3)))
    assert(r.toSet == Set(
      ("s", 1L, "a", 2L), ("s", 2L, "b", 2L), // tie 2/2 -> value order a,b
      ("i", 1L, "2", 3L), ("i", 2L, "1", 1L))) // null never counted
  }

  test("correlationMoments applies per-column integer scales") {
    import spark.implicits._
    val df = Seq((0.05, 2L), (0.07, 3L)).toDF("rate", "k")
    val r = Profile.correlationMoments(df, Seq("rate", "k"),
      Map("rate" -> 100L)).collect().head
    // rate scales to exact integers 5 and 7 before any product
    assert(r.getLong(2) == 2L && r.getLong(3) == 12L && r.getLong(4) == 5L)
    assert(r.getLong(5) == 74L && r.getLong(6) == 13L && r.getLong(7) == 31L)
  }

  test("equiDepthHistogram: rank boundaries, higher-bucket ties, skew signal") {
    import spark.implicits._
    // 8 values 1..8, nb=4: targets floor(7i/4) = 1,3,5 -> boundaries are
    // the values at cum>=2,4,6 = 2,4,6; bucket = #{b <= v}:
    // v=1 -> 0 | v=2,3 -> 1 | v=4,5 -> 2 | v=6,7,8 -> 3
    val d = (1 to 8).map(_.toLong).toDF("x")
    val r = Profile.equiDepthHistogram(d, "x", 4).orderBy("bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq((0L, 1L, 1L, 1L), (1L, 2L, 3L, 2L),
      (2L, 4L, 5L, 2L), (3L, 6L, 8L, 3L)))
    // heavy ties: one value dominates -> its whole mass lands in ONE
    // bucket, 9-vs-1 instead of 5-vs-5 (the divergence from n/nb that
    // equi-depth is FOR). Boundary = 5 (cum>=5); ties go UP: all nine
    // 5s land in bucket 1, the lone 1 stays in bucket 0
    val skew = (Seq.fill(9)(5L) :+ 1L).toDF("x")
    val rs = Profile.equiDepthHistogram(skew, "x", 2).orderBy("bucket")
      .collect().map(x => (x.getLong(0), x.getLong(3))).toSeq
    assert(rs == Seq((0L, 1L), (1L, 9L)))
  }

  test("zorderExtents: known interleave + every bucket a tight rectangle") {
    import spark.implicits._
    // hand-checked Morton: grid is the identity when max+1 divides 256
    // evenly; with a,b in 0..255, ga=a, gb=b. a=3 (011), b=5 (101) ->
    // z = interleave: bits a0..a7 at even, b at odd positions:
    // a=011 -> 1,1 at 0,2 ; b=101 -> 1 at 1(.2^1)? compute: z = sum a_i 4^i + 2 b_i 4^i
    // a=3: a0=1,a1=1 -> 1+4=5 ; b=5: b0=1,b2=1 -> 2+32=34 ; z=39
    val one = Profile.zorderExtents(
      Seq((3L, 5L), (255L, 255L)).toDF("a", "b"), "a", "b")
    val z39 = one.orderBy("bucket").collect().head
    // bucket = z >> 10 = 39 >> 10 = 0; extents are the single point
    assert(z39.getLong(0) == 0L && z39.getLong(2) == 3L && z39.getLong(3) == 3L
      && z39.getLong(4) == 5L && z39.getLong(5) == 5L)
    // the LAYOUT invariant: on a full uniform grid every z-bucket
    // (bucketBits=6 -> top 3 bits of each dimension) is a 32x32 rectangle
    import org.apache.spark.sql.functions.{col => c}
    val grid = spark.range(64 * 64)
      .select((c("id") % 64).as("a"), (c("id") / 64).cast("long").as("b"))
    val r = Profile.zorderExtents(grid, "a", "b", bits = 6, bucketBits = 6)
      .collect()
    assert(r.length == 64)
    assert(r.forall(x => x.getLong(1) == 64L
      && x.getLong(3) - x.getLong(2) == 7L   // ga span: 8 cells (2^3)
      && x.getLong(5) - x.getLong(4) == 7L)) // gb span: 8 cells
  }

  test("qualityChecks: every constraint class fires on a violating fixture") {
    import spark.implicits._
    val fact = Seq(
      (1L, Option(10L), Option("O"), 5L),
      (1L, Option(10L), Option("O"), 5L),    // duplicate key
      (2L, None, Option("F"), 5L),           // null FK column
      (3L, Option(10L), Option("X"), 5L),    // domain violation
      (4L, Option(10L), None, -1L),          // null domain value: NOT a
                                             // domain viol; negative fires
      (5L, Option(99L), Option("O"), 5L))    // FK miss (no dim 99)
      .toDF("k", "custkey", "status", "amount")
    val dim = Seq(10L, 10L).toDF("dk")       // dup dim keys must NOT fan out
    val r = Profile.qualityChecks(fact, "k",
        notNullCols = Seq("custkey"),
        domains = Map("status" -> Seq("O", "F")),
        nonNegativeCols = Seq("amount"),
        fk = Some(("custkey", dim, "dk")))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getBoolean(2))))
      .toMap
    assert(r("row_count") == ((6L, true)))
    assert(r("key_unique:k") == ((1L, false)))
    assert(r("not_null:custkey") == ((1L, false)))
    assert(r("domain:status") == ((1L, false)))
    assert(r("non_negative:amount") == ((1L, false)))
    // misses: the null-custkey row AND the 99 row (null never matches)
    assert(r("fk:custkey->dk") == ((2L, false)))
  }

  test("groupQuantiles: quantile_disc per group from the value histogram") {
    import spark.implicits._
    // group a: values 1..10 → p50 = 5 (cum 5 >= ceil(10*0.5)=5),
    //                          p90 = 9; p100 = 10
    // group b: 7,7,7,9 → p50 = 7 (cum 3 >= 2), p90 = 9 (ceil(3.6)=4), p100 = 9
    import org.apache.spark.sql.functions.col
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq(("b", 7L), ("b", 7L), ("b", 7L), ("b", 9L))).toDF("g", "v")
    val r = Profile.groupQuantiles(df, "g", col("v"), Seq(50, 90, 100))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("a") == ((10L, 5L, 9L, 10L)))
    assert(r("b") == ((4L, 7L, 9L, 9L)))
  }

  test("quantileSketch: exact at level 0, bounded rank error above it, " +
      "nested (mergeable) samples") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // small group: n <= cap => level 0, every row survives, estimates
    // MUST equal the exact groupQuantiles verbatim
    val small = (1 to 100).map(v => ("s", v.toLong, v.toLong)).toDF("g", "v", "k")
    val rs = Profile.quantileSketch(small, "g", col("v"), col("k"),
      Seq(50, 90, 99), cap = 512).collect().head
    assert(rs.getLong(1) == 100L && rs.getLong(2) == 0L &&
      rs.getLong(3) == 100L)
    val ex = Profile.groupQuantiles(small, "g", col("v"), Seq(50, 90, 99))
      .collect().head
    assert((rs.getLong(4), rs.getLong(5), rs.getLong(6)) ==
      ((ex.getLong(2), ex.getLong(3), ex.getLong(4))))

    // large group: 40k rows of v = rank => exact rank of the estimate is
    // the estimate itself; gate |rank(est) - target| <= 10% of n. The
    // sample is deterministic (md5 coin), so this either always passes
    // or always fails — no flake.
    val n = 40000
    val big = (1 to n).map(v => ("b", v.toLong, v.toLong)).toDF("g", "v", "k")
    val rb = Profile.quantileSketch(big, "g", col("v"), col("k"),
      Seq(50, 90, 99), cap = 512).collect().head
    val (lvl, m) = (rb.getLong(2), rb.getLong(3))
    // level = bit_length(ceil(40000/512)-1) = bit_length(78) = 7
    assert(lvl == 7L, s"level $lvl")
    // expected survivors n/2^level = 312; binomial spread is narrow
    assert(m > 200 && m < 450, s"sample size $m")
    for ((p, i) <- Seq(50, 90, 99).zipWithIndex) {
      val est = rb.getLong(4 + i)
      val target = (n.toLong * p + 99) / 100
      assert(math.abs(est - target) <= n / 10,
        s"p$p: est rank $est vs target $target")
    }

    // mergeability = sample nesting: the level-(j+1) survivor set must be
    // a subset of the level-j one (filtering a shard summary up to the
    // global max level discards rows, never invents them) — checked on
    // the raw md5 coin the implementation uses
    import org.apache.spark.sql.functions._
    val coins = big.select(
      conv(substring(md5(col("k").cast("string")), 25, 8), 16, 10)
        .cast("long").as("h"))
    val at = (j: Int) => coins.filter(pmod(col("h"), lit(1L << j)) === 0)
      .count()
    val sizes = (0 to 8).map(at)
    assert(sizes.head == n.toLong)
    sizes.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"nesting violated: $sizes") }
    // and the subset property itself, not just the counts
    val s7 = coins.filter(pmod(col("h"), lit(1L << 7)) === 0)
    val s8 = coins.filter(pmod(col("h"), lit(1L << 8)) === 0)
    assert(s8.except(s7).count() == 0L)
  }

  test("zoneMapSkipping: value-range layout skips, hash layout cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // keys 0..999, value = key (perfect correlation for range_key too);
    // predicate [0, 99] touches exactly the bottom tenth of the values
    val df = (0L until 1000L).map(i => (i, i)).toDF("k", "v")
    val r = Profile.zoneMapSkipping(df, "k", col("v"), 0L, 99L, files = 10)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // hash buckets all span [b, 990+b]: every file hits
    assert(r("hash_key") == ((10L, 1000L, 10L, 0L)))
    // key==value: both range layouts confine [0,99] to one file
    assert(r("range_key") == ((10L, 100L, 1L, 9L)))
    assert(r("range_value") == ((10L, 100L, 1L, 9L)))
  }

  test("vocabGrowth: first-bucket charging, cumulative docs and vocab") {
    import spark.implicits._
    // bucket 0 = docs 0..4, bucket 1 = docs 5..9 (dmax=9, *2 div 10)
    val d = (0L until 10L).map(i =>
      (i, if (i < 5) "common alpha" + (" x" + i) else "common beta" + (" y" + i)))
      .toDF("doc_id", "text")
    val r = Profile.vocabGrowth(d, 2).orderBy("bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    // bucket 0 vocab: common, alpha, x0..x4 = 7; bucket 1 adds beta,
    // y5..y9 = 6 new ("common" already charged to bucket 0)
    assert(r == Seq((0L, 5L, 7L), (1L, 10L, 13L)))
  }

  test("contingency: exact cells with row/column marginals and total") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("u", "v")
    val r = Profile.contingency(df, "u", "v").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5))).toSet
    assert(r == Set(
      ("a", "x", 2L, 3L, 3L, 4L),
      ("a", "y", 1L, 3L, 1L, 4L),
      ("b", "x", 1L, 1L, 3L, 4L)))
  }

  test("functionalDeps: holds iff every LHS value owns one RHS value") {
    import spark.implicits._
    // id -> city holds (key); city -> zip holds; zip -> city violated
    // (zip 10 maps to both X and Y); repeats must not affect verdicts
    val df = Seq(
      (1L, "X", 10L), (2L, "X", 10L), (2L, "X", 10L),
      (3L, "Y", 10L), (4L, "Y", 20L))
      .toDF("id", "city", "zip")
    val r = Profile.functionalDeps(df, Seq("id", "city", "zip"))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getBoolean(5)))).toMap
    assert(r.size == 6)
    assert(r(("id", "city")) == ((4L, 4L, 0L, true)))
    assert(r(("id", "zip")) == ((4L, 4L, 0L, true)))
    assert(r(("city", "zip")) == ((2L, 3L, 1L, false))) // Y -> {10, 20}
    assert(r(("zip", "city")) == ((2L, 3L, 1L, false))) // 10 -> {X, Y}
    assert(r(("city", "id")) == ((2L, 4L, 2L, false)))
    assert(r(("zip", "id")) == ((2L, 4L, 2L, false)))
  }

  test("uniqueCombinations: singles and pairs vs the row count") {
    import spark.implicits._
    // (a,b) is a key; neither column alone is; trailing "" sentinel in
    // singles must not collide with pair encodings
    val df = Seq((1L, "p"), (1L, "q"), (2L, "p")).toDF("a", "b")
    val r = Profile.uniqueCombinations(df, Seq("a", "b"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r == Map(
      "a" -> ((2L, 3L, false)),
      "b" -> ((2L, 3L, false)),
      "a,b" -> ((3L, 3L, true))))
  }

  test("entropy: uniform pairs read 1 bit, constants 0, keys log2 n") {
    import spark.implicits._
    val df = Seq(("a", "k", 1L), ("a", "k", 2L), ("b", "k", 3L), ("b", "k", 4L))
      .toDF("x", "y", "z")
    val r = Profile.entropy(df, Seq("x", "y", "z")).collect()
      .map(v => v.getString(0) ->
        ((v.getLong(1), v.getLong(2), v.getDouble(3)))).toMap
    assert(r == Map(
      "x" -> ((4L, 2L, 1.0)),
      "y" -> ((4L, 1L, 0.0)),
      "z" -> ((4L, 4L, 2.0))))
  }

  test("mutualInfo: independent columns read 0 bits, copies read H") {
    import spark.implicits._
    // x and y independent (all four combos equal): MI = 0, H = 1 bit each
    val ind = Seq(("a","p"),("a","q"),("b","p"),("b","q")).toDF("x","y")
    val ri = Profile.mutualInfo(ind, "x", "y").collect().head
    assert((ri.getLong(0), ri.getLong(1)) == ((4L, 4L)))
    assert(ri.getDouble(2) == 0.0 && ri.getDouble(3) == 1.0 && ri.getDouble(4) == 1.0)
    // y a copy of x: MI = H(x) = 1 bit
    val cp = Seq(("a","a"),("a","a"),("b","b"),("b","b")).toDF("x","y")
    val rc = Profile.mutualInfo(cp, "x", "y").collect().head
    assert(rc.getDouble(2) == 1.0)
  }

  test("ksDrift: identical slices read 0; disjoint supports read 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val same = Seq(("A",1L),("A",2L),("B",1L),("B",2L)).toDF("s","v")
    val r0 = Profile.ksDrift(same, "s", "A", "B", col("v")).collect().head
    assert(r0.getLong(2) == 0L && r0.getDouble(3) == 0.0)
    // A's values all below B's: at the boundary cumA*nB - cumB*nA = 2*2
    val dis = Seq(("A",1L),("A",2L),("B",3L),("B",4L)).toDF("s","v")
    val r1 = Profile.ksDrift(dis, "s", "A", "B", col("v")).collect().head
    assert(r1.getLong(2) == 4L && r1.getDouble(3) == 1.0)
  }

  test("robustOutliers: disc median, MAD, k*MAD fence; outlier can't shift it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group A: values 1..7 plus a wild 1000 (8 rows): disc median = least
    // v with cum >= ceil(8/2)=4 -> 4; |v-4| = {3,2,1,0,1,2,3,996}, sorted
    // {0,1,1,2,2,3,3,996}: MAD = 4th smallest = 2; fence 3*2=6 -> only
    // 1000 is outside. group B: constant -> median=5, MAD=0, any
    // deviation is an outlier (none here)
    val df = ((1L to 7L) :+ 1000L).map(("A", _)).++(Seq(("B", 5L), ("B", 5L)))
      .toDF("g", "v")
    val r = Profile.robustOutliers(df, "g", col("v"), 3).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map(
      "A" -> ((8L, 4L, 2L, 1L)),
      "B" -> ((2L, 5L, 0L, 0L))))
  }

  test("keySkew: top-k by count, integer shares, deterministic ties") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("k")
    val r = Profile.keySkew(df,
        org.apache.spark.sql.functions.col("k"), 3).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))
    assert(r.toSeq == Seq(
      (1L, "a", 5L, 500000L, 500000L, 4L, 10L),
      (2L, "b", 3L, 300000L, 800000L, 4L, 10L),
      (3L, "c", 1L, 100000L, 900000L, 4L, 10L))) // c before d: tie on key asc
  }

  test("kAnonymity: only sub-k quasi groups report; values stringify") {
    import spark.implicits._
    val df = Seq(
      (10, "A"), (10, "A"), (10, "A"),   // safe at k=3
      (10, "B"), (10, "B"),              // violates
      (20, "A"))                         // violates
      .toDF("nat", "seg")
    val r = Profile.kAnonymity(df, Seq("nat", "seg"), 3L).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    assert(r == Set(("10", "B", 2L), ("20", "A", 1L)))
    assert(Profile.kAnonymity(df, Seq("nat", "seg"), 1L).collect().isEmpty)
  }

  test("quantileSketch: a zero-survivor group still reports, with NULL estimates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // brute-force 17 keys whose coin (md5 hex chars 25..32 as a long) is
    // ODD: at cap=16 the group sits at level 1 and every coin misses the
    // pmod filter — the report must still carry the group
    def coin(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(24, 32), 16)
    }
    val oddKeys = Iterator.from(1).map(_.toLong)
      .filter(k => coin(k) % 2 == 1).take(17).toSeq
    val df = oddKeys.map(k => ("dark", k % 7, k)).toDF("g", "v", "k")
    val r = Profile.quantileSketch(df, "g", col("v"), col("k"),
      Seq(50), cap = 16).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "dark" && row.getLong(1) == 17L &&
      row.getLong(2) == 1L && row.getLong(3) == 0L && row.isNullAt(4))
  }

  test("groupCdf: integer rank shares per group over distinct values") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 5L),
      ("b", 10L)).toDF("g", "v")
    val r = Profile.groupCdf(df, "g", col("v")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toSet
    assert(r == Set(
      ("a", 1L, 2L, 4L, 500000L),
      ("a", 2L, 3L, 4L, 750000L),
      ("a", 5L, 4L, 4L, 1000000L),
      ("b", 10L, 1L, 1L, 1000000L)))
  }

  test("lDiversity: low-diversity groups report even when k-anonymous") {
    import spark.implicits._
    val df = Seq(
      // group (10, A): 4 members but ONE sensitive value -> l-violation
      (10, "A", "x"), (10, "A", "x"), (10, "A", "x"), (10, "A", "x"),
      // group (10, B): 3 members, 3 distinct -> diverse
      (10, "B", "x"), (10, "B", "y"), (10, "B", "z"),
      // group (20, A): 2 members, 2 distinct -> violates l=3
      (20, "A", "x"), (20, "A", "y"))
      .toDF("nat", "seg", "diag")
    val r = Profile.lDiversity(df, Seq("nat", "seg"), "diag", 3L).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(r == Set(("10", "A", 4L, 1L), ("20", "A", 2L, 2L)))
  }

  test("joinSize: exact cardinality without the join, hot key, side counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("ka")       // counts 3,1,1
    val b = Seq(1L, 1L, 2L, 9L).toDF("kb")           // counts 2,1,1
    val r = Profile.joinSize(a, "ka", b, "kb").collect().head
    // matches: key 1 -> 3*2=6, key 2 -> 1; key 3 and 9 unmatched
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((7L, 2L, 6L, 3L, 3L)))
    // cross-check against the executed join
    assert(a.join(b, col("ka") === col("kb")).count() == 7L)
  }
}
