package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("saltedJoin equals the plain join on skewed data") {
    import spark.implicits._
    // hub key 1 carries 500 of 520 left rows
    val left = ((1 to 500).map(i => (1L, i.toLong)) ++
      (1 to 20).map(i => (i.toLong % 5 + 2, i.toLong))).toDF("k", "lv")
    val right = (1 to 7).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getString(2))
    val plain = left.join(right, "k").select("k", "lv", "rv").collect().map(key)
    for (s <- Seq(1, 4, 16)) {
      val salted = Skew.saltedJoin(left, right, "k", s)
        .select("k", "lv", "rv").collect().map(key)
      assert(salted.sorted.toSeq == plain.sorted.toSeq, s"salts=$s")
    }
  }

  test("saltedJoin: fully-duplicate hub rows keep multiset semantics, deterministically") {
    import spark.implicits._
    // 400 IDENTICAL rows — the case a pure content-hash salt would stack
    // on one salt value; the duplicate ordinal spreads them and stays
    // deterministic (same multiset of salted rows on every computation)
    val left = ((1 to 400).map(_ => (1L, 7L)) ++
      (1 to 10).map(i => (2L, i.toLong))).toDF("k", "lv")
    val right = Seq((1L, "r1"), (2L, "r2")).toDF("k", "rv")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = rows(left.join(right, "k"))
    val salted1 = rows(Skew.saltedJoin(left, right, "k", 8))
    val salted2 = rows(Skew.saltedJoin(left, right, "k", 8))
    assert(salted1 == plain) // 400 duplicate join rows preserved
    assert(salted1 == salted2) // deterministic across recomputation
  }

  test("saltedCollectSet equals plain distinct sets, including hub keys") {
    import spark.implicits._
    val df = ((1 to 300).map(i => (1L, s"v${i % 50}")) ++
      Seq((2L, "a"), (2L, "a"), (3L, "z"))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sort_array(array_distinct(collect_list("v"))).as("values"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val salted = Skew.saltedCollectSet(df, "k", "v", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(salted == plain)
    assert(salted(1L).length == 50 && salted(2L) == Seq("a"))
  }

  test("bucketed tables join without any Exchange") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    // shared session: set a warehouse-scoped database for isolation
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bspec LOCATION '$wh'")
    // force the sort-merge path: with a broadcastable test table the
    // planner picks BHJ and rightly disables bucketed scans entirely
    val bcThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
      val b = (1 to 1000).map(i => (i.toLong, i * 2L)).toDF("id", "bv")
      Bucketing.writeBucketed(a, "bspec.ta", Seq("id"), 8)
      Bucketing.writeBucketed(b, "bspec.tb", Seq("id"), 8)
      val joined = Bucketing.readTable(spark, "bspec.ta")
        .join(Bucketing.readTable(spark, "bspec.tb"), "id")
      assert(joined.count() == 1000)
      assert(Bucketing.isExchangeFree(joined),
        "bucketed co-located join must not shuffle:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
      // and an aggregation on the bucket key is exchange-free too
      val agg = Bucketing.readTable(spark, "bspec.ta").groupBy("id").count()
      agg.count()
      assert(Bucketing.isExchangeFree(agg))
      // the same join WITHOUT bucketing does shuffle (the property is real)
      val plain = a.join(b, "id")
      assert(!Bucketing.isExchangeFree(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThreshold)
      spark.sql("DROP DATABASE IF EXISTS bspec CASCADE")
    }
  }

  test("topKPerKey equals the ranking-window top-k, ties broken by id") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 2000).map { i =>
      (i % 7L, i.toLong, ((i * 37) % 100).toDouble) // many score ties
    }.toDF("key", "id", "score")
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val windowed = rows.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10).select("key", "rank", "id", "score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val agg = TopK.topKPerKey(rows, "key", "id", "score", 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(agg == windowed)
  }

  test("approx profile: HLL distincts within 5 percent of exact, rest identical") {
    import spark.implicits._
    val df = (1 to 20000).map(i => (i.toLong % 5000, s"s${i % 1234}")).toDF("a", "b")
    val exact = graft.stats.Profile.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.stats.Profile.profile(df, Seq("a", "b"), approx = true)
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("a", "b")) {
      val (e, ap) = (exact(c), approx(c))
      assert(ap.getLong(1) == e.getLong(1) && ap.getLong(2) == e.getLong(2))
      assert(ap.getString(4) == e.getString(4) && ap.getString(5) == e.getString(5))
      val err = math.abs(ap.getLong(3) - e.getLong(3)).toDouble / e.getLong(3)
      assert(err <= 0.05, s"col $c: approx ${ap.getLong(3)} vs exact ${e.getLong(3)}")
    }
  }

  test("LoadPack.pack: LPT balances skewed weights within the 4/3 bound") {
    // one giant + many small keys: hash partitioning would stack smalls
    // on the giant's bin with probability ~ (bins-1)/bins per key
    val weights = ("hub", 900L) +: (1 to 30).map(i => (s"k$i", 10L))
    val bins = 4
    val a = LoadPack.pack(weights, bins)
    assert(a.values.toSet.subsetOf((0 until bins).toSet))
    val ms = LoadPack.makespan(weights, a, bins)
    assert(ms == 900L, s"makespan $ms: smalls must avoid the hub's bin")
    // determinism: same inputs -> same placement
    assert(LoadPack.pack(weights, bins) == a)
  }

  test("repartitionByLoad pins bins exactly and loses no rows") {
    import spark.implicits._
    val df = (("hub", 0) +: (1 to 199).map(i => (s"k${i % 5}", i))).toDF("k", "v")
      .union((1 to 299).map(_ => ("hub", 1)).toDF("k", "v"))
    val packed = LoadPack.repartitionByLoad(df, "k", 3)
    assert(packed.count() == 499) // 1 + 199 + 299 input rows
    assert(packed.rdd.getNumPartitions == 3)
    // every key's rows land in ONE partition, matching the packing
    val perPart = packed.rdd.mapPartitionsWithIndex { (i, it) =>
      it.map(r => (r.getString(0), i))
    }.distinct().collect().groupBy(_._1)
    assert(perPart.forall(_._2.length == 1), s"split keys: $perPart")
    // the hub's 300 rows sit alone-ish: its partition holds <= 300 + the
    // LPT remainder, never hub + everything
    val sizes = packed.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(sizes.max <= 300, s"partition sizes ${sizes.toSeq}")
  }

  test("repartitionByLoad caps the driver collect: heavy keys exact, tail hashed") {
    import spark.implicits._
    // 2000 distinct tail keys + 2 heavy hubs, cap far below the cardinality:
    // the driver must only ever see maxExactKeys rows, hubs still get LPT
    // placement, and no row is lost or duplicated
    val df = ((1 to 400).map(_ => ("hubA", 1)) ++
      (1 to 300).map(_ => ("hubB", 2)) ++
      (1 to 2000).map(i => (s"t$i", i))).toDF("k", "v")
    val packed = LoadPack.repartitionByLoad(df, "k", 4, maxExactKeys = 8)
    assert(packed.count() == 2700)
    assert(packed.rdd.getNumPartitions == 4)
    // the two hubs were inside the top-8 -> exact placement puts them in
    // DIFFERENT bins (LPT never stacks the two heaviest with 4 empty bins)
    val hubBins = packed.rdd.mapPartitionsWithIndex { (i, it) =>
      it.collect { case r if r.getString(0).startsWith("hub") => (r.getString(0), i) }
    }.distinct().collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(hubBins("hubA").size == 1 && hubBins("hubB").size == 1)
    assert(hubBins("hubA") != hubBins("hubB"), s"hubs stacked: $hubBins")
  }

  test("unorderedPairs is total: empty/singleton arrays yield no pairs, not a crash") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq.empty[String]), (2L, Seq("a")), (3L, Seq("a", "b")),
      (4L, Seq("a", "b", "c"))).toDF("id", "arr")
    // NO size>=2 pre-filter — the guard inside unorderedPairs must make
    // the degenerate rows empty instead of descending sequence(1, 0)
    val got = df.select(col("id"), explode(Pairs.unorderedPairs(col("arr"))).as("p"))
      .select(col("id"), col("p.a"), col("p.b")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((3L, "a", "b"), (4L, "a", "b"), (4L, "a", "c"), (4L, "b", "c")))
  }

  test("repartitionByLoad: null key and the string 'null' stay distinct") {
    import spark.implicits._
    val df = Seq((null.asInstanceOf[String], 1), ("null", 2), ("null", 3), ("k", 4))
      .toDF("k", "v")
    val packed = LoadPack.repartitionByLoad(df, "k", 2)
    // no rows lost and the values survive attached to the right keys
    val byKey = packed.collect().map(r => (Option(r.getString(0)), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byKey(None) == Set(1))
    assert(byKey(Some("null")) == Set(2, 3))
    assert(byKey(Some("k")) == Set(4))
  }
}