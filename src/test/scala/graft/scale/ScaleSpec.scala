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
}