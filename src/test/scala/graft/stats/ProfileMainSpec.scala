package graft.stats

import graft.SparkSpec

class ProfileMainSpec extends SparkSpec {

  private def people = {
    import spark.implicits._
    // (id, zip, age_band, disease, balance, slice)
    Seq(
      (1L, "10115", "30s", "flu", 10L, "a"),
      (2L, "10115", "30s", "flu", 20L, "a"),
      (3L, "10115", "30s", "flu", 30L, "a"),
      (4L, "10117", "40s", "flu", 40L, "b"),
      (5L, "10117", "40s", "cold", 500L, "b"),
      (6L, "10117", "40s", "none", 60L, "b"),
      (7L, "10117", "40s", "none", 70L, "b")
    ).toDF("id", "zip", "age", "disease", "balance", "slice")
  }

  test("parseArgs: audits, quality constraint flags, single input") {
    val c = ProfileMain.parseArgs(Seq(
      "--k-anon", "zip,age:4", "--l-div", "zip,age:disease",
      "--key-skew", "zip:5", "--quality", "id", "--not-null", "zip,age",
      "--non-negative", "balance", "--domain", "slice:a|b",
      "--drift", "slice:a:b:balance", "--output", "/tmp/o", "in"))
    assert(c.kAnon.contains((Seq("zip", "age"), 4L)))
    assert(c.lDiv.contains((Seq("zip", "age"), "disease", 3L)))
    assert(c.keySkew.contains(("zip", 5)))
    assert(c.qualityKey.contains("id") && c.notNull == Seq("zip", "age"))
    assert(c.nonNegative == Seq("balance"))
    assert(c.domains == Map("slice" -> Seq("a", "b")))
    assert(c.drift.contains(("slice", "a", "b", "balance")))
    assert(c.input.contains("in") && c.output.contains("/tmp/o"))
    intercept[IllegalArgumentException](ProfileMain.parseArgs(Seq("in")))
    intercept[IllegalArgumentException](
      ProfileMain.parseArgs(Seq("--k-anon", "zip", "in"))) // no --output
  }

  test("run: parquet in -> one verdict parquet per audit out, gate verdicts (e2e)") {
    val tmp = java.nio.file.Files.createTempDirectory("profilemain").toString
    people.write.parquet(s"$tmp/in")
    val gates = ProfileMain.run(spark, ProfileMain.parseArgs(Seq(
      "--k-anon", "zip,age:4", "--l-div", "zip,age:disease:2",
      "--key-skew", "zip:5", "--quality", "id", "--not-null", "zip",
      "--non-negative", "balance", "--domain", "slice:a|b",
      "--drift", "slice:a:b:balance",
      "--output", s"$tmp/out", s"$tmp/in"))).toMap
    // zip=10115 has 3 < 4 rows -> k-anon FAILs with that one group
    val ka = spark.read.parquet(s"$tmp/out/k_anon.parquet").collect()
    assert(ka.length == 1 && ka.head.getAs[String]("q_zip") == "10115")
    assert(gates("k_anon") == false)
    // the 10115 group is all-flu (1 distinct < 2) -> l-div FAILs on it
    val ld = spark.read.parquet(s"$tmp/out/l_div.parquet").collect()
    assert(ld.length == 1 && ld.head.getAs[Long]("n_distinct_sensitive") == 1L)
    assert(gates("l_div") == false)
    // quality: all constraints hold on this fixture -> PASS
    val q = spark.read.parquet(s"$tmp/out/quality.parquet")
    assert(q.filter(!org.apache.spark.sql.functions.col("passed")).count() == 0)
    assert(gates("quality") == true)
    // advisory artifacts exist with the library schemas
    assert(spark.read.parquet(s"$tmp/out/key_skew.parquet").columns.toSet ==
      Set("rank", "key", "n", "share_e6", "cum_share_e6", "n_keys", "n_rows"))
    val d = spark.read.parquet(s"$tmp/out/drift.parquet").head
    assert(d.getAs[Long]("n_a") == 3L && d.getAs[Long]("n_b") == 4L)
    // advisory audits never gate
    assert(gates.keySet == Set("k_anon", "l_div", "quality"))
  }

  test("run: quality gate FAILs loudly on a broken table") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("profilemain2").toString
    Seq((1L, Option.empty[String], -5L), (1L, Some("x"), 2L))
      .toDF("id", "name", "v").write.parquet(s"$tmp/in")
    val gates = ProfileMain.run(spark, ProfileMain.parseArgs(Seq(
      "--quality", "id", "--not-null", "name", "--non-negative", "v",
      "--output", s"$tmp/out", s"$tmp/in"))).toMap
    assert(gates == Map("quality" -> false))
    val failed = spark.read.parquet(s"$tmp/out/quality.parquet")
      .filter(!org.apache.spark.sql.functions.col("passed"))
      .collect().map(_.getAs[String]("check_name")).toSet
    // duplicate key, null name, negative v all caught
    assert(failed == Set("key_unique:id", "not_null:name", "non_negative:v"))
  }
}
