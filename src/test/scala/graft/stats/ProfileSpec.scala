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
}
