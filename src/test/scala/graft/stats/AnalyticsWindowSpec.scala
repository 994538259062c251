package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsWindowSpec extends SparkSpec {

  private def ts(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")

  test("runningTotals: cumulative cents per customer in (date, orderkey) order") {
    import spark.implicits._
    val cust = Seq((10L, "BUILDING"), (11L, "AUTO"))
      .toDF("c_custkey", "c_mktsegment")
    val ord = Seq(
      (1L, 10L, ts("1996-01-05"), 10.00),
      (2L, 10L, ts("1996-02-05"), 2.50),
      // same DATE as order 2: orderkey breaks the tie (2 before 3)
      (3L, 10L, ts("1996-02-05"), 1.00),
      (4L, 11L, ts("1996-03-01"), 99.0),   // other segment: excluded
      (5L, 10L, ts("1997-06-01"), 5.0))    // outside the window
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val r = Analytics.runningTotals(cust, ord, "BUILDING",
        "1996-01-01", "1997-01-01")
      .orderBy("o_orderkey").collect()
      .map(x => (x.getLong(1), x.getLong(3), x.getLong(4))).toSeq
    assert(r == Seq((1L, 1000L, 1000L), (2L, 250L, 1250L), (3L, 100L, 1350L)))
  }

  test("topOrdersPerCustomer: rank<=n per customer compiles to WindowGroupLimit") {
    import spark.implicits._
    val ord = (1 to 10).map(i => (i.toLong, 10L, i * 1.00)) ++
      Seq((11L, 11L, 7.00))
    val df = Analytics.topOrdersPerCustomer(
      ord.toDF("o_orderkey", "o_custkey", "o_totalprice"), 3)
    // the rank-then-filter shape must hit Spark's WindowGroupLimit rule:
    // partitions keep at most n rows BEFORE the exchange
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "top-N-per-group should plan as WindowGroupLimit")
    val r = df.collect().map(x => (x.getLong(0), x.getLong(3), x.getLong(1))).toSeq
      .sortBy(x => (x._1, x._2))
    assert(r == Seq((10L, 1L, 10L), (10L, 2L, 9L), (10L, 3L, 8L),
      (11L, 1L, 11L)))
  }

  test("orderGaps: lag-window inter-arrival stats, tie-stable, minOrders cut") {
    import spark.implicits._
    val day = 86400L * 1000000L // one day in microseconds
    val ord = Seq(
      (1L, 10L, ts("1996-01-01")),
      (2L, 10L, ts("1996-01-03")),  // +2d
      // SAME timestamp as order 2: o_orderkey pins the lag pairing, so
      // this row contributes a zero gap (not a reordering)
      (3L, 10L, ts("1996-01-03")),
      (4L, 10L, ts("1996-01-10")),  // +7d
      (5L, 11L, ts("1996-02-01")),  // only two orders: below minOrders
      (6L, 11L, ts("1996-03-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val r = Analytics.orderGaps(ord, 4L).collect()
    assert(r.length == 1)
    val x = r.head
    assert((x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
      x.getLong(4), x.getLong(5)) ==
      (10L, 4L, 3L, 9 * day, 0L, 7 * day))
  }
}
