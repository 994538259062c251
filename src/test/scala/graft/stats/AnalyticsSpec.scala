package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  private def ts(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")

  test("pricingSummary: integer-space money math, cutoff filter") {
    import spark.implicits._
    val li = Seq(
      // qty, extprice, disc, tax, flag, status, shipdate
      (5.0, 100.50, 0.10, 0.05, "A", "F", ts("2000-01-01")),
      (3.0, 10.00, 0.00, 0.08, "A", "F", ts("2000-02-01")),
      (7.0, 99.99, 0.07, 0.02, "R", "O", ts("2001-05-05"))) // past cutoff
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Analytics.pricingSummary(li, "2000-12-01").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "A" && row.getString(1) == "F")
    assert(row.getLong(2) == 8L)                    // 5 + 3
    assert(row.getLong(3) == 10050L + 1000L)        // cents
    // disc_e4: 10050*90 + 1000*100 = 904500 + 100000
    assert(row.getLong(4) == 1004500L)
    // charge_e6: 10050*90*105 + 1000*100*108
    assert(row.getLong(5) == 10050L * 90 * 105 + 1000L * 100 * 108)
    assert(row.getLong(6) == 2L)
  }

  lazy val sf = "/root/testdata/sf0.001"

  test("topRevenueOrders: segment + date filters push into the scans") {
    val q = Analytics.topRevenueOrders(
      spark.read.parquet(s"$sf/customer.parquet"),
      spark.read.parquet(s"$sf/orders.parquet"),
      spark.read.parquet(s"$sf/lineitem.parquet"),
      "BUILDING", "1998-01-01", 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("c_mktsegment"), "segment filter must reach the scan")
    assert(q.collect().length <= 5)
  }

  test("regionRevenue: region filter prunes nations before the big joins") {
    val r = Analytics.regionRevenue(
      spark.read.parquet(s"$sf/customer.parquet"),
      spark.read.parquet(s"$sf/orders.parquet"),
      spark.read.parquet(s"$sf/lineitem.parquet"),
      spark.read.parquet(s"$sf/supplier.parquet"),
      spark.read.parquet(s"$sf/nation.parquet"),
      spark.read.parquet(s"$sf/region.parquet"),
      "AFRICA", "1996-01-01", "1999-01-01").collect()
    // every returned nation belongs to the region (5 nations per region)
    assert(r.nonEmpty && r.length <= 5)
    assert(r.forall(_.getLong(1) > 0L))
  }
}
