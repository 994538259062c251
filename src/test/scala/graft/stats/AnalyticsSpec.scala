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

  test("orderPriorityCheck: only late-shipping orders count, once each") {
    import spark.implicits._
    val o = Seq(
      (1L, "1-URGENT", ts("1996-02-01")),   // two late lines -> counts once
      (2L, "1-URGENT", ts("1996-03-01")),   // on-time only -> excluded
      (3L, "5-LOW", ts("1996-04-01")),      // one late line -> counts
      (4L, "5-LOW", ts("1995-01-01")))      // outside the window
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, ts("1996-05-01")), (1L, ts("1996-06-01")),  // both > +60d
      (2L, ts("1996-03-15")),                          // within 60d
      (3L, ts("1996-08-01")),
      (4L, ts("1995-06-01")))
      .toDF("l_orderkey", "l_shipdate")
    val r = Analytics.orderPriorityCheck(o, li, "1996-01-01", "1997-01-01", 60)
      .orderBy("o_orderpriority").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("1-URGENT", 1L), ("5-LOW", 1L)))
  }

  test("customerDistribution: zero-order customers survive the outer join") {
    import spark.implicits._
    val c = Seq(10L, 20L, 30L).toDF("c_custkey")
    val o = Seq((10L, 100L), (10L, 101L), (20L, 102L))
      .toDF("o_custkey", "o_orderkey")
    val r = Analytics.customerDistribution(c, o)
      .orderBy("c_count").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("bigOrders: HAVING gate + top-k ordering, quantities exact") {
    val r = Analytics.bigOrders(
      spark.read.parquet(s"$sf/customer.parquet"),
      spark.read.parquet(s"$sf/orders.parquet"),
      spark.read.parquet(s"$sf/lineitem.parquet"), 150L, 10).collect()
    assert(r.length <= 10)
    val qtys = r.map(_.getLong(5))
    assert(qtys.forall(_ > 150L))
    assert(qtys.sameElements(qtys.sortBy(-_)), "descending by total_qty")
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

  test("returnedItemReport: R-flag + date band filters, revenue-desc ranking") {
    val r = Analytics.returnedItemReport(
      spark.read.parquet(s"$sf/customer.parquet"),
      spark.read.parquet(s"$sf/orders.parquet"),
      spark.read.parquet(s"$sf/lineitem.parquet"),
      spark.read.parquet(s"$sf/nation.parquet"),
      "1996-01-01", "1997-01-01", 10).collect()
    assert(r.nonEmpty && r.length <= 10)
    val revs = r.map(_.getLong(3))
    assert(revs.sameElements(revs.sortBy(-_)), "descending by revenue")
    // cross-check the top row against a direct recomputation
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val or = spark.read.parquet(s"$sf/orders.parquet")
    val expectTop = li.filter(col("l_returnflag") === "R")
      .join(or.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey") === r.head.getLong(0))
      .selectExpr("CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) AS e4")
      .agg(sum("e4")).collect().head.getLong(0)
    assert(r.head.getLong(3) == expectTop)
  }

  test("promoRevenue: promo slice bounded by the total, date filter binds") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val pt = spark.read.parquet(s"$sf/part.parquet")
    val r = Analytics.promoRevenue(li, pt, "1996-01-01", "1996-04-01").collect().head
    assert(r.getLong(0) > 0L && r.getLong(0) < r.getLong(1))
    // widening the window strictly grows the item count
    val wide = Analytics.promoRevenue(li, pt, "1996-01-01", "1997-01-01").collect().head
    assert(wide.getLong(2) > r.getLong(2))
  }

  test("brandSuppliers: dedup-then-count equals countDistinct") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val pt = spark.read.parquet(s"$sf/part.parquet")
    val got = Analytics.brandSuppliers(li, pt).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = li.join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(countDistinct("l_suppkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("revenueRollup: levels reconcile — nations sum to regions sum to total") {
    val rows = Analytics.revenueRollup(
      spark.read.parquet(s"$sf/customer.parquet"),
      spark.read.parquet(s"$sf/orders.parquet"),
      spark.read.parquet(s"$sf/lineitem.parquet"),
      spark.read.parquet(s"$sf/nation.parquet"),
      spark.read.parquet(s"$sf/region.parquet"),
      "1996-01-01", "1999-01-01").collect()
    def by(lvl: Long) = rows.filter(_.getLong(4) == lvl)
    val grand = by(2)
    assert(grand.length == 1 && grand.head.isNullAt(0) && grand.head.isNullAt(1))
    val regions = by(1)
    assert(regions.forall(r => !r.isNullAt(0) && r.isNullAt(1)))
    val nations = by(0)
    assert(nations.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    // exact integer reconciliation across the three rollup levels
    assert(nations.map(_.getLong(2)).sum == grand.head.getLong(2))
    assert(regions.map(_.getLong(2)).sum == grand.head.getLong(2))
    for (reg <- regions)
      assert(nations.filter(_.getString(0) == reg.getString(0))
        .map(_.getLong(2)).sum == reg.getLong(2))
    assert(nations.map(_.getLong(3)).sum == grand.head.getLong(3))
  }

  test("waitingSuppliers: only the sole late supplier of a multi-supplier order counts") {
    import spark.implicits._
    val ord = Seq(
      (1L, ts("1996-01-01")), (2L, ts("1996-01-01")),
      (3L, ts("1996-01-01")), (4L, ts("1996-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val supp = Seq((100L, "SA"), (101L, "SB")).toDF("s_suppkey", "s_name")
    val late = ts("1996-06-01"); val ok = ts("1996-02-01")
    val li = Seq(
      // order 1: A late, B on time, 2 suppliers -> A counts
      (1L, 100L, late), (1L, 101L, ok),
      // order 2: BOTH late -> n_late_supp = 2, neither counts
      (2L, 100L, late), (2L, 101L, late),
      // order 3: A late but the ONLY supplier -> no EXISTS partner
      (3L, 100L, late),
      // order 4: A late TWICE (two lines), B on time -> A counts ONCE
      (4L, 100L, late), (4L, 100L, late), (4L, 101L, ok))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val r = Analytics.waitingSuppliers(ord, li, supp, 90, 10).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq((100L, "SA", 2L)))
  }

  test("staleParts: anti-join keeps exactly the parts with no period shipment") {
    import spark.implicits._
    val part = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("p_partkey", "p_name")
    val li = Seq(
      (1L, ts("2001-10-01")),  // in period -> part 1 not stale
      (2L, ts("2001-01-01")))  // before period -> part 2 stale
      .toDF("l_partkey", "l_shipdate")
    val r = Analytics.staleParts(part, li, "2001-09-01", "2002-01-01")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(r == Seq(2L, 3L))
  }

  test("mergePricingSummaries: base + delta partials equal the full scan exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val full = Analytics.pricingSummary(li, "2000-12-01")
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val merged = Analytics.mergePricingSummaries(
        Analytics.pricingSummary(li.filter(col("l_orderkey") % 5 =!= 0), "2000-12-01"),
        Analytics.pricingSummary(li.filter(col("l_orderkey") % 5 === 0), "2000-12-01"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    assert(merged == full)
  }

  test("volumeShipping: cross-nation pairs only, per ship year, ordered pair") {
    import spark.implicits._
    val nation = Seq((1L, "A"), (2L, "B")).toDF("n_nationkey", "n_name")
    val cust = Seq((10L, 1L), (11L, 2L)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((100L, 1L), (101L, 2L)).toDF("s_suppkey", "s_nationkey")
    val ord = Seq((1000L, 10L), (1001L, 11L)).toDF("o_orderkey", "o_custkey")
    val li = Seq(
      // B-supplier -> B-customer: same nation, dropped
      (1001L, 101L, 10.0, 0.0, ts("1996-03-01")),
      // A-supplier -> B-customer, 1996: 10.00 no discount = 100000 e4
      (1001L, 100L, 10.0, 0.0, ts("1996-03-01")),
      // B-supplier -> A-customer, 1997: 5.00 at 10% = 500c * 90
      (1000L, 101L, 5.0, 0.1, ts("1997-06-01")),
      // A-supplier -> A-customer: same nation, dropped
      (1000L, 100L, 7.0, 0.0, ts("1996-07-01")))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val r = Analytics.volumeShipping(cust, ord, li, supp, nation,
      "1996-01-01", "1998-01-01").orderBy("supp_nation", "ship_year").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(
      ("A", "B", 1996L, 100000L),   // 1000 cents * 100
      ("B", "A", 1997L, 500L * 90)))
  }

  test("marketShare: one aggregation carries both the nation and total sums") {
    val r = Analytics.marketShare(
      spark.read.parquet(s"$sf/customer.parquet"),
      spark.read.parquet(s"$sf/orders.parquet"),
      spark.read.parquet(s"$sf/lineitem.parquet"),
      spark.read.parquet(s"$sf/supplier.parquet"),
      spark.read.parquet(s"$sf/nation.parquet"),
      spark.read.parquet(s"$sf/region.parquet"),
      spark.read.parquet(s"$sf/part.parquet"),
      "NATION_3", "EUROPE", "STANDARD", "1995-01-01", "1998-01-01").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(1) >= 0L && row.getLong(1) <= row.getLong(2),
        "nation share sum within the total")
    }
  }

  test("productProfit: margin may go negative, integer-exact per nation-year") {
    import spark.implicits._
    val nation = Seq((1L, "A")).toDF("n_nationkey", "n_name")
    val supp = Seq((100L, 1L)).toDF("s_suppkey", "s_nationkey")
    val part = Seq((7L, "red widget", 2.00), (8L, "blue bolt", 1.00))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val li = Seq(
      // widget: revenue 10.00*0.9 -> 90000 e4; cost 3 * 200c * 100 = 60000
      (7L, 100L, 3.0, 10.0, 0.1, ts("1996-01-15")),
      // widget at a loss: revenue 1.00 -> 10000 e4; cost 2*200*100 = 40000
      (7L, 100L, 2.0, 1.0, 0.0, ts("1997-02-01")),
      // non-widget part: excluded by the name filter
      (8L, 100L, 1.0, 50.0, 0.0, ts("1996-03-01")))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
    val r = Analytics.productProfit(li, supp, nation, part, "widget")
      .orderBy("ship_year").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(("A", 1996L, 30000L), ("A", 1997L, -30000L)))
  }

  test("smallQuantityRevenue: decorrelated 20%-of-average, integer compare") {
    import spark.implicits._
    // part 1 (brand B): qtys 1,10,10,10,10 -> sum=41, n=5; below iff
    // 5*q*5 < 41 ⟺ q < 1.64 -> only the qty-1 line (price 2.00)
    // part 2 (brand B): qtys 5,5 -> 25*5 < 10 never -> no row
    // part 3 (other brand): excluded entirely
    val li = Seq(
      (1L, 1.0, 2.00), (1L, 10.0, 30.0), (1L, 10.0, 30.0),
      (1L, 10.0, 30.0), (1L, 10.0, 30.0),
      (2L, 5.0, 9.0), (2L, 5.0, 9.0),
      (3L, 1.0, 99.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "B"), (2L, "B"), (3L, "X"))
      .toDF("p_partkey", "p_brand")
    val r = Analytics.smallQuantityRevenue(li, part, "B").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 1L, 200L)))
  }

  test("minCostSupplier: per-part min with ties kept, region-scoped") {
    import spark.implicits._
    val region = Seq((1L, "EUROPE"), (2L, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((10L, "FRANCE", 1L), (20L, "CHINA", 2L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supp = Seq((100L, "SuppA", 10L), (101L, "SuppB", 10L), (102L, "SuppC", 20L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    // part 7: A ships at 5.00 twice and 9.00; B at 5.00 -> tie at 500 kept
    // part 8: only C (ASIA) ships it -> excluded (no EUROPE supplier)
    val li = Seq(
      (7L, 100L, 5.00), (7L, 100L, 9.00), (7L, 100L, 5.00), (7L, 101L, 5.00),
      (8L, 102L, 1.00))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val r = Analytics.minCostSupplier(li, supp, nation, region, "EUROPE")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getString(3), x.getLong(4))).toSeq
    assert(r == Seq((7L, 100L, "SuppA", "FRANCE", 500L),
      (7L, 101L, "SuppB", "FRANCE", 500L)))
  }

  test("salesOpportunity: above-average balance, dormant since cutoff") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    // positive balances: 100.00, 200.00, 300.00, 250.00 -> avg 212.50;
    // the cross-multiplied compare is STRICT, so c3 (300) and c5 (250)
    // beat it; c4's negative balance never qualifies. c3's only order
    // PRECEDES the cutoff (dormant -> kept); c5 ordered AFTER the
    // cutoff -> anti-joined away
    val cust = Seq(
      (1L, 7, 100.00), (2L, 7, 200.00), (3L, 7, 300.00),
      (4L, 8, -50.00), (5L, 8, 250.00))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq(
      (900L, 5L, ts("2000-07-01")), (901L, 3L, ts("1999-01-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val r = Analytics.salesOpportunity(cust, orders, "2000-06-01").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((7, 1L, 30000L)))
    // an order ON the cutoff instant counts as active (>= is inclusive)
    val onCut = Seq((902L, 3L, ts("2000-06-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    assert(Analytics.salesOpportunity(cust, onCut, "2000-06-01")
      .collect().map(_.getLong(1)).sum == 1L) // only c5 survives
    // tie with the average exactly: strict > excludes it
    val cust2 = Seq((1L, 1, 100.00), (2L, 1, 100.00))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    assert(Analytics.salesOpportunity(cust2,
      Seq.empty[(Long, Long, Timestamp)]
        .toDF("o_orderkey", "o_custkey", "o_orderdate"),
      "2000-06-01").count() == 0L)
  }

  test("priorityPivot: explicit-values pivot, absent cells coalesce to 0") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq((1L, "1-URGENT"), (2L, "5-LOW"), (3L, "1-URGENT"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      (1L, ts("1996-03-01")), (1L, ts("1996-04-01")), // two urgent lines in 96
      (2L, ts("1996-05-01")),                         // one low line in 96
      (3L, ts("1997-01-01")))                         // one urgent line in 97
      .toDF("l_orderkey", "l_shipdate")
    val r = Analytics.priorityPivot(orders, li).orderBy("ship_year").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5))).toSeq
    assert(r == Seq(
      (1996, 2L, 0L, 0L, 0L, 1L),
      (1997, 1L, 0L, 0L, 0L, 0L))) // every absent priority reads 0, not null
  }

  test("importantParts: cross-multiplied percent-of-average threshold") {
    import spark.implicits._
    // part 1: 90.00 revenue; part 2: 10.00 -> average 50.00; at 100% of
    // average only part 1 passes (strict >); at 179% it still passes
    // (90 = 1.8x avg), at 180% the strict compare excludes it
    val li = Seq((1L, 90.00, 0.00), (2L, 10.00, 0.00))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val r = Analytics.importantParts(li, 100).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((1L, 900000L)))
    assert(Analytics.importantParts(li, 179).count() == 1L)
    assert(Analytics.importantParts(li, 180).count() == 0L)
  }

  test("bandedRevenue: each OR band admits, near-misses drop") {
    import spark.implicits._
    val part = Seq(
      (1L, "Brand#1", 8), (2L, "Brand#2", 15), (3L, "Brand#3", 30),
      (4L, "Brand#1", 11)) // size 11 > 10: Brand#1 band near-miss
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 10.0, 100.00, 0.00), // band 1: qty 10 <= 20 -> in
      (1L, 25.0, 100.00, 0.00), // band 1 near-miss: qty 25 > 20
      (2L, 30.0, 50.00, 0.00),  // band 2: qty 30 <= 30 -> in
      (3L, 40.0, 25.00, 0.00),  // band 3: qty 40 <= 40 -> in
      (4L, 5.0, 999.00, 0.00))  // part near-miss
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val r = Analytics.bandedRevenue(li, part).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1750000L) // 175.00 e4
  }

  test("colocatedPriorityRevenue: correct rollup AND a shuffle-free join") {
    import spark.implicits._
    import java.sql.Timestamp
    val orders = Seq((1L, "1-URGENT"), (2L, "1-URGENT"), (3L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      (1L, 100.00, 0.10), (1L, 50.00, 0.00), (2L, 20.00, 0.00),
      (3L, 10.00, 0.50), (4L, 999.00, 0.00)) // orderkey 4 has no order
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
    val r = Analytics.colocatedPriorityRevenue(orders, li)
      .orderBy("o_orderpriority").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    // URGENT: 100*0.9 + 50 + 20 = 160.00 -> 1_600_000 e4; LOW: 10*0.5
    assert(r == Seq(("1-URGENT", 3L, 1600000L), ("5-LOW", 1L, 50000L)))
    // the layout contract: with both sides bucketed on the join key, the
    // ONLY Exchange left is the post-join rollup's — the join itself
    // consumes the scans' bucket partitioning
    val tag = "spec" + System.nanoTime()
    orders.write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable(s"go_$tag")
    li.select(col("l_orderkey"), lit(1L).as("rev_e4"))
      .write.bucketBy(16, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable(s"gl_$tag")
    try {
      val plan = Analytics.colocatedJoinOn(spark, s"go_$tag", s"gl_$tag")
      plan.collect()
      // AQE prints Final + Initial plans; assert on the FINAL section only
      val s = plan.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      assert(s.contains("SortMergeJoin"), s)
      assert(s.contains("Bucketed: true"), s)
      assert("Exchange".r.findAllIn(s).length == 1, s)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS go_$tag")
      spark.sql(s"DROP TABLE IF EXISTS gl_$tag")
    }
  }

  test("scdMerge: every row fate — passthrough, no-op, change, insert, latest-wins") {
    import spark.implicits._
    val current = Seq(
      (1L, 10L, 0L, 500L),  // closed history row: untouched passthrough
      (1L, 20L, 500L, -1L), // open, update changes it -> close + reopen
      (2L, 30L, 0L, -1L),   // open, no update -> unchanged
      (3L, 40L, 0L, -1L),   // open, no-op update (same value) -> unchanged
      (4L, 50L, 0L, -1L))   // open, TWO updates -> latest (ts 900) wins
      .toDF("k", "v", "valid_from_us", "valid_to_us")
    val updates = Seq(
      (1L, 21L, 800L),
      (3L, 40L, 800L),
      (4L, 51L, 700L), (4L, 52L, 900L), // latest-wins collapse
      (9L, 99L, 950L))                  // insert: no open row
      .toDF("k", "v", "ts_us")
    val r = Analytics.scdMerge(current, updates).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(r == Seq(
      (1L, 10L, 0L, 500L),   // history preserved
      (1L, 20L, 500L, 800L), // closed at update ts
      (1L, 21L, 800L, -1L),  // new open version
      (2L, 30L, 0L, -1L),
      (3L, 40L, 0L, -1L),    // no-op: same open row, NOT re-versioned
      (4L, 50L, 0L, 900L),   // closed by the LATEST update
      (4L, 52L, 900L, -1L),  // latest value wins, not ts-700's 51
      (9L, 99L, 950L, -1L))) // insert
  }

  test("pitJoin: facts resolve the version valid AT their ts; gaps -> -1") {
    import spark.implicits._
    val dim = Seq(
      (1L, 20L, 0L, 800L),   // key 1: v=20 over [0, 800)
      (1L, 21L, 800L, -1L),  //        v=21 from 800 on (open)
      (2L, 30L, 500L, -1L))  // key 2: nothing before 500
      .toDF("k", "v", "valid_from_us", "valid_to_us")
    val facts = Seq(
      (10L, 1L, 100L),  // key 1 @ 100 -> old version 20
      (11L, 1L, 800L),  // boundary: valid_from inclusive -> 21
      (12L, 1L, 799L),  // last tick of the old version -> 20
      (13L, 2L, 100L),  // before key 2 existed -> -1 sentinel
      (14L, 2L, 500L),  // first tick -> 30
      (15L, 9L, 100L))  // unknown key -> -1
      .toDF("fact_id", "k", "ts_us")
    val r = Analytics.pitJoin(facts, dim).collect()
      .map(x => (x.getLong(0), x.getBoolean(3), x.getLong(4)))
      .sortBy(_._1).toSeq
    // matched disambiguates a real v = -1 from the no-match sentinel
    assert(r == Seq((10L, true, 20L), (11L, true, 21L), (12L, true, 20L),
      (13L, false, -1L), (14L, true, 30L), (15L, false, -1L)))
    // at most one version survives per fact: row count == fact count
    assert(Analytics.pitJoin(facts, dim).count() == 6L)
    // a legitimately negative dimension value is NOT mistaken for a gap
    val negDim = Seq((5L, -1L, 0L, -1L))
      .toDF("k", "v", "valid_from_us", "valid_to_us")
    val negFact = Seq((20L, 5L, 10L)).toDF("fact_id", "k", "ts_us")
    val nr = Analytics.pitJoin(negFact, negDim).collect().head
    assert(nr.getBoolean(3) && nr.getLong(4) == -1L)
  }

  test("topSupplier: argmax over quarter revenue, ties all survive") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    // s1: 100.00 at 10% = 90.00 rev; s2: two lines 40.00 + 50.00 at 0%
    //  = 90.00 rev (exact tie in _e4 space); s3 ships OUTSIDE the window
    val li = Seq(
      (100L, 100.00, 0.10, ts("1996-02-01")),
      (101L, 40.00, 0.00, ts("1996-02-10")),
      (101L, 50.00, 0.00, ts("1996-03-15")),
      (102L, 999.00, 0.00, ts("1996-04-01")))
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supp = Seq((100L, "SuppA"), (101L, "SuppB"), (102L, "SuppC"))
      .toDF("s_suppkey", "s_name")
    val r = Analytics.topSupplier(li, supp, "1996-01-01", "1996-04-01")
      .orderBy("s_suppkey").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq((100L, "SuppA", 900000L), (101L, "SuppB", 900000L)))
  }

  test("dominantSuppliers: strict majority of a part's shipped quantity") {
    import spark.implicits._
    val supp = Seq((100L, "SuppA", 10L), (101L, "SuppB", 10L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((10L, "FRANCE")).toDF("n_nationkey", "n_name")
    // part 1: A=6 of 10 -> dominant; part 2: A=5, B=5 of 10 -> neither
    // (strict >); part 3 outside the window entirely
    val li = Seq(
      (1L, 100L, 6.0, ts("1996-03-01")), (1L, 101L, 4.0, ts("1996-04-01")),
      (2L, 100L, 5.0, ts("1996-05-01")), (2L, 101L, 5.0, ts("1996-06-01")),
      (3L, 101L, 9.0, ts("1999-01-01")))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val r = Analytics.dominantSuppliers(li, supp, nation,
      "1996-01-01", "1997-01-01").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getLong(3), x.getLong(4))).toSeq
    assert(r == Seq((100L, "SuppA", "FRANCE", 1L, 6L)))
  }

  test("cohortRevenue: first-order-year cohorts, per-cell actives and cents") {
    import spark.implicits._
    val ord = Seq(
      (1L, 10L, ts("1996-03-01"), 1.00),  // cust 10: cohort 1996
      (2L, 10L, ts("1997-01-01"), 2.00),
      (3L, 11L, ts("1996-06-01"), 4.00),  // cust 11: cohort 1996
      (4L, 12L, ts("1997-05-01"), 8.00))  // cust 12: cohort 1997
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val r = Analytics.cohortRevenue(ord).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map(
      (1996L, 1996L) -> ((2L, 2L, 500L)),   // custs 10+11, 100+400 cents
      (1996L, 1997L) -> ((1L, 1L, 200L)),   // cust 10 returning
      (1997L, 1997L) -> ((1L, 1L, 800L))))  // cust 12 new
  }

  test("statusCube: cells, both marginals, grand total, explicit lvl bits") {
    import spark.implicits._
    val li = Seq(
      (100.00, 0.00, "A", "F", ts("1998-01-01")),  // e4 = 10000*100
      (10.00, 0.10, "A", "O", ts("1998-02-01")),   // e4 = 1000*90
      (1.00, 0.00, "R", "F", ts("1998-03-01")),    // e4 = 100*100
      (99.0, 0.0, "R", "F", ts("1999-01-01")))     // past cutoff: excluded
      .toDF("l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Analytics.statusCube(li, "1998-09-01").collect()
      .map(x => (Option(x.getString(0)).getOrElse("-"),
        Option(x.getString(1)).getOrElse("-"),
        x.getLong(2), x.getLong(3), x.getLong(4))).toSet
    assert(r == Set(
      ("A", "F", 1L, 1000000L, 0L), ("A", "O", 1L, 90000L, 0L),
      ("R", "F", 1L, 10000L, 0L),
      ("A", "-", 2L, 1090000L, 1L), ("R", "-", 1L, 10000L, 1L),
      ("-", "F", 2L, 1010000L, 2L), ("-", "O", 1L, 90000L, 2L),
      ("-", "-", 3L, 1100000L, 3L)))
  }

  test("revenueDeciles: customer aggregate first, deterministic tie order") {
    import spark.implicits._
    // 4 customers, quartiles (n=4): revenues 30, 20, 20, 10 — the two
    // ties order by custkey, so quartile 2 is custkey 1, quartile 3 is
    // custkey 3 (both 2000 cents)
    val orders = Seq(
      (1L, 10.00), (1L, 10.00),   // cust 1: 2000 cents
      (2L, 30.00),                // cust 2: 3000
      (3L, 20.00),                // cust 3: 2000
      (4L, 10.00))                // cust 4: 1000
      .toDF("o_custkey", "o_totalprice")
    val r = Analytics.revenueDeciles(orders, 4).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map(
      1L -> ((1L, 3000L, 3000L, 3000L)),
      2L -> ((1L, 2000L, 2000L, 2000L)),
      3L -> ((1L, 2000L, 2000L, 2000L)),
      4L -> ((1L, 1000L, 1000L, 1000L))))
  }

  test("basketPairs: distinct per order, support threshold") {
    import spark.implicits._
    val li = Seq(
      (1L, 101L), (1L, 101L), (1L, 102L), (1L, 103L), // dup line collapses
      (2L, 101L), (2L, 102L),
      (3L, 101L), (3L, 102L),
      (4L, 103L))
      .toDF("l_orderkey", "l_partkey")
    val r = Analytics.basketPairs(li, 2L).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((101L, 102L, 3L)))
    val all = Analytics.basketPairs(li, 1L).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(all == Set((101L, 102L, 3L), (101L, 103L, 1L), (102L, 103L, 1L)))
  }

  test("basketRules: both directions, floor-division confidence") {
    import spark.implicits._
    val li = Seq(
      (1L, 101L), (1L, 102L), (2L, 101L), (2L, 102L), (3L, 101L), (3L, 102L),
      (4L, 101L)) // 101 alone in order 4 -> conf(101->102) = 3/4
      .toDF("l_orderkey", "l_partkey")
    val r = Analytics.basketRules(li, 2L).collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map(
      (101L, 102L) -> ((3L, 4L, 750000L)),
      (102L, 101L) -> ((3L, 3L, 1000000L))))
  }

  test("groupedLinReg: exact fit, negative slope, degenerate NULL") {
    import spark.implicits._
    val df = Seq(
      ("up", 1L, 2L), ("up", 2L, 4L), ("up", 3L, 6L),
      ("dn", 1L, 10L), ("dn", 2L, 8L), ("dn", 3L, 6L),
      ("flat", 5L, 1L), ("flat", 5L, 9L)) // zero x-variance
      .toDF("g", "x", "y")
    val r = Analytics.groupedLinReg(df, "g", col("x"), col("y")).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("up").getLong(6) == 2000L && r("up").getLong(7) == 0L)
    // negative slope exercises truncation-toward-zero agreement
    assert(r("dn").getLong(6) == -2000L && r("dn").getLong(7) == 12000L)
    assert(r("flat").isNullAt(6) && r("flat").isNullAt(7))
    assert(r("dn").getLong(4) == 44L && r("dn").getLong(5) == 14L) // moments
  }
}
