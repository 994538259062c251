package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic warehouse analytics over the TPC-H-shaped tables — the
  * relational side of the engine exercised end-to-end (multi-table joins,
  * pushed-down date/segment filters, grouped aggregation, top-k), with
  * every money aggregate computed in INTEGER space so results are exact
  * in any engine: prices are cents-exact doubles and discount/tax are
  * percent-exact, so `round(x*100)` recovers the integers and sums of
  * integer products are order-independent — no floating-point summation
  * order to disagree about. Revenue units: `_e4` = cents x percent
  * (1e-4 currency units), `_e6` = cents x percent x percent.
  *
  * Plans: filters reach the parquet scans (PushedFilters on dates and
  * segment), the always-tiny dims (nation, region) broadcast explicitly,
  * and the big-table joins stay un-hinted — AQE picks broadcast at test
  * scale and shuffled joins at warehouse scale. Top-k is
  * TakeOrderedAndProject, never a global sort. */
object Analytics {

  private def cents(c: Column): Column = round(c * 100).cast("long")
  private def pct(c: Column): Column = round(c * 100).cast("long")
  private def revenueE4: Column =
    cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))

  /** Q1-style pricing summary: per (returnflag, linestatus) totals over
    * lineitem shipped on or before `cutoff`. One scan, one hash
    * aggregation with map-side partials. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem.filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(revenueE4).as("sum_disc_e4"),
        sum(revenueE4 * (lit(100L) + pct(col("l_tax")))).as("sum_charge_e6"),
        count(lit(1)).as("count_order"))

  /** Q3-style unshipped-order revenue: top-k orders by discounted revenue
    * among `segment` customers, ordered before `cutoff` with lineitems
    * shipping after it. Date and segment filters push into the scans;
    * orderdate is surfaced as epoch micros (timezone-free compare). */
  def topRevenueOrders(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, segment: String, cutoff: String,
      k: Int = 10): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    lineitem.filter(col("l_shipdate") > cut)
      .join(orders.filter(col("o_orderdate") < cut),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment).select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        // parquet timestamp[us] arrives as TIMESTAMP_NTZ; the UTC-session
        // cast makes unix_micros exact (same convention as EventSource)
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"))
      .agg(sum(revenueE4).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey")).limit(k)
  }

  /** Q4-style order-priority check, adapted to this schema (lineitem has
    * no commit/receipt dates): count orders per priority placed in
    * [from, until) that have AT LEAST ONE lineitem shipping more than
    * `lateDays` after the order date. The existential is a LEFT SEMI join
    * — Spark never materializes the matching lineitems, and the date
    * predicate rides the join condition so the semi-join build side is
    * the filtered orders slice, not all of lineitem. */
  def orderPriorityCheck(orders: DataFrame, lineitem: DataFrame,
      from: String, until: String, lateDays: Int = 60): DataFrame = {
    val o = orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
      col("o_orderdate") < lit(until).cast("timestamp"))
    o.join(lineitem.select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q13-style customer distribution: histogram of customers by order
    * count, INCLUDING zero-order customers (the left outer join is the
    * point of the shape — a semi/inner join would drop the c_count=0
    * bucket). Two aggregations, both map-side combinable; the first
    * groups on the join key it just shuffled on, so AQE coalesces the
    * exchanges. */
  def customerDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select("c_custkey")
      .join(orders.select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))

  /** Q18-style large-volume customers: orders whose total lineitem
    * quantity exceeds `minQty`, with the customer attached, top-k by
    * quantity. The HAVING filter runs on the first aggregation's output
    * — only qualifying orders (a tiny fraction) reach the customer join,
    * so that join broadcasts the survivors at any scale. Quantities are
    * integer-valued doubles in the data; summed as longs = exact. */
  def bigOrders(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, minQty: Long, k: Int = 20): DataFrame = {
    val qualifying = lineitem
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    qualifying
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        cents(col("o_totalprice")).as("totalprice_cents"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey")).limit(k)
  }

  /** Q5-style local-supplier revenue per nation inside one region: the
    * six-table join with the customer-nation = supplier-nation equality.
    * nation and region broadcast (always tiny); the region filter prunes
    * nations BEFORE any big-table join touches them. */
  def regionRevenue(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String, from: String,
      until: String): DataFrame = {
    val nations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(revenueE4).as("revenue_e4"))
  }

  /** Q10-style returned-item report: top-k customers by revenue lost to
    * returned lineitems ('R' flag) among orders placed in
    * [from, until) — the churn-investigation ranking. Filters push into
    * both scans (order date band, return flag), nation broadcasts, the
    * customer/orders/lineitem joins stay un-hinted for AQE, top-k is
    * TakeOrderedAndProject. Integer `_e4` money. */
  def returnedItemReport(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame, from: String, until: String,
      k: Int = 20): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_name", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(revenueE4).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(k)

  /** Q14-style promotion effect: revenue from PROMO-type parts vs total
    * over lineitems shipped in [from, until) — both sides INTEGER `_e4`
    * sums in ONE aggregation (the classic formulation's percentage is the
    * caller's one float division; keeping the two exact sums makes the
    * query engine-exact). Ship-date filter pushes into the scan; the
    * part join is un-hinted (AQE broadcasts the dimension when it fits).
    * Output: one row (promo_e4, total_e4, n_items). */
  def promoRevenue(lineitem: DataFrame, part: DataFrame,
      from: String, until: String): DataFrame =
    lineitem.filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(part.select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenueE4).otherwise(0L)).as("promo_e4"),
        sum(revenueE4).as("total_e4"),
        count(lit(1)).as("n_items"))

  /** Q16-flavored supplier breadth: how many DISTINCT suppliers ship each
    * part brand — the supplier-diversification panel. Dedup-then-count
    * ((brand, suppkey) aggregate first, then the per-brand count): never
    * a count-distinct Expand over the joined stream. */
  def brandSuppliers(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select("l_partkey", "l_suppkey")
      .join(part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "l_suppkey").agg(count(lit(1)).as("n"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_suppliers"), sum("n").as("n_lineitems"))

  /** Q17-style small-quantity analysis: for each part of `brand`, the
    * lineitems whose quantity falls below 20% of that part's average
    * quantity — the canonical correlated scalar subquery ("compare each
    * row against its group's aggregate computed in a subquery"),
    * decorrelated into ONE per-part aggregate plus ONE join back, never a
    * re-scan per outer row. The 20%-of-average compare stays exact in
    * integer space: qty < sum/(5n) ⟺ 5·qty·n < sum (quantities are
    * integer-valued). The brand's part keys broadcast into the lineitem
    * scan FIRST, so both the aggregate side and the probe side only ever
    * read the brand's lineitems — per-part aggregates are identical
    * either way because p_partkey is the part PK. Output: one row per
    * part that has below-threshold lineitems. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
      brand: String): DataFrame = {
    val brandKeys = part.filter(col("p_brand") === brand).select("p_partkey")
    val li = lineitem
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_cents"))
      .join(broadcast(brandKeys), col("l_partkey") === col("p_partkey"))
      .drop("p_partkey")
    val perPart = li.groupBy("l_partkey")
      .agg(sum("qty").as("part_sum_qty"), count(lit(1)).as("part_n"))
    li.join(perPart, "l_partkey")
      .filter(lit(5L) * col("qty") * col("part_n") < col("part_sum_qty"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_below"), sum("price_cents").as("below_cents"))
  }

  /** Q2-style min-cost supplier: for each part shipped by suppliers of
    * `regionName`, the supplier(s) achieving the minimum observed line
    * price — the min-per-group subquery driving an outer join
    * ("WHERE cost = (SELECT MIN(cost) ... WHERE partkey = p_partkey)").
    * Decorrelated: per-(part, supplier) min, per-part min OVER that
    * aggregate (agg-of-agg — the big relation is scanned once), equality
    * join back; ties all survive, as in the classic query. The region's
    * supplier keys broadcast into the lineitem join; supplier names and
    * nation attach at the END, to the tiny winner set only. */
  def minCostSupplier(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame, regionName: String,
      k: Int = 100): DataFrame = {
    val regNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val regSupp = supplier
      .join(broadcast(regNations), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
    val pairCost = lineitem
      .join(broadcast(regSupp.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(cents(col("l_extendedprice"))).as("cost_cents"))
    val partMin = pairCost.groupBy("l_partkey")
      .agg(min("cost_cents").as("min_cost"))
    pairCost.join(partMin, "l_partkey")
      .filter(col("cost_cents") === col("min_cost"))
      .join(regSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("n_name"), col("cost_cents"))
      .orderBy("l_partkey", "l_suppkey").limit(k)
  }

  /** Q20-flavored dominant suppliers: suppliers who shipped MORE THAN
    * HALF of some part's total quantity in [from, until) — the
    * threshold-per-group subquery shape ("supp_qty > 0.5 * (SELECT
    * SUM(qty) ... WHERE partkey = ...)"). The per-part total aggregates
    * OVER the per-(part, supplier) aggregate, so lineitem is scanned
    * once and the second shuffle moves only the pair relation; the
    * half compare is exact in integers (2·supp_qty > total). Supplier
    * and nation names attach to the small dominant set at the end. */
  def dominantSuppliers(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, from: String, until: String): DataFrame = {
    val pairQty = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("supp_qty"))
    val partTotal = pairQty.groupBy("l_partkey")
      .agg(sum("supp_qty").as("total_qty"))
    pairQty.join(partTotal, "l_partkey")
      .filter(col("supp_qty") * 2 > col("total_qty"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_parts"), sum("supp_qty").as("dominated_qty"))
      .join(supplier.select("s_suppkey", "s_name", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_parts"), col("dominated_qty"))
  }

  /** Q15-style top supplier(s): the supplier(s) whose shipped revenue in
    * [from, until) EQUALS the global maximum — the "join an aggregate to
    * its own max" argmax shape (Q15's revenue view + scalar subquery).
    * One shuffle builds the per-supplier revenue relation; its max
    * reduces to ONE broadcast row, so the equality filter is a map-side
    * compare (ties all survive, per the spec); supplier names attach to
    * the tiny winner set by a broadcast-sized join. Revenue is `_e4`
    * integer money — the max and the equality are exact, so the argmax
    * can never split on rounding. Output: (s_suppkey, s_name,
    * total_revenue_e4). */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
      from: String, until: String): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(revenueE4).as("total_revenue_e4"))
    val best = rev.agg(max("total_revenue_e4").as("best_e4"))
    rev.crossJoin(broadcast(best))
      .filter(col("total_revenue_e4") === col("best_e4"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue_e4")
  }

  /** Q7-style volume shipping: revenue flowing between each ORDERED
    * (supplier nation, customer nation) pair per ship year, cross-nation
    * only — the bilateral-trade panel. The nation dim broadcasts TWICE
    * under distinct aliases (supplier side and customer side of the same
    * tiny table); the big joins stay un-hinted for AQE; one aggregation
    * on (n1, n2, year) with map-side partials. Integer `_e4` money. */
  def volumeShipping(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      from: String, until: String): DataFrame = {
    val supN = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val custN = nation.select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    lineitem.filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
      .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum(revenueE4).as("revenue_e4"), count(lit(1)).as("n_items"))
  }

  /** Q8-style market share: per order year, the revenue supplied by
    * `nationName` vs ALL revenue into `regionName`'s customers for parts
    * of `partType` — the two sums of the classic share ratio kept as
    * exact integers (the caller's one float division). Customer-side
    * region filter prunes via the broadcast nation⋈region dim; the
    * supplier nation flag rides the broadcast supplier-nation join into
    * a conditional sum — ONE aggregation computes both sums. */
  def marketShare(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, part: DataFrame, nationName: String,
      regionName: String, partType: String, from: String,
      until: String): DataFrame = {
    val regNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("rn_key"))
    val supN = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    lineitem
      .join(part.filter(col("p_type") === partType).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(regNations), col("c_nationkey") === col("rn_key"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        sum(when(col("supp_nation") === nationName, revenueE4).otherwise(0L))
          .as("nation_e4"),
        sum(revenueE4).as("total_e4"),
        count(lit(1)).as("n_items"))
  }

  /** Q9-flavored product profit: per (supplier nation, ship year), the
    * margin sum(revenue − qty·catalog cost) over parts whose name
    * contains `partNameLike` — adapted to this schema's part catalog
    * (p_retailprice stands in for the classic supplycost). Profit stays
    * in the integer `_e4` space (cost cents × 100 aligns the units) and
    * may legitimately go negative per line. One aggregation after the
    * four-table join; nation broadcasts. */
  def productProfit(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, part: DataFrame,
      partNameLike: String): DataFrame = {
    val profitE4 = revenueE4 -
      col("l_quantity").cast("long") * cents(col("p_retailprice")) * 100L
    lineitem
      .join(part.filter(col("p_name").contains(partNameLike))
          .select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum(profitE4).as("profit_e4"), count(lit(1)).as("n_items"))
  }

  /** Q21-style waiting suppliers: suppliers whose lineitem shipped late
    * (more than `lateDays` past the order date) on a multi-supplier order
    * where NO OTHER supplier was late — the classic double
    * EXISTS/NOT-EXISTS correlated query, decorrelated into per-order
    * aggregates: n_supp = distinct suppliers, n_late_supp = distinct
    * late suppliers, and a line qualifies iff it is late, n_supp >= 2,
    * and n_late_supp = 1 (the late supplier is then the only one). ONE
    * scan of the joined relation feeds both aggregates; the EXISTS pair
    * never re-probes lineitem per row. Output: top-k suppliers by the
    * count of orders they alone kept waiting. */
  def waitingSuppliers(orders: DataFrame, lineitem: DataFrame,
      supplier: DataFrame, lateDays: Int = 90, k: Int = 20): DataFrame = {
    val lines = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")).as("late"))
    // BOTH branches derive from the IDENTICAL (order, supplier) aggregate
    // subplan, so Spark's ReuseExchange evaluates it once — one lineitem
    // scan feeds the whole query (a literal translation of the EXISTS
    // pair would probe lineitem three times)
    val pairs = lines
      .groupBy("l_orderkey", "l_suppkey").agg(max("late").as("supp_late"))
    val perOrder = pairs
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late_supp"))
    pairs.filter(col("supp_late"))
      .select("l_orderkey", "l_suppkey")
      .join(perOrder, "l_orderkey")
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey")).limit(k)
  }

  /** Stale parts: catalog parts with NO lineitem shipping in
    * [from, until) — the explicit LEFT ANTI join (NOT EXISTS; Spark
    * materializes nothing from the probe side, and the date filter
    * prunes the build side to the period's shipments before the
    * anti-join). The dead-inventory panel. Output: (p_partkey, p_name). */
  def staleParts(part: DataFrame, lineitem: DataFrame,
      from: String, until: String): DataFrame =
    part.select("p_partkey", "p_name")
      .join(lineitem.filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
          col("l_shipdate") < lit(until).cast("timestamp"))
          .select("l_partkey"),
        col("p_partkey") === col("l_partkey"), "left_anti")

  /** Incremental aggregate maintenance: merge a BASE pricing summary with
    * the summary of a DELTA slice — the warehouse refresh pattern where
    * yesterday's aggregate absorbs today's partition without rescanning
    * the base. Works because every [[pricingSummary]] measure is an
    * algebraic partial (sums and counts in exact integer space):
    * re-aggregating the unioned summaries IS the full-scan answer,
    * bit for bit (spec + oracle pin merged == full scan). */
  def mergePricingSummaries(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("sum_qty").as("sum_qty"),
        sum("sum_base_cents").as("sum_base_cents"),
        sum("sum_disc_e4").as("sum_disc_e4"),
        sum("sum_charge_e6").as("sum_charge_e6"),
        sum("count_order").as("count_order"))

  /** Customer running totals: each order of a `segment`'s customers in
    * [from, until) with the customer's CUMULATIVE spend up to and
    * including it — the classic partitioned running-sum window
    * (SUM OVER (PARTITION BY customer ORDER BY date)). One shuffle on
    * the customer key, linear per partition, deterministic order via the
    * (o_orderdate, o_orderkey) tiebreak; integer cents. Segment and
    * date filters push into the scans. */
  def runningTotals(customer: DataFrame, orders: DataFrame,
      segment: String, from: String, until: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate_us"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .join(customer.filter(col("c_mktsegment") === segment)
        .select("c_custkey"), col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        cents(col("o_totalprice")).as("price_cents"))
      .withColumn("running_cents", sum("price_cents").over(w))
  }

  /** Top-N orders per customer by order value — the rank-per-group
    * window Spark compiles to WindowGroupLimit: each partition keeps at
    * most N rows BEFORE the exchange (partial) and after it (final), so
    * the shuffle moves O(N·customers) rows, never every order. Ties
    * break on o_orderkey. Output: (c_custkey, rank, o_orderkey,
    * totalprice_cents). */
  def topOrdersPerCustomer(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("c_custkey")
      .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
    orders
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("totalprice_cents"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Q22-style sales opportunity: per-nation count and balance of
    * ABOVE-AVERAGE-balance customers DORMANT since a cutoff (no order on
    * or after `since`) — the classic "anti-join against facts, threshold
    * against a global scalar subquery" shape. The scalar (count, sum of
    * positive balances) reduces to ONE broadcast row; the threshold
    * compare cross-multiplies (bal·n_pos > sum_pos) so no division ever
    * happens — integer-exact in any engine. The NOT EXISTS decorrelates
    * to a LEFT ANTI join on the customer key against the date-filtered
    * orders slice (the filter pushes to the scan; only o_custkey
    * survives column pruning), and the final per-nation rollup is one
    * map-side-combinable aggregate.
    * Output: (c_nationkey, numcust, totacctbal_cents). */
  def salesOpportunity(customer: DataFrame, orders: DataFrame,
      since: String): DataFrame = {
    val cust = customer.select(col("c_custkey"), col("c_nationkey"),
      cents(col("c_acctbal")).as("bal_cents"))
    val pos = cust.filter(col("bal_cents") > 0L)
      .agg(count(lit(1)).as("n_pos"), sum("bal_cents").as("sum_pos"))
    cust.crossJoin(broadcast(pos))
      .filter(col("bal_cents") * col("n_pos") > col("sum_pos"))
      .join(orders.filter(col("o_orderdate") >= lit(since).cast("timestamp"))
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("totacctbal_cents"))
  }

  /** Bucketed CO-LOCATED join — the lakehouse layout that amortizes a
    * fact-fact join's shuffle into the table write: both sides persist
    * bucketed (16 buckets) and bucket-sorted on the join key, so the
    * SortMergeJoin consumes the scans' existing HashPartitioning and the
    * join itself runs with NO Exchange on either side (spec-asserted —
    * the only shuffle left in the plan is the tiny post-join rollup).
    * At 100 TB this is the difference between shuffling the fact tables
    * once per query and once per LIFETIME: every subsequent key-aligned
    * join, aggregation, or MERGE reads the co-located layout for free.
    * The tables are managed + uniquely named and dropped after the
    * result materializes (this is a demonstration query; production
    * keeps them, that being the point). Output: (o_orderpriority,
    * n_items, revenue_e4). */
  def colocatedPriorityRevenue(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val (ot, lt) = (s"g_orders_$tag", s"g_lineitem_$tag")
    orders.select("o_orderkey", "o_orderpriority")
      .write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable(ot)
    lineitem.select(col("l_orderkey"), revenueE4.as("rev_e4"))
      .write.bucketBy(16, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable(lt)
    try {
      val res = colocatedJoinOn(spark, ot, lt)
      val rows = java.util.Arrays.asList(res.collect(): _*)
      spark.createDataFrame(rows, res.schema)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ot")
      spark.sql(s"DROP TABLE IF EXISTS $lt")
    }
  }

  /** The join+rollup plan over two already-bucketed tables — split out so
    * the spec can assert the executed plan's shuffle count on it. */
  private[graft] def colocatedJoinOn(spark: org.apache.spark.sql.SparkSession,
      ordersTable: String, lineitemTable: String): DataFrame =
    spark.table(ordersTable).hint("merge")
      .join(spark.table(lineitemTable), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum("rev_e4").as("revenue_e4"))

  /** Q12-flavored priority PIVOT: ship-year rows × order-priority
    * columns, lineitem counts in the cells — the wide-matrix report
    * shape, exercised through Dataset.pivot WITH the value list given
    * explicitly (Catalyst then compiles it to ONE aggregate of CASE
    * expressions — no second values-discovery pass, no extra shuffle;
    * an unlisted-values pivot would scan twice, the documented trap).
    * Output: (ship_year, urgent, high, medium, not_specified, low). */
  def priorityPivot(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), year(col("l_shipdate")).as("ship_year"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        Seq("l_orderkey"))
      .groupBy("ship_year")
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .select(col("ship_year"),
        coalesce(col("`1-URGENT`"), lit(0L)).as("urgent"),
        coalesce(col("`2-HIGH`"), lit(0L)).as("high"),
        coalesce(col("`3-MEDIUM`"), lit(0L)).as("medium"),
        coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("not_specified"),
        coalesce(col("`5-LOW`"), lit(0L)).as("low"))

  /** Q11-flavored important parts: parts whose revenue exceeds
    * `pctOfAvg`% of the AVERAGE part's — the group-aggregate-vs-global-
    * fraction threshold (Q11's HAVING > SUM(...)·fraction), stated
    * relative to the average so the predicate is SCALE-INVARIANT (a
    * fixed share-of-total bar silently empties as the part count
    * grows). One shuffle builds the per-part relation; the global
    * (total, count) re-aggregates THAT (never rescans lineitem) into
    * one broadcast row; the compare cross-multiplies
    * (rev·n_parts·100 > total·pctOfAvg) so no division or floating
    * fraction exists anywhere. Output: (l_partkey, revenue_e4). */
  def importantParts(lineitem: DataFrame, pctOfAvg: Int): DataFrame = {
    val perPart = lineitem.groupBy("l_partkey")
      .agg(sum(revenueE4).as("revenue_e4"))
    val total = perPart.agg(sum("revenue_e4").as("total_e4"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .filter(col("revenue_e4") * col("n_parts") * 100L >
        col("total_e4") * pctOfAvg)
      .select("l_partkey", "revenue_e4")
  }

  /** Q19-flavored disjunctive revenue: an OR of brand/size/quantity
    * conjunction bands — the multi-branch predicate that tests
    * PUSHDOWN: the common conjuncts Catalyst can factor
    * (p_size >= 1, the join key non-null) push to the scans, the
    * disjunction evaluates post-join as one codegen'd boolean, and the
    * part side broadcasts. Output: one (n_items, revenue_e4) row. */
  def bandedRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        revenueE4.as("rev_e4"))
      .join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size") <= 10 && col("qty") <= 20) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(5, 25) && col("qty") <= 30) ||
        (col("p_brand") === "Brand#3" && col("p_size") >= 20 && col("qty") <= 40))
      .agg(count(lit(1)).as("n_items"), sum("rev_e4").as("revenue_e4"))

  /** SCD Type-2 MERGE — the warehouse upsert that keeps dimension
    * history: apply an update batch to the current snapshot, closing out
    * changed rows and opening new versions. Row fates (key = `k`, open
    * row = `valid_to_us == -1`):
    *   - closed history rows pass through untouched;
    *   - open row, no update or same value → unchanged;
    *   - open row, changed value → CLOSED at the update ts + a NEW open
    *     row carries the new value from that ts;
    *   - update with no existing open row → fresh open row (insert).
    * Multiple updates per key collapse to the LATEST (ties to max value
    * — deterministic max_by) before merging, as MERGE requires a unique
    * source row per key. Shape: ONE full-outer equi-join on the key
    * between the open slice and the update batch; each joined row emits
    * 0-2 output structs map-side (explode, no window); closed rows union
    * around the join untouched. That is the scalable MERGE plan — cost
    * tracks open-dimension + delta, never rewrites history.
    * Output: (k, v, valid_from_us, valid_to_us; -1 = open). */
  def scdMerge(current: DataFrame, updates: DataFrame): DataFrame = {
    val closed = current.filter(col("valid_to_us") =!= -1L)
    val open = current.filter(col("valid_to_us") === -1L)
      .select(col("k"), col("v").as("v_old"), col("valid_from_us"))
    val latest = updates.groupBy("k")
      .agg(max_by(struct(col("ts_us"), col("v")),
        struct(col("ts_us"), col("v"))).as("u"))
      .select(col("k"), col("u.v").as("v_new"), col("u.ts_us").as("ts_us"))
    val merged = open.join(latest, Seq("k"), "full_outer")
      .select(col("k"), explode(when(col("v_new").isNull,
          // no update: the open row survives as-is
          array(struct(col("v_old").as("v"), col("valid_from_us"),
            lit(-1L).as("valid_to_us"))))
        .when(col("v_old").isNull,
          // insert: no open row existed
          array(struct(col("v_new").as("v"), col("ts_us").as("valid_from_us"),
            lit(-1L).as("valid_to_us"))))
        .when(col("v_new") === col("v_old"),
          // no-op update: value unchanged
          array(struct(col("v_old").as("v"), col("valid_from_us"),
            lit(-1L).as("valid_to_us"))))
        .otherwise(
          // change: close the old version, open the new one
          array(
            struct(col("v_old").as("v"), col("valid_from_us"),
              col("ts_us").as("valid_to_us")),
            struct(col("v_new").as("v"), col("ts_us").as("valid_from_us"),
              lit(-1L).as("valid_to_us"))))).as("r"))
      .select(col("k"), col("r.v"), col("r.valid_from_us"), col("r.valid_to_us"))
    closed.select("k", "v", "valid_from_us", "valid_to_us").unionAll(merged)
  }

  /** Point-in-time (SCD2) join — every fact looks up the dimension
    * version that was valid AT its timestamp, the temporal join every
    * as-of-correct report needs (joining the CURRENT version backdates
    * attribute changes onto old facts — the classic silent bug). Facts =
    * (fact_id, k, ts_us); dim = [[scdMerge]]-shaped versions
    * (k, v, valid_from_us, valid_to_us; -1 = open). The join is an
    * EQUI-join on the key — the only shuffle — with validity as a
    * residual range predicate: versions per key are non-overlapping and
    * bounded by update cadence, so per-fact fan-out is the version count
    * (at most one row survives the residual), never a range-join blowup.
    * Facts no version covers emit the -1 sentinel (engine-neutral).
    * Output: (fact_id, k, ts_us, matched, v). */
  def pitJoin(facts: DataFrame, dim: DataFrame): DataFrame = {
    val f = facts.select(col("fact_id"), col("k"), col("ts_us"))
    val d = dim.select(col("k").as("dk"), col("v"),
      col("valid_from_us"), col("valid_to_us"))
    f.join(d, col("k") === col("dk") &&
        col("valid_from_us") <= col("ts_us") &&
        (col("valid_to_us") === -1L || col("ts_us") < col("valid_to_us")),
        "left")
      .select(col("fact_id"), col("k"), col("ts_us"),
        // explicit matched flag: the -1 no-match sentinel alone is
        // ambiguous against a legitimate v = -1 (cents values go negative)
        col("dk").isNotNull.as("matched"),
        coalesce(col("v"), lit(-1L)).as("v"))
  }

  /** Grouping-sets revenue: ROLLUP over (region, nation) — per-nation
    * rows, per-region subtotals, and the grand total in ONE aggregation
    * (Catalyst's Expand feeds a single hash aggregate with map-side
    * partials; three separate GROUP BYs would scan the join three times).
    * `lvl` disambiguates the rollup levels explicitly (0 = nation row,
    * 1 = region subtotal, 2 = grand total) rather than relying on
    * engine-specific GROUPING() bit orders; the dimension names are never
    * NULL in the data, so NULL marks the rolled-up levels unambiguously.
    * Money stays in the integer `_e4` space — exact in any engine. */
  def revenueRollup(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame, region: DataFrame,
      from: String, until: String): DataFrame = {
    val dims = nation
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
      // rollup(Column*), not rollup(String*): the String overload resolves
      // through Dataset.col, whose dataset-id tag trips the ambiguous-
      // self-join check against the twice-joined dim lineage
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(revenueE4).as("revenue_e4"), count(lit(1)).as("n_items"))
      .withColumn("lvl",
        when(col("r_name").isNull, 2L)
          .when(col("n_name").isNull, 1L).otherwise(0L))
  }

  /** Q1-family CUBE: revenue and item counts for every subset of
    * (returnflag, linestatus) — cells, BOTH one-dimension marginals, and
    * the grand total in one pass. The remaining grouping-set geometry
    * next to [[revenueRollup]]'s hierarchy: CUBE's Expand emits 4 rows
    * per input row (2^dims), all collapsing into the same map-side
    * hash-aggregate partials before the single Exchange — at 100 TB the
    * shuffle still moves only the 4x-of-6-groups reduced relation. The
    * dimension columns are never NULL in the data, so NULL marks the
    * rolled-up levels unambiguously; `lvl` encodes the grouping bits
    * explicitly (0 = cell, 1 = returnflag marginal, 2 = linestatus
    * marginal, 3 = grand total) rather than relying on engine GROUPING()
    * bit orders. Integer `_e4` money.
    * Output: (l_returnflag, l_linestatus, n_items, revenue_e4, lvl). */
  def statusCube(lineitem: DataFrame, until: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(until).cast("timestamp"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"), sum(revenueE4).as("revenue_e4"))
      .withColumn("lvl",
        when(col("l_returnflag").isNull && col("l_linestatus").isNull, 3L)
          .when(col("l_linestatus").isNull, 1L)
          .when(col("l_returnflag").isNull, 2L).otherwise(0L))

  /** Acquisition-cohort revenue matrix — customers grouped by FIRST
    * order year, revenue tracked across subsequent order years: the
    * lifetime-value table behind every retention curve. The classic
    * two-phase decorrelation: a per-customer aggregate derives the
    * cohort (min order year — year() is monotone, so min-of-year equals
    * year-of-min), joins back on the same o_custkey the aggregate
    * already partitioned by (no third shuffle shape to pay), and the
    * matrix rollup is one map-side-combinable aggregate whose output is
    * years×years — constant-bounded. The lone `count_distinct` rides
    * the matrix aggregate (active customers per cell). Integer cents.
    * Output: (cohort_year, order_year, n_customers, n_orders,
    * revenue_cents). */
  def cohortRevenue(orders: DataFrame): DataFrame = {
    val cohorts = orders
      .groupBy("o_custkey")
      .agg(min(year(col("o_orderdate")).cast("long")).as("cohort_year"))
    orders
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("order_year"),
        cents(col("o_totalprice")).as("cents"))
      .join(cohorts, Seq("o_custkey"))
      .groupBy("cohort_year", "order_year")
      .agg(count_distinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum("cents").as("revenue_cents"))
  }

  /** Reorder-interval profile: per-customer statistics over the gaps
    * between CONSECUTIVE orders — the inter-arrival analysis behind
    * churn/replenishment models, and the one warehouse shape built on
    * `lag` + re-aggregation (vs the running-sum and rank-per-group
    * windows elsewhere in this suite). One partitioned window keyed by
    * the customer (deterministic (o_orderdate, o_orderkey) order — equal
    * timestamps cannot flip the lag pairing between engines), then a
    * map-side-combinable aggregate over the same key, which AQE plans
    * WITHOUT a second exchange: the window's hash partitioning on
    * o_custkey is reused by the groupBy. Gaps stay in integer
    * MICROSECONDS (`unix_micros`) — no date truncation or float division
    * for engines to disagree about. Only three columns survive pruning;
    * per-partition cost is linear. Customers below `minOrders` drop
    * (single-order customers have no gap at all).
    * Output: (o_custkey, n_orders, n_gaps, sum_gap_us, min_gap_us,
    * max_gap_us). */
  def orderGaps(orders: DataFrame, minOrders: Long = 4L): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("ts_us"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        count(col("gap_us")).as("n_gaps"),
        sum(col("gap_us")).as("sum_gap_us"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .filter(col("n_orders") >= minOrders)
  }

  /** Q6-style forecast revenue change — the canonical pushdown showcase:
    * three range predicates and a two-column projection, ONE aggregate.
    * The point at 100 TB is what the scan does: every predicate reaches
    * the parquet reader as a PushedFilter and only (extendedprice,
    * discount) survive column pruning — the plan IS the scan. Revenue in
    * cents×percent (1e-4 units), BIGINT-exact.
    * Output: one row (n_items, revenue_e4). */
  def forecastRevenue(lineitem: DataFrame, from: String, until: String,
      discountPct: Long, maxQty: Long): DataFrame =
    lineitem.filter(
        col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        pct(col("l_discount")).between(discountPct - 1, discountPct + 1) &&
        col("l_quantity") < maxQty)
      .agg(count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice")) * pct(col("l_discount")))
          .as("revenue_e4"))

  /** Customer revenue deciles — the "who are my top 10% customers"
    * distribution report. The working relation is the per-customer
    * aggregate (one map-side-combinable groupBy collapses orders to one
    * row per customer), so the NTILE window ranks CUSTOMERS, never
    * orders: Spark executes the un-partitioned NTILE window in a SINGLE
    * partition (Window.orderBy with no partitionBy — same shape ksDrift
    * documents), acceptable precisely because the relation was first
    * collapsed to dimension size: at 100 TB of orders it is still only
    * |customers| rows entering that one partition. Ties order by
    * (revenue desc, o_custkey) so decile boundaries are deterministic in
    * both engines. Money stays in integer cents end-to-end.
    * Output: (decile, n_customers, total_cents, min_cents, max_cents). */
  def revenueDeciles(orders: DataFrame, n: Int = 10): DataFrame = {
    val perCust = orders.groupBy("o_custkey")
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
    val w = Window.orderBy(col("rev_cents").desc, col("o_custkey"))
    perCust
      .withColumn("decile", ntile(n).over(w).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum("rev_cents").as("total_cents"),
        min("rev_cents").as("min_cents"),
        max("rev_cents").as("max_cents"))
  }

  /** Market-basket co-occurrence: pairs of parts appearing in the same
    * order at least `minSupport` times. ONE orderkey exchange collapses
    * each order to its sorted distinct part set; pair generation is then
    * a MAP-SIDE array fan-out bounded by the basket width (TPC-H orders
    * carry <= 7 lines, so <= 21 pairs per order — never |parts|^2), and
    * the pair counts combine map-side before the second exchange. The
    * support filter prunes the long tail before anything downstream
    * touches it. At 100 TB the working relations are |orders| baskets
    * and the surviving pair vocabulary — the classic two-round frequent-
    * itemset shape, no self-join of the fact table on orderkey (that
    * plan shuffles lineitem twice and materializes the unfiltered pair
    * stream through a join instead of a combinable aggregate).
    * Output: (part_a, part_b, support), part_a < part_b. */
  def basketPairs(lineitem: DataFrame, minSupport: Long = 2L): DataFrame =
    lineitem.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) >= 2) // single-part orders pair with nothing
      .select(explode(graft.scale.Pairs.unorderedPairs(col("parts"))).as("p"))
      .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)

  /** Association rules ante -> cons over [[basketPairs]] co-occurrence,
    * both directions per surviving pair, with integer-exact confidence:
    * conf_e6 = 1e6 * support(ante, cons) div support(ante) under floor
    * division, so both engines produce the identical BIGINT. The
    * antecedent supports live on the part DIMENSION; the join stays
    * UN-HINTED (the repo's big-join convention): AQE broadcasts it at
    * test scale and shuffles on ante at warehouse scale, where a part
    * dimension in the 10^8 range must not be forced into a broadcast.
    * Output: (ante, cons, support, ante_support, conf_e6). */
  def basketRules(lineitem: DataFrame, minSupport: Long = 2L): DataFrame = {
    val pairSup = basketPairs(lineitem, minSupport)
    val itemSup = lineitem.groupBy(col("l_partkey").as("ante"))
      .agg(countDistinct(col("l_orderkey")).as("ante_support"))
    val directed = pairSup
      .select(col("part_a").as("ante"), col("part_b").as("cons"),
        col("support"))
      .unionByName(pairSup.select(col("part_b").as("ante"),
        col("part_a").as("cons"), col("support")))
    directed.join(itemSup, "ante")
      .select(col("ante"), col("cons"), col("support"), col("ante_support"),
        expr("support * 1000000 div ante_support").as("conf_e6"))
  }

  /** Per-group ordinary least squares y ~ x with integer-exact scaled
    * coefficients: ONE map-side-combinable aggregate collects the five
    * moments per group (n, Σx, Σy, Σxy, Σxx — x and y pre-rounded to
    * integers by the caller-supplied expressions), then
    * slope_e3  = 1000 * (n·Σxy − Σx·Σy) div (n·Σxx − Σx²) and
    * intercept_e3 = (1000·Σy − slope_e3·Σx) div n. Degenerate groups
    * (zero x-variance) return NULL coefficients rather than divide.
    * The cleared products n·Σxy run in DECIMAL intermediates because
    * they overflow int64 near a billion rows per group even when every
    * MOMENT fits; `div` is Spark's integral division (long result,
    * truncation toward zero — DuckDB's `//` on HUGEINT agrees, so both
    * engines produce the identical BIGINT, negative slopes included).
    * The moments themselves must satisfy max|x·y|·rows < 2^63 —
    * intended for measure columns (quantities, cents), not keys.
    * Output: (group, n, sum_x, sum_y, sum_xy, sum_xx, slope_e3,
    * intercept_e3). */
  def groupedLinReg(df: DataFrame, groupCol: String, x: Column,
      y: Column): DataFrame = {
    def d(c: String) = s"CAST($c AS DECIMAL(25,0))"
    val den = s"${d("n")} * sum_xx - ${d("sum_x")} * sum_x"
    df.select(col(groupCol), x.cast("long").as("_x"), y.cast("long").as("_y"))
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum("_x").as("sum_x"), sum("_y").as("sum_y"),
        sum(col("_x") * col("_y")).as("sum_xy"),
        sum(col("_x") * col("_x")).as("sum_xx"))
      .selectExpr(groupCol, "n", "sum_x", "sum_y", "sum_xy", "sum_xx",
        s"CASE WHEN $den <> 0 THEN " +
          s"(1000 * (${d("n")} * sum_xy - ${d("sum_x")} * sum_y)) div ($den) " +
          "END AS slope_e3")
      .selectExpr("*",
        "CASE WHEN slope_e3 IS NOT NULL THEN " +
          s"(1000 * ${d("sum_y")} - slope_e3 * ${d("sum_x")}) div n " +
          "END AS intercept_e3")
  }
}
