package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic decision-support shapes over the star schema — the
  * correlated-subquery / multi-way-join family (market share, correlated
  * scalar filters, exists/not-exists, anti-join prospecting) that a
  * warehouse engine must plan well. Spark-first notes:
  *
  *  - q182 and q186 are written as SQL with genuine correlated/scalar
  *    subqueries and left to Catalyst's decorrelation
  *    (RewriteCorrelatedScalarSubquery) — the planned join is the same
  *    one we'd hand-write, and keeping the subquery form exercises the
  *    optimizer path a SQL user hits.
  *  - Exists/not-exists (q183, q184) are expressed as one aggregation
  *    per order / one anti-join — a single shuffle keyed on the fact
  *    key, never a per-row probe.
  *  - Small dimensions (nation, region, part, supplier) are explicit
  *    `broadcast`s; customer/orders joins stay shuffled (they scale with
  *    the fact table) and AQE is free to pick better at runtime.
  *  - Money is exact integer cents (floor(x·100+0.5)) until the final
  *    display division, the module-wide determinism convention.
  *
  * Reference provenance: the reference's report queries are flat scans
  * (src/ingest-pipeline/airflow/dags — the report DAG scripts); this
  * module carries
  * the standard warehouse idioms those reports grow into.
  */
object DecisionSupport extends QueryModule {

  private def cents(c: org.apache.spark.sql.Column) =
    sum(floor(c * 100 + 0.5).cast("long"))

  /** spark.sql analyzes eagerly, so the returned plan no longer resolves
    * views by name — dropping them right away keeps the query functions
    * side-effect-free on session catalog state.
    */
  private def withViewsDropped(spark: SparkSession, views: String*)(df: DataFrame): DataFrame = {
    views.foreach(spark.catalog.dropTempView)
    df
  }

  /** q181: market share — fraction of each region's yearly PROMO revenue
    * supplied by NATION_0 suppliers (TPC-H Q8 shape: 7-table join,
    * conditional share aggregation).
    */
  def marketShare(li: DataFrame, part: DataFrame, supplier: DataFrame,
                  orders: DataFrame, customer: DataFrame, nation: DataFrame,
                  region: DataFrame): DataFrame = {
    val rev = li
      .join(broadcast(part.filter(col("p_type") === "PROMO")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("c_regionkey"))), col("c_nationkey") === col("cn_key"))
      .join(broadcast(region), col("c_regionkey") === col("r_regionkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"), col("r_name"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"),
        (col("supp_nation") === "NATION_0").as("is_target"))
    rev.groupBy("o_year", "r_name")
      .agg(round(sum("cents") / 100.0, 2).as("revenue"),
        round(sum(when(col("is_target"), col("cents")).otherwise(0L)) /
          sum("cents").cast("double"), 4).as("target_share"))
      .orderBy("o_year", "r_name")
  }

  /** q182: small-quantity revenue loss (TPC-H Q17 shape) — lineitems of
    * one brand below 20% of their part's average quantity, as yearly
    * revenue. The correlated scalar subquery is decorrelated by Catalyst
    * into the per-part average join.
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.createOrReplaceTempView("ds_lineitem")
    t.part.createOrReplaceTempView("ds_part")
    withViewsDropped(spark, "ds_lineitem", "ds_part")(spark.sql(
      """SELECT CAST(round(sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 / 7.0, 2)
        |            AS DOUBLE) AS avg_yearly_loss,
        |       count(1) AS n_lines
        |FROM ds_lineitem JOIN ds_part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM ds_lineitem l2
        |                    WHERE l2.l_partkey = ds_lineitem.l_partkey)""".stripMargin))
  }

  /** q183: suppliers who close out orders (TPC-H Q21 shape, adapted to
    * this schema's dates): in orders fed by ≥2 suppliers, the supplier
    * holding the order's strictly-latest ship date. Exists ("some other
    * supplier") and not-exists ("nobody ties the max") collapse into one
    * per-order aggregation — a single shuffle on the order key.
    */
  def closingSuppliers(li: DataFrame, supplier: DataFrame, topN: Int = 10): DataFrame = {
    val perOrder = li.groupBy("l_orderkey").agg(
      countDistinct("l_suppkey").as("n_supps"),
      max("l_shipdate").as("max_ship"))
    val atMax = li.join(perOrder, Seq("l_orderkey"))
      .filter(col("l_shipdate") === col("max_ship") && col("n_supps") >= 2)
      .groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("n_at_max"),
        max("l_suppkey").as("the_supp"))
      .filter(col("n_at_max") === 1)
    atMax.groupBy("the_supp").agg(count(lit(1)).as("n_closed"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("the_supp") === col("s_suppkey"))
      .select(col("s_name"), col("n_closed"))
      .orderBy(col("n_closed").desc, col("s_name")).limit(topN)
  }

  /** q184: dormant high-balance customers (TPC-H Q22 shape): balance
    * above the positive-balance average (scalar subquery) and no order
    * since 1999 (anti-join), rolled up by market segment.
    */
  def dormantHighBalance(customer: DataFrame, orders: DataFrame): DataFrame = {
    val avgPos = customer.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal").as("abar"))
    val recent = orders.filter(col("o_orderdate") >= "1999-01-01")
      .select(col("o_custkey")).distinct()
    customer.crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("abar"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        round(cents(col("c_acctbal")) / 100.0, 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** q185: promo revenue share by month, 1997 (TPC-H Q14 shape) —
    * conditional share with exact-cents numerator and denominator.
    */
  def promoShare(li: DataFrame, part: DataFrame): DataFrame =
    li.filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .select((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("ym"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"),
        (col("p_type") === "PROMO").as("promo"))
      .groupBy("ym")
      .agg(round(sum("cents") / 100.0, 2).as("revenue"),
        round(lit(100.0) * sum(when(col("promo"), col("cents")).otherwise(0L)) /
          sum("cents").cast("double"), 4).as("promo_pct"))
      .orderBy("ym")

  /** q186: top supplier(s) of 1996Q1 (TPC-H Q15 shape) — the revenue
    * view's max selected back by exact integer-cents equality, so ties
    * surface instead of being argmax'd away.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.createOrReplaceTempView("ds_lineitem")
    t.supplier.createOrReplaceTempView("ds_supplier")
    withViewsDropped(spark, "ds_lineitem", "ds_supplier")(spark.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) AS total_cents
        |  FROM ds_lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |       CAST(round(total_cents / 100.0, 2) AS DOUBLE) AS total_revenue
        |FROM ds_supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_cents = (SELECT max(total_cents) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin))
  }

  /** q189: ranked-window analytics pack — the top-3 orders per market
    * segment annotated with their percent_rank / cume_dist / quartile
    * over the WHOLE segment and the price gap to the next order down.
    * Every window shares ONE (segment × price, key) sort: Spark plans a
    * single exchange+sort for all five functions. Ordering includes the
    * order key, so rank values are unique and engine-deterministic even
    * on price ties.
    */
  def segmentWindowPack(orders: DataFrame, customer: DataFrame): DataFrame = {
    val o = orders.join(customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val w = Window.partitionBy("seg").orderBy(col("cents").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("gap_to_next",
        (col("cents") - lead("cents", 1).over(w)).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("seg"), col("rn"), col("o_orderkey"),
        round(col("cents") / 100.0, 2).as("totalprice"),
        col("pr"), col("cd"), col("quartile"), col("gap_to_next"))
      .orderBy("seg", "rn")
  }

  /** q190: GROUPING SETS revenue cube slice — (year × segment), each
    * margin, and the grand total in ONE pass (Spark plans a single
    * Expand + hash aggregate, not four scans), with explicit grouping
    * flags so downstream consumers can tell a real NULL from a subtotal
    * row.
    */
  def revenueGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.createOrReplaceTempView("ds_orders")
    t.customer.createOrReplaceTempView("ds_customer")
    withViewsDropped(spark, "ds_orders", "ds_customer")(spark.sql(
      """SELECT cast(year(o_orderdate) as bigint) AS o_year, c_mktsegment AS seg,
        |       cast(grouping(year(o_orderdate)) as bigint) AS g_year,
        |       cast(grouping(c_mktsegment) as bigint) AS g_seg,
        |       count(1) AS n_orders,
        |       cast(round(sum(floor(o_totalprice * 100 + 0.5)) / 100.0, 2) as double) AS revenue
        |FROM ds_orders JOIN ds_customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((year(o_orderdate), c_mktsegment),
        |                        (year(o_orderdate)), (c_mktsegment), ())
        |ORDER BY g_year, g_seg, o_year, seg""".stripMargin))
  }

  /** q192: unpivot/melt — the q140-pivot inverse: the wide per-flag
    * pricing aggregate melted to (flag, metric, value) long form via
    * `Dataset.unpivot` (Spark's native Expand-based melt, one pass, no
    * per-metric re-scan).
    */
  def pricingUnpivot(li: DataFrame): DataFrame = {
    val wide = li.groupBy(col("l_returnflag").as("flag"))
      .agg(round(cents(col("l_quantity")) / 100.0, 2).as("sum_qty"),
        round(cents(col("l_extendedprice")) / 100.0, 2).as("sum_price"),
        count(lit(1)).cast("double").as("n_lines"))
    wide.unpivot(Array(col("flag")),
        Array(col("sum_qty"), col("sum_price"), col("n_lines")),
        "metric", "value")
      .orderBy("flag", "metric")
  }

  /** q198: share-of-parent hierarchy report — nation revenue with its
    * share of the region and of the grand total, window sums layered
    * over ONE aggregated frame (nations-sized; the percent-of-parent
    * OLAP idiom without re-scanning the fact table per level).
    */
  def shareOfParent(customer: DataFrame, orders: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame = {
    val base = orders.join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(cents(col("o_totalprice")).as("c"), count(lit(1)).as("n_orders"))
    val byRegion = Window.partitionBy("r_name")
    val all = Window.partitionBy()
    base
      .withColumn("rc", sum("c").over(byRegion))
      .withColumn("tc", sum("c").over(all))
      .select(col("r_name"), col("n_name"), col("n_orders"),
        round(col("c") / 100.0, 2).as("revenue"),
        round(col("c") / col("rc").cast("double"), 4).as("pct_of_region"),
        round(col("c") / col("tc").cast("double"), 4).as("pct_of_total"))
      .orderBy("r_name", "n_name")
  }

  /** q202: order-priority check (TPC-H Q4 shape, adapted to this
    * schema's dates): orders in 1996H1 with AT LEAST ONE late shipment
    * (a lineitem shipped >90 days after the order date), counted per
    * priority — the EXISTS collapses to a left-semi join on the order
    * key, never a per-row probe.
    */
  def priorityLateOrders(orders: DataFrame, li: DataFrame): DataFrame = {
    val window = orders
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-07-01")
    val late = li.select(col("l_orderkey"), col("l_shipdate"))
    window.join(late,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > expr("timestampadd(DAY, 90, o_orderdate)"),
        "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")
  }

  /** q203: shipping-priority revenue (TPC-H Q3 shape): top-10 unshipped
    * orders of one segment by in-flight revenue — the classic 3-way
    * fact join cut by TakeOrderedAndProject, never a global sort.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       li: DataFrame, topN: Int = 10): DataFrame =
    customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
      .join(orders.filter(col("o_orderdate") < "1996-03-15")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
        col("c_custkey") === col("o_custkey"))
      .join(li.filter(col("l_shipdate") > "1996-03-15")
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long").as("cents")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum("cents") / 100.0, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(topN)

  /** q204: returned-item losses (TPC-H Q10 shape): top-20 customers by
    * revenue on RETURNED lineitems in 1996Q1-dated orders, with their
    * nation — return-flag revenue attribution for churn triage.
    */
  def returnedItemLosses(customer: DataFrame, orders: DataFrame,
                         li: DataFrame, nation: DataFrame, topN: Int = 20): DataFrame =
    orders.filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      .select("o_orderkey", "o_custkey")
      .join(li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long").as("cents")),
        col("o_orderkey") === col("l_orderkey"))
      .join(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum("cents") / 100.0, 2).as("revenue"),
        round(first("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(topN)

  /** q221: 2-D Pareto SKYLINE — parts minimizing (price, size) jointly:
    * p survives iff no q has q ≤ p on both dimensions and q < p on one.
    * The classic preference query Catalyst has no native operator for,
    * composed from builtins in the shape that scales:
    *
    *  1. PER-PRICE COLLAPSE (hash aggregate): only a price level's
    *     min-size rows can survive, so the corpus reduces to one row
    *     per distinct price before any sort — the 100 TB prune, since
    *     price levels ≪ rows (and a coarser bucket-min broadcast prune
    *     composes in front of it the same way for continuous keys).
    *  2. The running strict-prefix min over the COLLAPSED frame: a
    *     price level survives iff its min size is strictly below every
    *     cheaper level's (RANGE frame ending at -1 excludes price
    *     ties). This is the only sorted step and it runs on distinct
    *     prices, not parts.
    *  3. Rejoin to emit every tied part on surviving (price, size)
    *     cells — equal points don't dominate each other (dominance
    *     requires strict inequality somewhere), so all co-located
    *     optima are kept.
    *
    * Money compares as exact integer cents (the q213 round-then-cast
    * contract); the oracle is the naive NOT EXISTS dominance test, so a
    * green row proves the collapse+window plan loses nothing.
    */
  def skylineParts(part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = part.select(col("p_partkey"),
      floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("cents"),
      col("p_size").cast("long").as("size"))
    val perPrice = pts.groupBy("cents").agg(min("size").as("min_size"))
    val wStrict = Window.orderBy("cents").rangeBetween(Window.unboundedPreceding, -1)
    val surviving = perPrice
      .withColumn("cheaper_min", min("min_size").over(wStrict))
      .filter(col("cheaper_min").isNull || col("min_size") < col("cheaper_min"))
      .select(col("cents"), col("min_size").as("size"))
    pts.join(surviving, Seq("cents", "size"))
      .select(col("p_partkey"), col("cents"), col("size"))
      .orderBy("cents", "size", "p_partkey")
  }

  /** q234: local-supplier volume (TPC-H Q5 shape): revenue per nation
    * from 1996-dated orders where the CUSTOMER and the LINE's SUPPLIER
    * sit in the same ASIA nation. The nation equality is enforced by
    * joining both sides to the SAME broadcast nation dim — the fact path
    * is two shuffles (orders⋈customer, ⋈lineitem), dims all broadcast.
    */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame, li: DataFrame,
                          supplier: DataFrame, nation: DataFrame,
                          region: DataFrame): DataFrame = {
    val asiaNations = nation.join(
      broadcast(region.filter(col("r_name") === "ASIA").select("r_regionkey")),
      col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    orders.filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      .select("o_orderkey", "o_custkey")
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .join(li.select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long").as("cents")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name").agg(round(sum("cents") / 100.0, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q235: volume shipping between two nations (TPC-H Q7 shape):
    * supplier-nation → customer-nation revenue per ship year for the
    * NATION_0..3 cohort, all ordered pairs.
    */
  def nationVolumeShipping(customer: DataFrame, orders: DataFrame, li: DataFrame,
                           supplier: DataFrame, nation: DataFrame): DataFrame = {
    val pair = Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3")
    val dim = nation.filter(col("n_name").isin(pair: _*))
      .select("n_nationkey", "n_name")
    li.filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("ship_year"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(dim.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(dim.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "ship_year")
      .agg(round(sum("cents") / 100.0, 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** q236: priority line counts (TPC-H Q12 shape): per return flag, how
    * many 1996-shipped lines belong to HIGH-priority vs other orders —
    * the conditional CASE-sum pair over one join.
    */
  def priorityLineCounts(orders: DataFrame, li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .select("l_orderkey", "l_returnflag")
      .join(orders.select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_returnflag")

  /** q237: customer order-count distribution (TPC-H Q13 shape): LEFT
    * join customers to their non-5-LOW orders, count per customer
    * (customers with none count 0), histogram the counts. The classic
    * two-level aggregation — each level shuffles on a key that shrinks.
    */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select("c_custkey")
      .join(orders.filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** q238: large-volume customers (TPC-H Q18 shape): orders whose total
    * quantity exceeds `minQty`, with their customer. The HAVING frame
    * aggregates on l_orderkey and joins back to orders — one shuffle on
    * the order key, no correlated per-row probe.
    */
  def largeVolumeCustomers(customer: DataFrame, orders: DataFrame,
                           li: DataFrame, minQty: Long = 150L, topN: Int = 20): DataFrame = {
    val big = li.groupBy("l_orderkey")
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 2).as("totalprice"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(topN)
  }

  /** q239: bracketed disjunctive revenue (TPC-H Q19 shape): three
    * brand/size/quantity brackets OR-ed into one predicate — the
    * disjunction evaluates inside the broadcast-joined scan, and the
    * quantity bound common to all brackets pushes down to the lineitem
    * parquet scan.
    */
  def bracketRevenue(li: DataFrame, part: DataFrame): DataFrame =
    li.select(col("l_partkey"), col("l_quantity"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 25) &&
          col("l_quantity").between(5, 20)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(1, 40) &&
          col("l_quantity").between(10, 30)))
      .agg(round(sum("cents") / 100.0, 2).as("revenue"))

  /** q260: minimum-cost supplier (TPC-H Q2 shape, adapted — this schema
    * has no partsupp, so the offer book is derived from observed trade:
    * a (part, supplier) pair's unit cost is the MINIMUM per-unit price
    * across its lineitems). For LARGE-type parts, the EUROPE suppliers
    * matching the part's minimum cost — selected back by exact
    * integer-cents equality so ties surface (the q186 convention), with
    * the oracle keeping Q2's correlated `= (SELECT min ...)` form to
    * certify Catalyst's decorrelation of the same plan.
    *
    * Scale: offers aggregate shuffles on (part, supp) — the pair space,
    * already far below the fact table; everything after runs on the
    * offer frame. Dims (part, supplier⋈nation⋈region) broadcast.
    */
  def minCostSupplier(li: DataFrame, part: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame = {
    val offers = li
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(floor(col("l_extendedprice") / col("l_quantity") * 100 + 0.5)
        .cast("long")).as("unit_cents"))
    val europeSupp = supplier
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "EUROPE").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val qualified = offers
      .join(broadcast(part.filter(col("p_type") === "LARGE")
        .select("p_partkey", "p_name")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(europeSupp), col("l_suppkey") === col("s_suppkey"))
    val best = qualified.groupBy(col("p_partkey").as("bp_key"))
      .agg(min("unit_cents").as("best_cents"))
    qualified.join(best, col("p_partkey") === col("bp_key") &&
        col("unit_cents") === col("best_cents"))
      .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_name"),
        round(col("unit_cents") / 100.0, 2).as("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  /** q261: important stock (TPC-H Q11 shape, adapted): per-part traded
    * value via EUROPE suppliers, kept when the part exceeds 1/2000 of
    * the cohort total. The global scalar is a one-row broadcast; the
    * threshold compares by integer CROSS-MULTIPLICATION in decimal(38,0)
    * (part·2000 > total·1) — no float fraction, and no int64 overflow at
    * corpus scale (the q199 widening convention: Spark decimal(38,0) ↔
    * DuckDB HUGEINT).
    */
  def importantStock(li: DataFrame, supplier: DataFrame, nation: DataFrame,
                     region: DataFrame): DataFrame = {
    val europeSuppKeys = supplier
      .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "EUROPE").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val value = li
      .join(broadcast(europeSuppKeys), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("part_cents"))
    val total = value.agg(sum("part_cents").as("total_cents"))
    value.crossJoin(broadcast(total))
      .filter(col("part_cents").cast("decimal(38,0)") * 2000 >
        col("total_cents").cast("decimal(38,0)"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("part_cents") / 100.0, 2).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** q262: product-type profit (TPC-H Q9 shape, adapted): yearly profit
    * per supplier nation on widget-named parts, where line profit =
    * revenue − 60%-of-retail unit cost (the schema's stand-in for
    * ps_supplycost). Cost quantizes to cents BEFORE the subtraction so
    * both engines sum identical integers. Fact path: one shuffle
    * (lineitem⋈orders on the order key); part/supplier/nation broadcast.
    */
  def nationProfit(li: DataFrame, part: DataFrame, supplier: DataFrame,
                   nation: DataFrame, orders: DataFrame): DataFrame =
    li.join(broadcast(part.filter(col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"),
        (floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5) -
          floor(col("p_retailprice") * col("l_quantity") * 60 + 0.5))
          .cast("long").as("profit_cents"))
      .groupBy("n_name", "o_year")
      .agg(round(sum("profit_cents") / 100.0, 2).as("profit"))
      .orderBy(col("n_name"), col("o_year").desc)

  /** q263: parts/supplier relationship count (TPC-H Q16 shape, adapted):
    * distinct supplier count per (brand, type, size) over observed
    * (part, supplier) trade pairs, for a size cohort excluding one brand
    * and one type — and excluding negative-balance suppliers via NOT IN,
    * which Catalyst must plan as a null-aware anti join (here a
    * broadcast one: the exclusion list is supplier-sized).
    */
  def partSupplierCounts(li: DataFrame, part: DataFrame,
                         supplier: DataFrame): DataFrame = {
    val pairs = li.select("l_partkey", "l_suppkey").distinct()
    val badSupp = supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val dims = part.filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
    pairs
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(dims), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** q264: dominant part suppliers (TPC-H Q20 shape, adapted): EUROPE
    * suppliers that shipped MORE THAN HALF of some bolt-named part's
    * total 1996 volume, with how many parts each dominates. Q20's
    * correlated `> 0.5 * (SELECT sum ...)` is the per-part total joined
    * back to the (part, supplier) aggregate; the half threshold compares
    * as 2·supp > total in integers. The oracle keeps the correlated
    * form. Quantities quantize via floor(q + 0.5) — the q238 convention.
    */
  def dominantSuppliers(li: DataFrame, part: DataFrame, supplier: DataFrame,
                        nation: DataFrame, region: DataFrame): DataFrame = {
    val f = li.filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .join(broadcast(part.filter(col("p_name").contains("bolt")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("l_suppkey"),
        floor(col("l_quantity") + 0.5).cast("long").as("qty"))
    val perSupp = f.groupBy("p_partkey", "l_suppkey").agg(sum("qty").as("supp_qty"))
    val perPart = f.groupBy(col("p_partkey").as("tp_key")).agg(sum("qty").as("part_qty"))
    val dominant = perSupp.join(perPart, col("p_partkey") === col("tp_key"))
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_parts_dominated"))
    dominant
      .join(broadcast(supplier
        .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region.filter(col("r_name") === "EUROPE").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("n_name"), col("n_parts_dominated"))
      .orderBy("s_name")
  }

  /** q268: forecasting revenue change (TPC-H Q6 shape — the last of the
    * 22 classic shapes, completing the set): revenue that would have been
    * gained by eliminating small discounts on moderate-quantity lines in
    * one shipping year. The one-scalar answer is the canonical
    * scan-dominated query: a single filtered map-side aggregate, zero
    * joins, zero shuffles past the final 1-row reduce — at 100 TB its
    * cost IS the scan, so the plan asserts pushed filters keep the scan
    * minimal. Discounts quantize to integer percent BEFORE the range
    * test (float 0.07 literals never touch the comparison), and revenue
    * sums as exact integer l_extendedprice·pct cents.
    */
  def forecastRevenueChange(li: DataFrame): DataFrame =
    li.select(col("l_shipdate"), col("l_quantity"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("disc_pct"),
        col("l_extendedprice"))
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        col("disc_pct").between(5, 7) && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * col("disc_pct") * 100 + 0.5).cast("long")).as("rev_c"))
      .select(col("n_lines"),
        round(col("rev_c") / 10000.0, 2).as("revenue"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q268_forecast_revenue" -> ((s, d) => forecastRevenueChange(Tables(s, d).lineitem)),
    "q260_min_cost_supplier" -> ((s, d) => { val t = Tables(s, d)
      minCostSupplier(t.lineitem, t.part, t.supplier, t.nation, t.region) }),
    "q261_important_stock" -> ((s, d) => { val t = Tables(s, d)
      importantStock(t.lineitem, t.supplier, t.nation, t.region) }),
    "q262_nation_profit" -> ((s, d) => { val t = Tables(s, d)
      nationProfit(t.lineitem, t.part, t.supplier, t.nation, t.orders) }),
    "q263_part_supplier_counts" -> ((s, d) => { val t = Tables(s, d)
      partSupplierCounts(t.lineitem, t.part, t.supplier) }),
    "q264_dominant_suppliers" -> ((s, d) => { val t = Tables(s, d)
      dominantSuppliers(t.lineitem, t.part, t.supplier, t.nation, t.region) }),
    "q234_local_supplier_volume" -> ((s, d) => { val t = Tables(s, d)
      localSupplierVolume(t.customer, t.orders, t.lineitem, t.supplier, t.nation, t.region) }),
    "q235_nation_volume" -> ((s, d) => { val t = Tables(s, d)
      nationVolumeShipping(t.customer, t.orders, t.lineitem, t.supplier, t.nation) }),
    "q236_priority_lines" -> ((s, d) => { val t = Tables(s, d)
      priorityLineCounts(t.orders, t.lineitem) }),
    "q237_order_distribution" -> ((s, d) => { val t = Tables(s, d)
      customerOrderDistribution(t.customer, t.orders) }),
    "q238_large_volume" -> ((s, d) => { val t = Tables(s, d)
      largeVolumeCustomers(t.customer, t.orders, t.lineitem) }),
    "q239_bracket_revenue" -> ((s, d) => { val t = Tables(s, d)
      bracketRevenue(t.lineitem, t.part) }),
    "q221_skyline" -> ((s, d) => skylineParts(Tables(s, d).part)),
    "q181_market_share" -> ((s, d) => { val t = Tables(s, d)
      marketShare(t.lineitem, t.part, t.supplier, t.orders, t.customer, t.nation, t.region) }),
    "q182_small_qty_revenue" -> ((s, d) => smallQtyRevenue(s, d)),
    "q183_closing_suppliers" -> ((s, d) => { val t = Tables(s, d)
      closingSuppliers(t.lineitem, t.supplier) }),
    "q184_dormant_balance" -> ((s, d) => { val t = Tables(s, d)
      dormantHighBalance(t.customer, t.orders) }),
    "q185_promo_share" -> ((s, d) => { val t = Tables(s, d)
      promoShare(t.lineitem, t.part) }),
    "q186_top_supplier" -> ((s, d) => topSupplier(s, d)),
    "q189_window_pack" -> ((s, d) => { val t = Tables(s, d)
      segmentWindowPack(t.orders, t.customer) }),
    "q190_grouping_sets" -> ((s, d) => revenueGroupingSets(s, d)),
    "q192_unpivot" -> ((s, d) => pricingUnpivot(Tables(s, d).lineitem)),
    "q198_share_of_parent" -> ((s, d) => { val t = Tables(s, d)
      shareOfParent(t.customer, t.orders, t.nation, t.region) }),
    "q202_priority_late" -> ((s, d) => { val t = Tables(s, d)
      priorityLateOrders(t.orders, t.lineitem) }),
    "q203_shipping_priority" -> ((s, d) => { val t = Tables(s, d)
      shippingPriority(t.customer, t.orders, t.lineitem) }),
    "q204_returned_losses" -> ((s, d) => { val t = Tables(s, d)
      returnedItemLosses(t.customer, t.orders, t.lineitem, t.nation) }),
  )

  override def oracles: Map[String, String] = Map(
    "q268_forecast_revenue" ->
      """SELECT count(*) AS n_lines,
        |       CAST(round(sum(CAST(floor(l_extendedprice
        |                  * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
        |                  * 100 + 0.5) AS BIGINT)) / 10000.0, 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    // keeps Q2's correlated `= (SELECT min ...)` form on purpose: a green
    // row certifies Catalyst's decorrelation plans the same answer
    "q260_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |         min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)) AS unit_cents
        |  FROM lineitem WHERE l_quantity > 0
        |  GROUP BY l_partkey, l_suppkey),
        |es AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |       FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey
        |       WHERE r_name = 'EUROPE'),
        |q AS (SELECT o.unit_cents, p.p_partkey, p.p_name, es.s_name, es.s_acctbal, es.n_name
        |      FROM offers o JOIN part p ON o.l_partkey = p.p_partkey
        |      JOIN es ON o.l_suppkey = es.s_suppkey
        |      WHERE p.p_type = 'LARGE')
        |SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
        |       CAST(round(unit_cents / 100.0, 2) AS DOUBLE) AS unit_cost
        |FROM q
        |WHERE unit_cents = (SELECT min(q2.unit_cents) FROM q q2
        |                    WHERE q2.p_partkey = q.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,
    "q261_important_stock" ->
      """WITH es AS (SELECT s_suppkey FROM supplier
        |            JOIN nation ON s_nationkey = n_nationkey
        |            JOIN region ON n_regionkey = r_regionkey
        |            WHERE r_name = 'EUROPE'),
        |v AS (SELECT l_partkey,
        |             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS part_cents
        |      FROM lineitem JOIN es ON l_suppkey = es.s_suppkey
        |      GROUP BY l_partkey)
        |SELECT l_partkey AS p_partkey,
        |       CAST(round(part_cents / 100.0, 2) AS DOUBLE) AS part_value
        |FROM v
        |WHERE part_cents::HUGEINT * 2000 > (SELECT sum(part_cents)::HUGEINT FROM v)
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "q262_nation_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
        |                    - CAST(floor(p_retailprice * l_quantity * 60 + 0.5) AS BIGINT))
        |                  / 100.0, 2) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY n_name, o_year
        |ORDER BY n_name, o_year DESC""".stripMargin,
    "q263_part_supplier_counts" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // keeps Q20's correlated `> half of (SELECT sum ...)` form on purpose
    "q264_dominant_suppliers" ->
      """WITH f AS (SELECT p_partkey, l_suppkey,
        |                  CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
        |           FROM lineitem JOIN part ON l_partkey = p_partkey
        |           WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |             AND p_name LIKE '%bolt%'),
        |ps AS (SELECT p_partkey, l_suppkey, sum(qty) AS supp_qty
        |       FROM f GROUP BY p_partkey, l_suppkey),
        |dom AS (SELECT l_suppkey, count(*) AS n_parts_dominated
        |        FROM ps
        |        WHERE supp_qty * 2 > (SELECT sum(f2.qty) FROM f f2
        |                              WHERE f2.p_partkey = ps.p_partkey)
        |        GROUP BY l_suppkey)
        |SELECT s_name, n_name, n_parts_dominated
        |FROM dom JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |ORDER BY s_name""".stripMargin,
    // naive quadratic dominance test on purpose: certifies the
    // collapse+window plan loses no skyline point
    "q221_skyline" ->
      """WITH pts AS (SELECT p_partkey, floor(p_retailprice * 100 + 0.5)::BIGINT AS cents,
        |                    p_size::BIGINT AS size FROM part)
        |SELECT p.p_partkey, p.cents, p.size
        |FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.cents <= p.cents AND q.size <= p.size
        |    AND (q.cents < p.cents OR q.size < p.size))
        |ORDER BY p.cents, p.size, p.p_partkey""".stripMargin,
    "q181_market_share" ->
      """SELECT year(o_orderdate) AS o_year, r_name,
        |       round(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 2) AS revenue,
        |       round(sum(CASE WHEN n1.n_name = 'NATION_0'
        |                      THEN floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |                      ELSE 0 END)
        |             / CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) AS DOUBLE),
        |             4) AS target_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q182_small_qty_revenue" ->
      """SELECT round(sum(floor(l_extendedprice * 100 + 0.5)) / 100.0 / 7.0, 2) AS avg_yearly_loss,
        |       count(*)::BIGINT AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q183_closing_suppliers" ->
      """WITH per_order AS (
        |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supps,
        |         max(l_shipdate) AS max_ship
        |  FROM lineitem GROUP BY l_orderkey),
        |at_max AS (
        |  SELECT l.l_orderkey, count(DISTINCT l.l_suppkey) AS n_at_max,
        |         max(l.l_suppkey) AS the_supp
        |  FROM lineitem l JOIN per_order p
        |    ON l.l_orderkey = p.l_orderkey AND l.l_shipdate = p.max_ship
        |  WHERE p.n_supps >= 2
        |  GROUP BY l.l_orderkey HAVING count(DISTINCT l.l_suppkey) = 1)
        |SELECT s_name, count(*)::BIGINT AS n_closed
        |FROM at_max JOIN supplier ON the_supp = s_suppkey
        |GROUP BY s_name ORDER BY n_closed DESC, s_name LIMIT 10""".stripMargin,
    "q184_dormant_balance" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n_custs,
        |       round(sum(floor(c_acctbal * 100 + 0.5)) / 100.0, 2) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= DATE '1999-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q185_promo_share" ->
      """SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
        |       round(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 2) AS revenue,
        |       round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |                              THEN floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |                              ELSE 0 END)
        |             / CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) AS DOUBLE),
        |             4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q186_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(total_cents / 100.0, 2) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_cents = (SELECT max(total_cents) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q189_window_pack" ->
      """WITH o AS (
        |  SELECT c_mktsegment AS seg, o_orderkey,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |w AS (
        |  SELECT seg, o_orderkey, cents,
        |         row_number()   OVER win AS rn,
        |         round(percent_rank() OVER win, 6) AS pr,
        |         round(cume_dist()    OVER win, 6) AS cd,
        |         ntile(4)       OVER win AS quartile,
        |         cents - lead(cents, 1) OVER win AS gap_to_next
        |  FROM o WINDOW win AS (PARTITION BY seg ORDER BY cents DESC, o_orderkey))
        |SELECT seg, rn::BIGINT AS rn, o_orderkey,
        |       round(cents / 100.0, 2) AS totalprice,
        |       pr, cd, quartile::BIGINT AS quartile, gap_to_next::BIGINT AS gap_to_next
        |FROM w WHERE rn <= 3 ORDER BY seg, rn""".stripMargin,
    "q190_grouping_sets" ->
      """SELECT year(o_orderdate) AS o_year, c_mktsegment AS seg,
        |       CAST(grouping(year(o_orderdate)) AS BIGINT) AS g_year,
        |       CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
        |       count(*)::BIGINT AS n_orders,
        |       round(sum(floor(o_totalprice * 100 + 0.5)) / 100.0, 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((year(o_orderdate), c_mktsegment),
        |                        (year(o_orderdate)), (c_mktsegment), ())
        |ORDER BY g_year, g_seg, o_year, seg""".stripMargin,
    "q192_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(sum(floor(l_quantity * 100 + 0.5)) / 100.0, 2) AS DOUBLE) AS sum_qty,
        |         CAST(round(sum(floor(l_extendedprice * 100 + 0.5)) / 100.0, 2) AS DOUBLE) AS sum_price,
        |         CAST(count(*) AS DOUBLE) AS n_lines
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT flag, metric, CAST(value AS DOUBLE) AS value
        |FROM (UNPIVOT wide ON sum_qty, sum_price, n_lines INTO NAME metric VALUE value)
        |ORDER BY flag, metric""".stripMargin,
    "q198_share_of_parent" ->
      """WITH base AS (
        |  SELECT r_name, n_name,
        |         sum(floor(o_totalprice * 100 + 0.5))::BIGINT AS c,
        |         count(*)::BIGINT AS n_orders
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |w AS (SELECT r_name, n_name, n_orders, c,
        |             sum(c) OVER (PARTITION BY r_name)::BIGINT AS rc,
        |             sum(c) OVER ()::BIGINT AS tc
        |      FROM base)
        |SELECT r_name, n_name, n_orders,
        |       round(c / 100.0, 2) AS revenue,
        |       round(c / CAST(rc AS DOUBLE), 4) AS pct_of_region,
        |       round(c / CAST(tc AS DOUBLE), 4) AS pct_of_total
        |FROM w ORDER BY r_name, n_name""".stripMargin,
    "q202_priority_late" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_late_orders
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q234_local_supplier_volume" ->
      """SELECT n_name,
        |       round(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q235_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       year(l_shipdate)::INT AS ship_year,
        |       round(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey AND sn.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey AND cn.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND sn.n_name <> cn.n_name
        |GROUP BY sn.n_name, cn.n_name, ship_year
        |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,
    "q236_priority_lines" ->
      """SELECT l_returnflag,
        |       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q237_order_distribution" ->
      """SELECT c_count, count(*)::BIGINT AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q238_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(floor(l_quantity + 0.5)::BIGINT)::BIGINT AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |       round(o_totalprice, 2) AS totalprice, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "q239_bracket_revenue" ->
      """SELECT round(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 5 AND 20)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 10 AND 30)""".stripMargin,
    "q203_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |       round(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1996-03-15' AND l_shipdate > DATE '1996-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q204_returned_losses" ->
      """SELECT c_custkey, c_name, n_name,
        |       round(sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 2) AS revenue,
        |       round(any_value(c_acctbal), 2) AS acctbal
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
  )
}
