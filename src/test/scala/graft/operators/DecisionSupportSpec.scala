package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import java.sql.Timestamp

class DecisionSupportSpec extends SparkSpec {
  import spark.implicits._

  private def planText(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def t = Tables(spark, sf(""))

  test("q182 correlated scalar subquery is decorrelated into a join (no per-row subquery)") {
    val df = DecisionSupport.smallQtyRevenue(spark, sf(""))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"),
      s"correlated subquery survived optimization:\n$optimized")
    val p = planText(df)
    assert(p.contains("partial_avg") || p.contains("avg("),
      s"expected decorrelated per-part average aggregate:\n$p")
  }

  test("q184 plans the no-recent-orders check as an anti-join") {
    val p = planText(DecisionSupport.dormantHighBalance(t.customer, t.orders))
    assert(p.contains("LeftAnti"), s"expected anti-join:\n$p")
  }

  test("q181 broadcasts every dimension (no shuffle for nation/region/part/supplier)") {
    val p = planText(DecisionSupport.marketShare(
      t.lineitem, t.part, t.supplier, t.orders, t.customer, t.nation, t.region))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("q183 closing supplier: hand-built multi-supplier order") {
    // order 1: suppliers 10 (ships Jan 5) and 20 (ships Jan 9, unique max) → 20 closes
    // order 2: single supplier → excluded; order 3: tied max date → excluded
    val li = Seq(
      (1L, 10L, Timestamp.valueOf("2024-01-05 00:00:00")),
      (1L, 20L, Timestamp.valueOf("2024-01-09 00:00:00")),
      (2L, 10L, Timestamp.valueOf("2024-01-07 00:00:00")),
      (3L, 10L, Timestamp.valueOf("2024-01-08 00:00:00")),
      (3L, 30L, Timestamp.valueOf("2024-01-08 00:00:00")),
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((10L, "S10"), (20L, "S20"), (30L, "S30"))
      .toDF("s_suppkey", "s_name")
    val r = DecisionSupport.closingSuppliers(li, supp).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "S20" && r(0).getLong(1) == 1L)
  }

  test("q185 promo share: exact-cents share on a two-line toy") {
    val li = Seq(
      (1L, 100L, 10.00, 0.0, Timestamp.valueOf("1997-03-10 00:00:00")),
      (2L, 200L, 30.00, 0.0, Timestamp.valueOf("1997-03-20 00:00:00")),
    ).toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
    val part = Seq((100L, "PROMO"), (200L, "STANDARD")).toDF("p_partkey", "p_type")
    val r = DecisionSupport.promoShare(li, part).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 199703L)
    assert(r(0).getDouble(1) == 40.0)
    assert(r(0).getDouble(2) == 25.0) // 10 of 40 is promo
  }

  test("q189 window pack: hand-computed ranks on one segment") {
    val orders = Seq(
      (1L, 10L, 40.00), (2L, 10L, 30.00), (3L, 10L, 20.00), (4L, 10L, 10.00),
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val cust = Seq((10L, "SEG")).toDF("c_custkey", "c_mktsegment")
    val r = DecisionSupport.segmentWindowPack(orders, cust).collect()
    assert(r.length == 3)
    val top = r(0)
    assert(top.getAs[Long]("rn") == 1L && top.getAs[Double]("totalprice") == 40.0)
    assert(top.getAs[Double]("pr") == 0.0)      // percent_rank of the top row
    assert(top.getAs[Double]("cd") == 0.25)     // 1 of 4
    assert(top.getAs[Long]("quartile") == 1L)
    assert(top.getAs[Long]("gap_to_next") == 1000L) // 40.00 → 30.00 in cents
  }

  test("q190 grouping sets emits cell, both margins, and grand total in one pass") {
    val df = DecisionSupport.revenueGroupingSets(spark, sf(""))
    val rows = df.collect()
    val byFlags = rows.groupBy(r => (r.getAs[Long]("g_year"), r.getAs[Long]("g_seg")))
    assert(byFlags.keySet == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    assert(byFlags((1L, 1L)).length == 1) // single grand-total row
    // grand total equals the sum of the year margin
    val grand = byFlags((1L, 1L))(0).getAs[Long]("n_orders")
    assert(byFlags((0L, 1L)).map(_.getAs[Long]("n_orders")).sum == grand)
    // one Expand pass, not a union of four aggregates
    assert(df.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("q192 unpivot melts each flag row into one row per metric via one Expand") {
    val df = DecisionSupport.pricingUnpivot(t.lineitem)
    val rows = df.collect()
    val flags = rows.map(_.getString(0)).distinct
    assert(rows.length == flags.length * 3)
    assert(rows.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("n_lines", "sum_price", "sum_qty"))
    assert(df.queryExecution.executedPlan.toString.contains("Expand"))
    // melt preserves values: n_lines metric sums to the table row count
    val n = rows.filter(_.getString(1) == "n_lines").map(_.getDouble(2)).sum
    assert(n == t.lineitem.count().toDouble)
  }

  test("q198 share-of-parent: region shares sum to 1, totals to 1 overall") {
    val r = DecisionSupport.shareOfParent(t.customer, t.orders, t.nation, t.region)
      .collect()
    val byRegion = r.groupBy(_.getString(0))
    byRegion.values.foreach { rows =>
      val s = rows.map(_.getAs[Double]("pct_of_region")).sum
      assert(math.abs(s - 1.0) < 0.01, s"region shares sum to $s")
    }
    val tot = r.map(_.getAs[Double]("pct_of_total")).sum
    assert(math.abs(tot - 1.0) < 0.01, s"total shares sum to $tot")
  }

  test("q202 plans the EXISTS as a semi-join; q203 top-k as TakeOrderedAndProject") {
    val p202 = planText(DecisionSupport.priorityLateOrders(t.orders, t.lineitem))
    assert(p202.contains("LeftSemi"), s"expected semi-join:\n$p202")
    val p203 = planText(DecisionSupport.shippingPriority(t.customer, t.orders, t.lineitem))
    assert(p203.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p203")
  }

  test("q202 late-order semantics: only >90-day shipments count, one hit is enough") {
    val orders = Seq(
      (1L, Timestamp.valueOf("1996-02-01 00:00:00"), "1-URGENT"),
      (2L, Timestamp.valueOf("1996-02-01 00:00:00"), "1-URGENT"),
      (3L, Timestamp.valueOf("1995-01-01 00:00:00"), "1-URGENT"), // outside window
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, Timestamp.valueOf("1996-06-01 00:00:00")), // 121 days late
      (1L, Timestamp.valueOf("1996-07-01 00:00:00")), // second late line, same order
      (2L, Timestamp.valueOf("1996-03-01 00:00:00")), // on time
      (3L, Timestamp.valueOf("1996-06-01 00:00:00")),
    ).toDF("l_orderkey", "l_shipdate")
    val r = DecisionSupport.priorityLateOrders(orders, li).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "1-URGENT" && r(0).getLong(1) == 1L)
  }

  test("q186 surfaces revenue ties instead of dropping them") {
    val r = DecisionSupport.topSupplier(spark, sf("")).collect()
    assert(r.nonEmpty)
    val revs = r.map(_.getDouble(2)).toSet
    assert(revs.size == 1, "all returned suppliers must share the max revenue")
  }

  test("skylineParts: hand-built frontier with ties and duplicate points") {
    // (price, size): (1.00,5) on frontier; (1.00,7) same-price dominated;
    // (2.00,3) frontier; (2.00,3) duplicate BOTH kept; (3.00,3) dominated
    // by (2.00,3); (4.00,1) frontier; (5.00,2) dominated by (4.00,1).
    val part = Seq(
      (1L, 1.00, 5), (2L, 1.00, 7), (3L, 2.00, 3), (4L, 2.00, 3),
      (5L, 3.00, 3), (6L, 4.00, 1), (7L, 5.00, 2))
      .toDF("p_partkey", "p_retailprice", "p_size")
    val got = DecisionSupport.skylineParts(part).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 100L, 5L), (3L, 200L, 3L), (4L, 200L, 3L), (6L, 400L, 1L)))
  }

  test("skylineParts equals the naive dominance filter on real parts") {
    val part = graft.Tables(spark, sf("")).part
    val got = DecisionSupport.skylineParts(part).as[(Long, Long, Long)].collect().toSet
    val pts = part.select($"p_partkey",
        org.apache.spark.sql.functions.floor($"p_retailprice" * 100 + 0.5).cast("long"),
        $"p_size".cast("long"))
      .as[(Long, Long, Long)].collect()
    val naive = pts.filter { p => !pts.exists(q =>
      q._2 <= p._2 && q._3 <= p._3 && (q._2 < p._2 || q._3 < p._3)) }.toSet
    assert(got == naive && naive.nonEmpty)
  }

  test("forecastRevenueChange (Q6): only in-window moderate lines count, exact cents") {
    import spark.implicits._
    val li = Seq(
      // kept: 1996 shipdate, 6% discount, qty < 24 → 100.00·0.06 = 6.00
      ("1996-06-01", 10.0, 0.06, 100.0),
      // kept: boundary discounts 5% and 7%
      ("1996-01-01", 23.0, 0.05, 200.0),  // 10.00
      ("1996-12-31", 1.0, 0.07, 50.0),    // 3.50
      // excluded: discount out of band / qty too big / wrong year
      ("1996-06-01", 10.0, 0.04, 100.0),
      ("1996-06-01", 24.0, 0.06, 100.0),
      ("1997-01-01", 10.0, 0.06, 100.0),
    ).toDF("d", "l_quantity", "l_discount", "l_extendedprice")
      .selectExpr("cast(d as timestamp) as l_shipdate",
        "l_quantity", "l_discount", "l_extendedprice")
    val r = DecisionSupport.forecastRevenueChange(li).collect()(0)
    assert(r.getAs[Long]("n_lines") == 3)
    assert(r.getAs[Double]("revenue") == 19.50)
  }
}
