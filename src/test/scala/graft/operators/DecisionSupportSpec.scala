package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
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

  test("q186 surfaces revenue ties instead of dropping them") {
    val r = DecisionSupport.topSupplier(spark, sf("")).collect()
    assert(r.nonEmpty)
    val revs = r.map(_.getDouble(2)).toSet
    assert(revs.size == 1, "all returned suppliers must share the max revenue")
  }
}
