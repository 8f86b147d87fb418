package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalReportsSpec extends SparkSpec {
  import spark.implicits._

  test("scd2History: versions collapse runs, chain half-open intervals, flag current") {
    val day = 86400000000L
    val base = 1700000000000000L
    // user 1: A A B A -> 3 versions (run of two As first); user 2: one
    // version. Events 3/4 share a timestamp -> event_id breaks the tie
    // (B@id3 sorts before A@id4).
    val ev = Seq(
      (1L, 1L, base, "A"), (2L, 1L, base + day, "A"),
      (3L, 1L, base + 2 * day, "B"), (4L, 1L, base + 2 * day, "A"),
      (5L, 2L, base, "X"))
      .toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = RelationalReports.scd2History(ev).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1L, 1L, "A", base, 2L, base + 2 * day, false),
      (1L, 2L, "B", base + 2 * day, 1L, base + 2 * day, false),
      (1L, 3L, "A", base + 2 * day, 1L, -1L, true),
      (2L, 1L, "X", base, 1L, -1L, true)), s"got ${got.toSeq}")
  }

  test("statusCounts counts per status") {
    val df = Seq(("O", 1), ("F", 2), ("O", 3)).toDF("o_orderstatus", "x")
    val got = RelationalReports.statusCounts(df).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("F", 1L), ("O", 2L)))
  }

  test("latestOrderPerCustomer picks argmax by (date, orderkey)") {
    val df = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 5.0),
      (1L, 11L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 7.0),
      (1L, 9L,  java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 3.0),
      (2L, 20L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = RelationalReports.latestOrderPerCustomer(df)
      .select("o_custkey", "latest_orderkey").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 9L), (2L, 20L)))
  }

  test("customersWithoutOrders anti-joins against finalized orders only") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    // customer 2 has a finalized order; customer 3 only an open one —
    // the anti join must treat 3 as "no finalized order"
    val ords = Seq((2L, "F"), (3L, "O")).toDF("o_custkey", "o_orderstatus")
    val got = RelationalReports.customersWithoutOrders(cust, ords)
      .select("c_custkey").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L))
  }

  test("segmentConsolidation labels conflicts as mixed") {
    val cust = Seq((1, "AUTO"), (1, "BUILDING"), (2, "AUTO"))
      .toDF("c_nationkey", "c_mktsegment")
    val nat = Seq((1, "ALPHA"), (2, "BETA")).toDF("n_nationkey", "n_name")
    val got = RelationalReports.segmentConsolidation(cust, nat)
      .select("n_name", "segment").as[(String, String)].collect().toMap
    assert(got == Map("ALPHA" -> "mixed", "BETA" -> "AUTO"))
  }

  test("marginRollup emits detail, subtotal and grand-total grains that reconcile") {
    val li = Seq(
      ("A", "F", 100.0, 0.0), ("A", "F", 50.0, 0.1),
      ("A", "O", 10.0, 0.0),
      ("R", "F", 20.0, 0.5),
    ).toDF("l_returnflag", "l_linestatus", "l_extendedprice", "l_discount")
    val got = RelationalReports.marginRollup(li)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // revenue: A/F = 100 + 45 = 145, A/O = 10, R/F = 10
    assert(got == Seq(
      ("A", "F", 0L, 2L, 145.0), ("A", "O", 0L, 1L, 10.0), ("R", "F", 0L, 1L, 10.0),
      ("A", "ALL", 1L, 3L, 155.0), ("R", "ALL", 1L, 1L, 10.0),
      ("ALL", "ALL", 3L, 4L, 165.0)))
    // grand total reconciles with the detail grain
    assert(got.filter(_._3 == 0L).map(_._5).sum == got.find(_._3 == 3L).get._5)
  }

  test("statusPivot fills absent (priority, status) cells with zero") {
    val ords = Seq(
      ("1-URGENT", "F"), ("1-URGENT", "F"), ("1-URGENT", "O"),
      ("5-LOW", "P"),
    ).toDF("o_orderpriority", "o_orderstatus")
    val got = RelationalReports.statusPivot(ords)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("1-URGENT", 2L, 1L, 0L, 3L), ("5-LOW", 0L, 0L, 1L, 1L)))
  }

  test("pricingSummary has the full column contract and plausible values") {
    val got = RelationalReports.pricingSummary(graft.Tables(spark, sf("")).lineitem)
    assert(got.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
      "avg_disc", "count_order"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(4) <= r.getDouble(3))) // disc <= base
  }

  test("ivmMergedRollup: state+delta merge equals a direct full recompute") {
    import spark.implicits._
    import java.sql.Timestamp
    def e(id: Long, day: Int, typ: String, v: Double) =
      (id, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), 1L, typ, v, "{}")
    // 'click' straddles the 2024-01-25 cutoff; 'view' is state-only
    val rows = Seq(
      e(1, 20, "click", 1.5), e(2, 24, "click", -0.25),
      e(3, 25, "click", 2.0), e(4, 26, "click", 0.5),
      e(5, 21, "view", 3.0), e(6, 21, "view", 1.0))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = RelationalReports.ivmMergedRollup(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val c = got("click")
    assert(c.getAs[Long]("n_events") == 4)
    assert(c.getAs[Long]("sum_milli") == 1500 - 250 + 2000 + 500)
    assert(c.getAs[Long]("min_milli") == -250 && c.getAs[Long]("max_milli") == 2000)
    assert(c.getAs[Long]("n_partials") == 4) // 4 distinct (type, day) cells
    val v = got("view")
    assert(v.getAs[Long]("n_events") == 2 && v.getAs[Long]("n_partials") == 1)
    assert(v.getAs[Long]("sum_milli") == 4000)
  }
}
