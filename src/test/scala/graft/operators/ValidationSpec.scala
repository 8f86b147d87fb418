package graft.operators

import graft.SparkSpec

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("documentConstraints counts each violation class") {
    val docs = Seq(
      (1L, "good", "en", 4L),
      (2L, "", "en", 0L),          // empty text
      (3L, "bad len", "fr", 99L),  // len mismatch
      (4L, "bad lang", "xx", 8L),  // bad lang
    ).toDF("doc_id", "text", "lang", "n_chars")
    val r = Validation.documentConstraints(docs).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L, 4L)))
  }

  test("jsonPropsHistogram parses and buckets") {
    val ev = Seq((1L, """{"k": 12}"""), (2L, """{"k": 2}"""), (3L, """{"k": 7}"""))
      .toDF("event_id", "props")
    val got = Validation.jsonPropsHistogram(ev)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 7L -> 1L))
  }

  test("toleranceConsistency flags relative mismatches") {
    val orders = Seq((1L, 100.0), (2L, 500.0)).toDF("o_orderkey", "o_totalprice")
    val li = Seq(
      (1L, 100.0, 0.0, 0.0),  // matches exactly
      (2L, 100.0, 0.0, 0.0),  // 100 vs 500 → off
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val got = Validation.toleranceConsistency(orders, li)
      .select("close_enough", "n_orders").as[(Boolean, Long)].collect().toMap
    assert(got == Map(false -> 1L, true -> 1L))
  }

  test("tableProfile: nulls, exact distincts, and uniqueness per column of any schema") {
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, None, 10),
      (3L, Some("a"), 20),
    ).toDF("id", "name", "grp")
    val got = Validation.tableProfile(df)
      .as[(String, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 3L, 0L, 3L, true)))
    // countDistinct ignores the null; two distinct non-null groups? no — one
    assert(got("name") == (("name", 3L, 1L, 1L, false)))
    assert(got("grp") == (("grp", 3L, 0L, 2L, false)))
  }

  test("expectationSuite: dirty fixture fails exactly the violated constraints") {
    val dirty = Seq(
      (1L, 10L, "O", 5.0),
      (1L, 11L, "F", 3.0),                           // duplicate key
      (2L, 12L, null.asInstanceOf[String], 4.0),     // null status (also out of domain)
      (3L, 13L, "X", -1.0))                          // bad domain, non-positive price
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val got = Validation.expectationSuite(dirty).collect()
      .map(r => r.getAs[String]("constraint") ->
        (r.getAs[Double]("metric"), r.getAs[Boolean]("passed"))).toMap
    assert(got("completeness:o_orderkey") == ((1.0, true)))
    assert(got("completeness:o_orderstatus") == ((0.75, false)))
    assert(got("domain:o_orderstatus in (O,F,P)") == ((0.5, false)))
    assert(got("bounds:o_totalprice > 0") == ((0.75, false)))
    assert(got("uniqueness:o_orderkey") == ((0.75, false)))
    assert(got("referential:o_custkey >= 0") == ((1.0, true)))
  }

  test("snapshotDiff classifies added / removed / changed and drops unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "h")
    val v2 = Seq((2L, "b"), (3L, "X"), (4L, "d")).toDF("k", "h")
    val got = Validation.snapshotDiff(v1, v2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("added", 1L, 4L, 4L), ("changed", 1L, 3L, 3L),
      ("removed", 1L, 1L, 1L)))
  }

  test("benfordAudit: hand-counted digits, spine fills absent digits, chi2 = Σ quantized contribs") {
    // cents: 100, 200, 150, 3000, 999 → digits 1,2,1,3,9; n=5
    val o = Seq((1L, 1.00), (2L, 2.00), (3L, 1.50), (4L, 30.00), (5L, 9.99))
      .toDF("o_orderkey", "o_totalprice")
    val got = Validation.benfordAudit(o).collect()
    assert(got.length == 9)
    val byDigit = got.map(r => r.getAs[Long]("digit") ->
      (r.getAs[Long]("n_obs"), r.getAs[Double]("contrib"), r.getAs[Double]("chi2"))).toMap
    assert(byDigit(1)._1 == 2L && byDigit(2)._1 == 1L && byDigit(3)._1 == 1L &&
      byDigit(9)._1 == 1L && byDigit(4)._1 == 0L)
    // independent double-path reference with the same embedded constants
    val p = Seq(0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    val nObs = Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 9 -> 1L).withDefaultValue(0L)
    val contribQ = (1 to 9).map { d =>
      val e = 5 * p(d - 1); math.floor((nObs(d) - e) * (nObs(d) - e) / e * 1e6).toLong
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to 9).foreach { d =>
      assert(byDigit(d)._2 == r6(contribQ(d - 1) / 1e6), s"digit $d")
    }
    assert(got.forall(_.getAs[Double]("chi2") == r6(contribQ.sum / 1e6)))
  }
}
