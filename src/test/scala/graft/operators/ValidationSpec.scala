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
}
