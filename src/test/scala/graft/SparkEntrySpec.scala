package graft

/** Driver-contract smoke (gate t1): entry() returns rows at sf0.001,
  * every declared query runs there, and every oracle key has a query.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; at least the round-7 floor of 202 queries declared") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q.size >= 202)
  }

  test("every query executes at sf0.001 (schema resolves, no runtime error)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("side-effectful queries are re-runnable (catalog/warehouse state doesn't poison round 2)") {
    // Every query that touches session or on-disk state beyond a pure
    // plan: saveAsTable (q205), temp views (q182/q186/q190/q219),
    // stateful-operator batch mode (q217). The q205 stale-warehouse bug
    // (LOCATION_ALREADY_EXISTS on the second Verify in one checkout)
    // motivates this gate — a failure here breaks the driver's re-run.
    val effectful = Seq("q205_indexed_dedup", "q182_small_qty_revenue",
      "q186_top_supplier", "q190_grouping_sets", "q219_hierarchy_rollup",
      "q217_source_cap_stream")
    val failures = effectful.flatMap { name =>
      val fn = SparkEntry.queries(name)
      try {
        val a = fn(spark, "/root/testdata/sf0.001").count()
        val b = fn(spark, "/root/testdata/sf0.001").count()
        if (a == b) None else Some(s"$name: run1=$a run2=$b")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
