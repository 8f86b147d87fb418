package graft.operators

import graft.SparkSpec

class EntityGraphSpec extends SparkSpec {
  import spark.implicits._

  test("transitiveClosure reaches grandparents") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("child", "parent")
    val got = EntityGraph.transitiveClosure(edges)
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"),
      ("c", "d")))
  }

  test("transitiveClosure terminates on cycles") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("child", "parent")
    val got = EntityGraph.transitiveClosure(edges)
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")))
  }

  test("starEdges builds typed ids") {
    val cust = Seq((7L, 3)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((3, 1)).toDF("n_nationkey", "n_regionkey")
    val got = EntityGraph.ancestry(cust, nat).as[(String, String)].collect().toSet
    assert(got == Set(("C7", "N3"), ("C7", "R1"), ("N3", "R1")))
  }
}
