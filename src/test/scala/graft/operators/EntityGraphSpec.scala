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

  test("hierarchyRollup (recursive CTE) equals a driver-side ancestor-chain reference") {
    // keys 0..20, parent = k div 4, price = 1.00*k → cents rollup exact
    val part = (0L to 20L).map(k => (k, k.toDouble)).toDF("p_partkey", "p_retailprice")
    val got = EntityGraph.hierarchyRollup(part)
      .as[(Long, Long, Long)].collect().toSeq
    // reference: every node contributes to each ancestor on its chain
    val contrib = (0L to 20L).flatMap { k =>
      val chain = Iterator.iterate(k)(_ / 4).takeWhile(_ > 0).toSeq :+ 0L
      (if (k == 0) Seq(0L) else chain).distinct.map(a => (a, k))
    }
    val ref = contrib.groupBy(_._1).map { case (a, xs) =>
      (a, xs.size.toLong, xs.map(_._2 * 100).sum) }
      .toSeq.sortBy(r => (-r._2, r._1)).take(15)
    assert(got == ref)
    // the root aggregates the whole keyspace
    assert(got.head._1 == 0L && got.head._2 == 21L)
  }
}
