package graft.functions

import graft.SparkSpec
import graft.functions.SimHash64.{hammingDistance, simhash64}
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("identical token arrays hash identically; disjoint ones differ") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("x", "y", "z", "w"))).toDF("id", "toks")
    val got = df.select($"id", simhash64($"toks").as("h")).as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
  }

  test("near-duplicates land at small hamming distance") {
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED")
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "toks")
    val h = df.select($"id", simhash64($"toks").as("h"))
    val pairs = h.as("a").crossJoin(h.as("b"))
      .filter($"a.id" < $"b.id")
      .select($"a.id", $"b.id", hammingDistance($"a.h", $"b.h").as("d"))
      .as[(Long, Long, Long)].collect()
      .map { case (l, r, d) => (l, r) -> d }.toMap
    assert(pairs((1L, 2L)) < pairs((1L, 3L)))
    assert(pairs((1L, 2L)) <= 16)
    assert(pairs((1L, 3L)) >= 16)
  }

  test("simhash-based near-dup bucketing on real documents runs") {
    val docs = graft.Tables(spark, sf("")).documents
    val sigs = docs.select($"doc_id", simhash64(split(lower($"text"), " ")).as("sig"))
    assert(sigs.filter($"sig" === 0L).count() == 0)
    assert(sigs.count() == docs.count())
  }

  test("q98 block banding has EXACT recall at radius 3 (pigeonhole) vs brute force") {
    val docs = graft.Tables(spark, sf("")).documents
    val banded = graft.operators.NonSqlOps.simhashHammingPairs(docs)
      .as[(Long, Long, Long)].collect().toSet
    // the 100 TB config — C(8,5)=56 bands on 40-bit keys — must find
    // the SAME pair set (recall is exact for every valid block count)
    val banded8 = graft.operators.NonSqlOps.simhashHammingPairs(docs, nBlocks = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded8 == banded)
    // brute force over all pairs, driver-side (test scale only)
    val sigs = docs.select($"doc_id", simhash64(split(lower($"text"), " ")).as("sig"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (l, ls) <- sigs.iterator
      (r, rs) <- sigs.iterator
      if l < r
      d = java.lang.Long.bitCount(ls ^ rs)
      if d <= 3
    } yield (l, r, d.toLong)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture should contain at least one near-dup pair")
  }
}
