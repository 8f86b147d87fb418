package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  test("majority item survives eviction at capacity 2 across partition merges") {
    // 60 "hot" + 50 assorted cold items: hot has frequency > N/3, so the
    // Misra-Gries guarantee says it MUST be in a capacity-2 sketch no
    // matter how the 8 partitions' partial sketches merge
    val rows = Seq.fill(60)("hot") ++ (1 to 50).map(i => s"cold$i")
    val df = scala.util.Random.shuffle(rows).toDF("token").repartition(8)
    val cands = df.agg(TopKSketch.topkCandidates(col("token"), 2).as("c"))
      .head().getSeq[String](0)
    assert(cands.size <= 2)
    assert(cands.contains("hot"))
  }

  test("sketch under capacity is exact and sorted") {
    val df = Seq("b", "a", "b", "c", "a", "b").toDF("token")
    val cands = df.agg(TopKSketch.topkCandidates(col("token"), 10).as("c"))
      .head().getSeq[String](0)
    assert(cands == Seq("a", "b", "c"))
  }

  test("heavyHitterTokens returns exact counts above N/(capacity+1)") {
    // doc text engineered: "x" appears 12 times of 24 tokens -> always
    // above threshold for any small capacity; "once" appears once
    val docs = Seq((1L, ("x " * 12 + "y " * 6 + "z " * 5 + "once").trim))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.heavyHitterTokens(docs, capacity = 3)
      .as[(String, Long)].collect().toMap
    assert(got("x") == 12L)
    assert(!got.contains("once"))
  }
}
