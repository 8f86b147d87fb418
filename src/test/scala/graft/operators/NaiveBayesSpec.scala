package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // doc_id % 5 == 0 → test fold; text per "language" uses a disjoint
  // alphabet so a working classifier must hit 100% on the held-out fold
  private def corpus = Seq(
    (1L, "aaab aaba abaa aaab", "aa"), (2L, "aaba aaab baaa aaba", "aa"),
    (3L, "abab aaab aaba abba", "aa"), (5L, "aaab aaba aaab baba", "aa"),
    (11L, "zzzy zzyz zyzz zzzy", "zz"), (12L, "zyzz zzzy yzzz zzyz", "zz"),
    (13L, "zyzy zzzy zzyz zyyz", "zz"), (10L, "zzzy zzyz zzzy yzyz", "zz"),
  ).toDF("doc_id", "text", "lang")

  test("bigrams explodes each adjacent lowercased pair") {
    val bg = NaiveBayes.bigrams(Seq((1L, "AbC", "xx")).toDF("doc_id", "text", "lang"))
      .select("bg").as[String].collect().toSeq
    assert(bg == Seq("ab", "bc"))
    assert(NaiveBayes.bigrams(
      Seq((1L, "x", "xx")).toDF("doc_id", "text", "lang")).count() == 0)
  }

  test("separable alphabets classify the held-out fold perfectly") {
    val r = NaiveBayes.nbLangidConfusion(corpus).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("aa", "aa") -> 1L, ("zz", "zz") -> 1L))
  }

  test("prediction is an integer-cost argmin: permuting input partitions changes nothing") {
    val a = NaiveBayes.nbLangidConfusion(corpus.repartition(7)).collect().map(_.toString).sorted
    val b = NaiveBayes.nbLangidConfusion(corpus.repartition(2)).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("plan contract: model joins broadcast into scoring (no corpus-side shuffle for the model)") {
    val docs = spark.read.parquet(sf("") + "/documents.parquet")
    val df = NaiveBayes.nbLangidConfusion(docs)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast model join:\n$p")
  }
}
