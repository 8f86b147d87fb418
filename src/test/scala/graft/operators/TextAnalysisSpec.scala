package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("qualityScores: ratios and score are deterministic") {
    val docs = Seq((1L, "the cat sat", 11L)).toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.qualityScores(docs).head()
    assert(r.getLong(1) == 3L)                      // tokens
    assert(r.getDouble(2) == math.rint(11.0 / 3 * 10000) / 10000) // chars_per_token ~ 3.6667
    assert(r.getDouble(3) == 0.3333)                // 1 stopword of 3
  }

  test("languageId picks the language with most stopword hits") {
    val docs = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "el perro la casa los gatos", "es"),
      (3L, "zzz qqq", "zz"),
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.languageId(docs)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("normalized strips punctuation and collapses whitespace") {
    val docs = Seq((1L, "Hello,   World! (x)")).toDF("doc_id", "text")
    val r = TextAnalysis.normalized(docs).head()
    assert(r.getString(1) == "hello world x")
    assert(r.getLong(2) == 3L)
  }

  test("regexTagSummary applies first-match semantics") {
    val docs = Seq((1L, "spark and stream"), (2L, "stream only"), (3L, "a join"), (4L, "none"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.regexTagSummary(docs)
      .as[(String, Long)].collect().toMap
    assert(got == Map("spark" -> 1L, "streaming" -> 1L, "relational" -> 1L, "other" -> 1L))
  }
}
