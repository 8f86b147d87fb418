package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** q230 perplexity filter on a separable fixture: the LM trains on
  * "ab"-alphabet prose, so a held-out "ab" doc scores cheap (head) and a
  * "zq" doc scores expensive (tail).
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang").selectExpr(
      "doc_id", "text", "lang", "'src' AS source", "length(text) AS n_chars")

  test("fluent held-out doc is head, garbage doc is tail") {
    // train split: doc_id % 10 < 8 → ids 0-7; test: ids 8, 9, 18
    val d = docs(
      (0L, "abababababab", "en"), (1L, "babababa", "en"),
      (2L, "ababab", "en"), (3L, "bababababab", "en"),
      (4L, "abab", "en"), (5L, "baba", "en"),
      (6L, "ababab", "en"), (7L, "bababa", "en"),
      (8L, "abababab", "en"),   // fluent under the LM
      (9L, "zqzqzqzq", "en"),   // every bigram unseen
      (18L, "ababab", "en"),    // fluent — makes head strictly larger
    )
    val res = LanguageModel.perplexityFilter(d).collect()
    assert(res.length == 1)
    val Row(lang, nDocs, cutoff, nHead, nTail) = res.head
    assert(lang == "en" && nDocs == 3L)
    assert(nHead == 2L && nTail == 1L, s"head/tail split wrong: ${res.head}")
    assert(cutoff.asInstanceOf[Long] > 0L)
  }

  test("median cutoff is the exact lower-median order statistic") {
    // four test docs with three distinct scores: k = (4+1) div 2 = 2 →
    // the cutoff is the 2nd-smallest score and head counts ties at it
    val d = docs(
      (0L, "abababab", "en"), (1L, "babababa", "en"),
      (2L, "ababab", "en"), (3L, "babab", "en"),
      (8L, "abab", "en"), (9L, "abab", "en"),      // tied cheapest pair
      (18L, "abzq", "en"), (19L, "zqzq", "en"),    // mid, expensive
    )
    val res = LanguageModel.perplexityFilter(d).collect()
    val Row(_, nDocs, _, nHead, nTail) = res.head
    assert(nDocs == 4L && nHead == 2L && nTail == 2L, s"got ${res.head}")
  }
}
