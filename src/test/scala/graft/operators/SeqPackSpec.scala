package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** q231 next-fit packing: hand-worked window chains, truncation at cap,
  * and partition-order independence of the sorted-group fold.
  */
class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").selectExpr(
      "doc_id", "text", "'en' AS lang", "'src' AS source", "length(text) AS n_chars")

  test("hand-worked next-fit chain") {
    // one shard (ids ≡ 0 mod 8), cap 10: toks 4,4,4 → [4+4],[4]; then 9 → new; then 12→trunc 10 → new
    val d = docs(
      (0L, "a b c d"),          // 4 toks
      (8L, "a b c d"),          // 4 → fits (8)
      (16L, "a b c d"),         // 4 → 12 > 10 → window 2
      (24L, "a b c d e f g h i"),            // 9 → window 3
      (32L, "a b c d e f g h i j k l"),      // 12 → trunc 10 → window 4
    )
    val res = SeqPack.sequencePacking(d, cap = 10L, shards = 8).collect()
    assert(res.toSeq == Seq(Row(0L, 5L, 4L, 31L, 9L)), res.toSeq.toString)
  }

  test("doc exactly filling the window closes it for the next doc") {
    val d = docs((0L, "a b c"), (8L, "a b"), (16L, "a"))   // 3,2,1 cap 5 → [3+2],[1]
    val res = SeqPack.sequencePacking(d, cap = 5L, shards = 8).collect()
    assert(res.toSeq == Seq(Row(0L, 3L, 2L, 6L, 4L)), res.toSeq.toString)
  }

  test("fold is partition-order independent (sorted-group contract)") {
    val d = docs((0 until 64).map(i => (i.toLong, ("w " * (i % 7 + 1)).trim)): _*)
    val a = SeqPack.sequencePacking(d.repartition(1), cap = 9L).collect().toSeq
    val b = SeqPack.sequencePacking(d.repartition(13), cap = 9L).collect().toSeq
    assert(a == b && a.size == 8)
  }
}
