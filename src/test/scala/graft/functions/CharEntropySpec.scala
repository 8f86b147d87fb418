package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  test("kernel is bit-identical to the composed HOF formulation on real docs") {
    val docs = graft.Tables(spark, sf("")).documents
    // the original relational formulation: sorted-distinct-alphabet fold
    val cs = array_remove(split(col("text"), ""), "")
    val n = size(cs).cast("double")
    val alphabet = array_sort(array_distinct(cs))
    val counts = transform(alphabet, c => size(filter(cs, x => x === c)).cast("double"))
    val hof = docs.select(col("doc_id"),
      size(cs).cast("long").as("n_chars"),
      size(alphabet).cast("long").as("n_distinct"),
      aggregate(counts, lit(0.0), (acc, cnt) => acc + (cnt / n) * log(cnt / n)).as("s"))
    val kernel = docs.select(col("doc_id"),
      CharEntropyStats.charEntropyStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_chars").as("n_chars"),
        col("r.n_distinct").as("n_distinct"), col("r.sum_plogp").as("s"))
    val h = hof.as[(Long, Long, Long, Double)].collect().map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    val k = kernel.as[(Long, Long, Long, Double)].collect().map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    assert(h.keySet == k.keySet)
    h.foreach { case (id, v) => assert(k(id) == v, s"doc $id") }
  }

  test("kernel handles unicode code points and empty text") {
    val docs = Seq((1L, ""), (2L, "aa"), (3L, "日本語日本")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      CharEntropyStats.charEntropyStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_chars"), col("r.n_distinct"), col("r.sum_plogp"))
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 0L, 0.0)))
    assert(got(2L) == ((2L, 2L, 1L, 0.0)))
    val (_, n, d, s) = got(3L)
    assert(n == 5L && d == 3L)
    // 2/5, 2/5, 1/5 distribution
    val exp = 2 * (0.4 * math.log(0.4)) + 0.2 * math.log(0.2)
    assert(math.abs(s - exp) < 1e-12)
  }
}
