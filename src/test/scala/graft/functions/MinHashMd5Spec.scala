package graft.functions

import graft.SparkSpec
import graft.functions.MinHashMd5.{minhashMd5, textMinhashMd5}
import org.apache.spark.sql.functions._

class MinHashMd5Spec extends SparkSpec {
  import spark.implicits._

  private def hofMinhash(salt: String) = {
    val words = split(col("text"), " ")
    val sh = transform(
      sequence(lit(1), greatest(size(words) - 2, lit(1))),
      i => array_join(slice(words, i, lit(3)), " "))
    array_min(transform(sh, s => md5(concat(lit(salt), s).cast("binary"))))
  }

  test("fused expression ≡ HOF formulation on real documents") {
    val docs = graft.Tables(spark, sf("")).documents.limit(100)
    val mismatches = docs.select(
        textMinhashMd5(col("text"), "salt0|").as("fused"),
        hofMinhash("salt0|").as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("edge cases: single word, trailing space, empty-ish") {
    val docs = Seq((1L, "word"), (2L, "two words"), (3L, "a b c d"), (4L, "x ")).toDF("doc_id", "text")
    val mismatches = docs.select(
        textMinhashMd5(col("text"), "s|").as("fused"),
        hofMinhash("s|").as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("array-input variant agrees with fused") {
    val docs = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val words = split(col("text"), " ")
    val sh = transform(
      sequence(lit(1), greatest(size(words) - 2, lit(1))),
      i => array_join(slice(words, i, lit(3)), " "))
    val r = docs.select(
      minhashMd5(sh, "z|").as("a"),
      textMinhashMd5(col("text"), "z|").as("b")).head()
    assert(r.getString(0) == r.getString(1))
  }
}
