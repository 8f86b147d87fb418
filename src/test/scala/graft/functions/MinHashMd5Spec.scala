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

  test("multi-salt variant ≡ per-salt fused elementwise on real documents + edge cases") {
    val real = graft.Tables(spark, sf("")).documents.limit(100).select("text")
    val edge = Seq("word", "x ", "a b c d", "two words").toDF("text")
    val salts = (0 until 8).map(j => s"acc$j|")
    val multi = MinHashMd5.textMinhashMd5Multi(col("text"), salts)
    val single = array(salts.map(s => textMinhashMd5(col("text"), s)): _*)
    val mismatches = real.union(edge).select(multi.as("m"), single.as("s"))
      .filter(col("m") =!= col("s")).count()
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
