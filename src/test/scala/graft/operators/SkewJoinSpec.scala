package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the unsalted join's result") {
    val t = Tables(spark, sf(""))
    val li = t.lineitem.select(col("l_orderkey").as("key"), col("l_quantity"))
    val o = t.orders.select(col("o_orderkey").as("key"), col("o_orderstatus"))
    val salted = SkewJoin.saltedInnerJoin(li, o, "key", salts = 4)
    val plain = li.join(o, "key")
    assert(salted.count() == plain.count())
    val diff = salted.groupBy("key").count()
      .except(plain.groupBy("key").count()).count()
    assert(diff == 0)
  }

  test("salts spread a hot key across partitionable groups") {
    import spark.implicits._
    val hot = Seq.fill(1000)(("hot", 1)).toDF("key", "v")
    val dim = Seq(("hot", "x")).toDF("key", "name")
    val salted = SkewJoin.saltedInnerJoin(hot, dim, "key", salts = 8)
    assert(salted.count() == 1000)
  }

  test("keySkewAudit: Gini 0 on uniform keys, hand-computed on a skewed table") {
    import spark.implicits._
    val uniform = Seq(("a", 1), ("a", 1), ("b", 1), ("b", 1)).toDF("k", "v")
    val gu = SkewJoin.keySkewAudit(uniform, "k")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(gu == ((4L, 2L, 2L, 0.5, 1.0, 0.0)))
    // counts (1, 3): sorted-rank sum = 1·1 + 2·3 = 7 ->
    // G = (2·7 − 3·4)/(2·4) = 0.25; top1 3/4, topK everything
    val skewed = Seq(("a", 1), ("b", 1), ("b", 1), ("b", 1)).toDF("k", "v")
    val gs = SkewJoin.keySkewAudit(skewed, "k")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(gs == ((4L, 2L, 3L, 0.75, 1.0, 0.25)))
    // topK cap actually bounds the share when keys exceed K
    val many = (0 until 12).flatMap(i => Seq.fill(i + 1)((s"k$i", 1))).toDF("k", "v")
    val gm = SkewJoin.keySkewAudit(many, "k", topK = 2).select("topk_share")
      .as[Double].collect().head
    // top-2 keys have 12 + 11 of 78 rows
    assert(gm == math.rint(23.0 / 78.0 * 10000) / 10000)
  }
}
