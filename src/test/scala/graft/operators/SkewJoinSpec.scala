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
}
