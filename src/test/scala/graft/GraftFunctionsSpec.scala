package graft

import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a','b')) AS h, vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head()
    assert(r.getLong(0) != 0L)
    assert(r.getDouble(1) == 11.0)
  }

  test("vec_dot matches the HOF formulation bitwise on real embeddings") {
    val emb = Tables(spark, "/root/testdata/sf0.001").embeddings.limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val mismatches = emb.select(
        graft.functions.VecOps.vecDot(col("embedding"), col("embedding")).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }
}
