package graft.sources

import graft.SparkSpec
import graft.Tables

class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without any shuffle exchange") {
    val t = Tables(spark, sf(""))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse directory persists — clear it so saveAsTable can create
    Seq("b_orders", "b_lineitem").foreach { n =>
      val dir = new java.io.File(s"spark-warehouse/$n")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Bucketing.writeBucketed(t.orders.withColumnRenamed("o_orderkey", "key"),
      "b_orders", "key", buckets = 4)
    Bucketing.writeBucketed(t.lineitem.withColumnRenamed("l_orderkey", "key"),
      "b_lineitem", "key", buckets = 4)
    val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "key")
    assert(Bucketing.isShuffleFree(joined),
      s"expected no shuffle:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() > 0)
    // contrast: the same join on raw parquet (row-count sanity)
    val o = t.orders
    val l = t.lineitem
    val raw = o.join(l, o("o_orderkey") === l("l_orderkey"))
    assert(raw.count() == joined.count())
  }
}
