package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the 100 TB shuffle-join saver:
  * when one join side carries a selective filter, Spark can build a
  * bloom filter over its join keys at runtime and push a
  * `might_contain` probe into the OTHER side's scan, so most of the big
  * side's rows die before the shuffle. The production thresholds
  * (creation ≤ 10 MB build side, application ≥ 10 GB probe side) are
  * exactly the 1000-executor regime this library targets; the spec
  * lowers them to demonstrate and pin the mechanism at test scale.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom probe into the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      // force a shuffle join: broadcast joins prune the probe side
      // already, bloom injection targets the shuffle-join regime
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t = Tables(spark, sf(""))
      val dim = t.part.filter(col("p_brand") === "Brand#11")
      val joined = t.lineitem.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum(col("l_quantity")).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom probe on the fact side:\n$optimized")
      // and it still computes the right thing through the probe
      assert(joined.collect().length <= 1)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
