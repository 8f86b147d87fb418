package graft

/** Partition-order independence: the determinism engineering (integer
  * cents, integer µs, sequential float folds, sorted set serialization)
  * claims results are BIT-IDENTICAL regardless of how data is
  * partitioned. Prove it by running the float-heaviest queries under
  * different shuffle-partition counts and comparing full collected
  * output — the local stand-in for "same answer on 4 executors and
  * 1000".
  */
class DeterminismSpec extends SparkSpec {

  private val queriesUnderTest = Seq(
    "q01_pricing_summary",  // money sums + averages
    "q06_revenue_by_brand", // cents through a join
    "q28_cosine_topk",      // float-vector fold
    "q52_simhash_buckets",  // hash kernel + aggregation
    "q62_heavy_tokens",     // sketch-driven two-pass
    "q66_hash_sample",      // hash-threshold sampling membership
    "q67_shard_packing",    // two-phase global running sum
    "q176_kmeans",          // integer-distance argmin iteration
    "q178_t_closeness",     // integer-EMD cumulative windows
    "q187_nb_langid",       // micro-nat integer argmin scoring
    "q193_twap",            // decimal weighted sums
    "q197_isotonic",        // minimax over range means
  )

  test("results are identical under different shuffle partitionings") {
    val dir = sf("")
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      queriesUnderTest.foreach { name =>
        val fn = SparkEntry.queries(name)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = fn(spark, dir).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        val b = fn(spark, dir).collect().map(_.toString).toSeq
        assert(a == b, s"$name differs across partitionings")
        assert(a.nonEmpty, s"$name returned no rows")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }
}
