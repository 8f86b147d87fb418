package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Local (tests/bench) and cluster profiles share the SQL-level knobs;
  * the cluster profile documents the 100 TB posture:
  *  - AQE on: runtime coalescing of shuffle partitions, skew-join
  *    splitting, and dynamic join-strategy switching replace hand-tuned
  *    partition counts;
  *  - `spark.sql.shuffle.partitions` is a ceiling AQE coalesces down
  *    from — set it to ~2-3× total cores;
  *  - `maxPartitionBytes` 256m keeps scan tasks coarse enough that a
  *    1000-executor cluster isn't scheduling millions of tiny tasks;
  *  - broadcast threshold stays default (10m) — dimension tables in this
  *    engine are explicitly `broadcast()`ed at the operator level, and
  *    AQE upgrades shuffle joins when runtime stats allow.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession =
    common(SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString),
      appName)

  /** Cluster profile: master/deploy come from spark-submit; partitions
    * sized by `totalCores`.
    */
  def cluster(totalCores: Int, appName: String = "graft"): SparkSession =
    common(SparkSession.builder()
        .config("spark.sql.shuffle.partitions", (totalCores * 2).toString)
        .config("spark.sql.files.maxPartitionBytes", "256m"),
      appName)

  private def common(b: SparkSession.Builder, appName: String): SparkSession = {
    val s = b.appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
