package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet star schema (see TESTDATA.md).
  *
  * Each table is a plain parquet directory read; Catalyst handles column
  * pruning and predicate pushdown into the scan, so operators downstream
  * should express filters/projections declaratively rather than caching
  * wide reads.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true`; we then rebuild a
    * microsecond TimestampType column. `div` (integer division) keeps
    * full int64 precision — `/` would round-trip through double and lose
    * the low bits of an epoch-nanos value.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** A bundle of named queries plus their DuckDB oracle SQL.
  *
  * Every operator module exposes its correctness surface this way and
  * [[SparkEntry]] unions them. Column names MUST match between the Spark
  * result and the oracle SQL (the driver sorts columns by name before
  * hashing); all computed doubles are rounded on both sides to make the
  * hash comparison robust to summation-order float jitter.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
