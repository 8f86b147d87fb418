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

  /** events.parquet's `ts` physical type has varied across data
    * generations: TIMESTAMP(NANOS) (read as Long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), and micro-precision
    * timestamps without the isAdjustedToUTC flag (read as TIMESTAMP_NTZ
    * since Spark infers NTZ for unadjusted parquet timestamps). Every
    * operator expects a plain session-zone TimestampType — sessions run
    * UTC, and DuckDB treats the same naive values as UTC instants, so
    * both normalizations are value-preserving. `div` (integer division)
    * keeps full int64 precision on the nanos path — `/` would round-trip
    * through double and lose the low bits of an epoch-nanos value.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
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
