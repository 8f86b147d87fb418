package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketed tables (the 100 TB join posture,
  * SURVEY.md §4 / builder mandate "bucketing for co-located joins"):
  * writing both sides bucketed by the join key into the same bucket
  * count lets a sort-merge join run with NO Exchange on either side —
  * the shuffle is paid once at write time, then every downstream join
  * on that key is shuffle-free.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets so
    * the merge join also skips the per-task sort).
    *
    * Idempotent ACROSS SESSIONS: a fresh session's in-memory catalog
    * doesn't know tables a previous process wrote, but the managed
    * location persists in the warehouse dir — `saveAsTable(Overwrite)`
    * then refuses with LOCATION_ALREADY_EXISTS instead of overwriting.
    * Dropping the (possibly catalog-unknown) table and clearing any
    * stale orphan location first makes re-runs land the same table the
    * way a real pipeline's index refresh must.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans SortMergeJoin without Exchange.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True when the physical plan contains no shuffle exchange — the
    * co-location proof used by tests and plan audits.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning")
  }
}
