package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling joins (builder mandate "salting for skew, AQE for
  * runtime re-plan"): AQE's skew-join split handles most cases at
  * runtime; explicit salting remains the tool when a single hot key
  * dwarfs everything (the ingest workload's "one giant upload" shape).
  *
  * Salting an inner equi-join: the skewed (large) side gets a random
  * salt in [0, n); the small side is replicated across all n salts via
  * a generator — the join key becomes (key, salt), splitting each hot
  * key's rows over n reducers. Result set is identical to the unsalted
  * join (spec-checked).
  */
object SkewJoin extends QueryModule {

  def saltedInnerJoin(skewed: DataFrame, other: DataFrame, key: String,
                      salts: Int = 8): DataFrame = {
    val saltedLarge = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id(), lit(42)), lit(salts)).cast("int"))
    val replicatedSmall = other.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Brand revenue computed THROUGH the salted join — the salt split
    * must be invisible in the result, so this shares q06's oracle
    * semantics. Keeps the hot-key path under the hash-match gate, not
    * just a spec: if salting ever dropped or duplicated rows, the
    * cents-exact revenue would catch it.
    */
  def revenueByBrandSalted(li: DataFrame, part: DataFrame): DataFrame =
    saltedInnerJoin(
        li.withColumnRenamed("l_partkey", "p_partkey"), part, "p_partkey")
      .groupBy("p_brand")
      .agg(graft.functions.moneySum(
             col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("p_brand")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_salted_revenue" -> ((s, d) => { val t = Tables(s, d); revenueByBrandSalted(t.lineitem, t.part) }),
  )

  override def oracles: Map[String, String] = Map(
    "q63_salted_revenue" ->
      """SELECT p_brand, sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100 AS revenue,
                count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
  )
}
