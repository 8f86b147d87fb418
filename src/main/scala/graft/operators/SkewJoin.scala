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

  /** q124: key-skew audit — the diagnostic you run BEFORE deciding to
    * salt: per-key share of the hottest key, the top-K keys' combined
    * share, and the Gini coefficient of the key-count distribution.
    * Gini ≈ 0 = uniform keys (salting pointless), Gini → 1 = a few
    * giants own the table (salt or AQE-split those joins).
    *
    * Scale shape: one map-side-combined count per key, then everything
    * runs on the COUNT-OF-COUNTS histogram (rows = distinct count
    * values, tiny at any scale) — the rank-sum Σi·cᵢ over keys sorted
    * by count is computed per histogram block as c·(m·start + m(m+1)/2),
    * so no global sort of the key table ever happens; the top-K share
    * is a TakeOrdered over key counts. The single-partition window runs
    * over the histogram only.
    *
    * Determinism: Σi·cᵢ, ΣcᵢΣm are exact integer sums (m(m+1) is even,
    * `div 2` exact); Gini's numerator 2Σi·c − (n_keys+1)·n_rows stays
    * integer, so the output doubles are single divisions. Count ties at
    * the top-K boundary cannot change the top-K SUM (tied keys have
    * equal counts by definition).
    */
  def keySkewAudit(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(key).agg(count(lit(1)).as("c"))
    val hist = counts.groupBy("c").agg(count(lit(1)).as("m"))
    val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    val blocks = hist.withColumn("start", coalesce(sum(col("m")).over(w), lit(0L)))
    val moments = blocks.agg(
      sum(expr("c * (m * start + (m * (m + 1)) div 2)")).as("s_ic"),
      sum(col("c") * col("m")).as("n_rows"),
      sum(col("m")).as("n_keys"))
    val top = counts.orderBy(col("c").desc, col(key)).limit(topK)
      .agg(sum(col("c")).as("top_c"), max(col("c")).as("max_c"))
    moments.crossJoin(top).select(
      col("n_rows"), col("n_keys"), col("max_c").as("top1_count"),
      round(col("max_c") / col("n_rows").cast("double"), 4).as("top1_share"),
      round(col("top_c") / col("n_rows").cast("double"), 4).as("topk_share"),
      round((lit(2L) * col("s_ic") - (col("n_keys") + lit(1L)) * col("n_rows")).cast("double") /
            (col("n_keys").cast("double") * col("n_rows")), 4).as("gini"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_salted_revenue" -> ((s, d) => { val t = Tables(s, d); revenueByBrandSalted(t.lineitem, t.part) }),
    "q124_key_skew" -> ((s, d) => keySkewAudit(Tables(s, d).events, "user_id")),
  )

  override def oracles: Map[String, String] = Map(
    "q63_salted_revenue" ->
      """SELECT p_brand, sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100 AS revenue,
                count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    // straightforward per-key rank-sum form; the Spark side derives the
    // identical integer moments from the count-of-counts histogram
    "q124_key_skew" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM c),
        |t AS (SELECT sum(c)::BIGINT AS top_c, max(c)::BIGINT AS max_c
        |      FROM (SELECT c FROM c ORDER BY c DESC, user_id LIMIT 10)),
        |a AS (SELECT sum(i * c)::BIGINT AS s_ic, sum(c)::BIGINT AS n_rows,
        |             count(*)::BIGINT AS n_keys FROM r)
        |SELECT n_rows, n_keys, max_c AS top1_count,
        |       round(max_c / n_rows::DOUBLE, 4) AS top1_share,
        |       round(top_c / n_rows::DOUBLE, 4) AS topk_share,
        |       round((2 * s_ic - (n_keys + 1) * n_rows) / (n_keys::DOUBLE * n_rows), 4) AS gini
        |FROM a, t""".stripMargin,
  )
}
