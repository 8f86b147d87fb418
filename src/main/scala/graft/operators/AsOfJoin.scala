package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for every left row, the latest right row of
  * the same key with right.ts <= left.ts. The reference's status reads
  * are exactly this shape ("state of the entity when the event
  * happened"), and Spark has no native ASOF join, so this is the
  * custom-operator path (SURVEY §4 preference (a): compose existing
  * ops).
  *
  * Implementation is the scalable union+window trick, NOT a range join:
  * tag both sides, union them, and run ONE window over (key, ts) taking
  * the last non-null right payload at or before each row. One shuffle
  * on the key, no pair explosion, works at any time-skew — the plan a
  * range self-join would only reach after interval bucketing. Hot keys
  * are the caveat (one partition per key in the window), same as any
  * keyed window at 100 TB.
  *
  * Tie semantics: a right row AT the left row's timestamp matches
  * (<=, right sorts before left at equal ts). Callers should carry
  * payload columns that are deterministic under right-side ts ties.
  */
object AsOfJoin extends QueryModule {

  /** left asof-join right on `keyCol`, matching the latest right row
    * with `rightTs` <= `leftTs`; the carried right payload lands in a
    * nullable `asof` struct column (null = no prior right row).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    val rv = struct(carry.map(col) :+ col(rightTs).as("__asof_ts"): _*)
    // null-ts right rows would sort FIRST (nulls-first asc) with a
    // non-null payload struct, poisoning every left row's "no prior
    // match" null — an unordered event can never be "the latest before"
    val r2 = right.filter(col(rightTs).isNotNull)
      .select(col(keyCol).as("__key"), col(rightTs).as("__ts"), rv.as("__rv"))
      .withColumn("__is_right", lit(1))
    val lCols = left.columns.toSeq
    val l2 = left
      .withColumn("__key", col(keyCol)).withColumn("__ts", col(leftTs))
      .withColumn("__rv", lit(null).cast(r2.schema("__rv").dataType))
      .withColumn("__is_right", lit(0))
      .select((Seq("__key", "__ts", "__rv", "__is_right") ++ lCols).map(col): _*)
    val r3 = lCols.foldLeft(r2) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((Seq("__key", "__ts", "__rv", "__is_right") ++ lCols).map(col): _*)
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r3)
      .withColumn("asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(lCols.map(col) :+ col("asof"): _*)
  }

  /** Each purchase matched to the user's latest view at or before it —
    * integer-microsecond gap so the compare is exact.
    */
  def purchaseAfterView(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = events.filter(col("event_type") === "view")
      .select("user_id", "ts")
    asOfJoin(purchases, views, "user_id", "ts", "ts", carry = Seq.empty)
      .select(col("event_id"), col("user_id"),
        col("asof.__asof_ts").as("view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("asof.__asof_ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_asof_view" -> ((s, d) => purchaseAfterView(Tables(s, d).events)),
  )

  override def oracles: Map[String, String] = Map(
    "q60_asof_view" ->
      """SELECT l.event_id, l.user_id, r.ts::TIMESTAMP AS view_ts,
        |       (epoch_ns(l.ts) // 1000 - epoch_ns(r.ts) // 1000) AS gap_us
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts
        |ORDER BY l.event_id""".stripMargin,
  )
}
