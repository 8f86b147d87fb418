package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.{cents, fromCents, moneySum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log/event dataflow operators from SURVEY.md §2.4 J1, §2.5 A4, §2.6
  * W2/W3/W6 and the usage-report / status-store jobs (§7 modules 6–7):
  * the reference does these with O(n·m) nested loops and imperative
  * line-scanners (`generate_usage_report.py:153-198`,
  * `extra_utils.py:184-257`); here every one is normalize-first
  * (regexp_extract into columns) followed by hash joins and windows.
  *
  * Scale notes: the J1-shaped join extracts keys BEFORE joining, so the
  * theta/substring join of the reference becomes a shuffle hash join on
  * an equi-key; sessionization windows partition by user_id (high
  * cardinality → parallel), and the cumulative frames are ROWS-bounded
  * so they stream within a partition without materializing it.
  */
object LogPipeline extends QueryModule {

  /** J1 (generate_usage_report.py:153-198): the reference scans every log
    * line per task id (`line.find(task_id)`). Normalize-then-equi-join:
    * pull the numeric ref out of the free-form props payload with a
    * regex, then hash-join to the dimension.
    */
  def extractAndJoin(events: DataFrame, part: DataFrame): DataFrame =
    events
      .withColumn("ref_str", regexp_extract(col("props"), """"k": (\d+)""", 1))
      // regexp_extract yields "" on no match; ANSI cast would throw, so
      // gate the cast (try_cast semantics) and drop non-matching rows.
      .withColumn("ref", when(col("ref_str") =!= "", col("ref_str").cast("long")))
      .filter(col("ref").isNotNull)
      .join(broadcast(part), col("ref") === part("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .orderBy("p_brand")

  /** W6 (extra_utils.py:200-246 carry-forward analytics): running revenue
    * per supplier — cumulative ROWS frame over a fully-deterministic
    * ordering (date, orderkey, linenumber) so float accumulation order
    * is identical across engines.
    */
  def runningRevenue(li: DataFrame): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Accumulate in integer cents: summing integer-valued doubles is
    // exact, so the running total is bitwise identical across engines
    // and accumulation structures (no 0.005-boundary rounding jitter).
    li.filter(col("l_suppkey") <= 25)
      .withColumn("running_revenue",
        fromCents(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).over(w)))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_revenue")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** W2 (email_providers.py:345,485-489 top-N with cap): top 3 parts by
    * revenue within each brand — aggregate first (map-side partial agg
    * shrinks the shuffle), then a small per-brand ranking window.
    */
  def top3PartsPerBrand(li: DataFrame, part: DataFrame): DataFrame = {
    val rev = li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("p_brand", "p_partkey", "revenue", "rank")
      .orderBy("p_brand", "rank")
  }

  /** A4/W6 (extra_utils.py:184-257 CPU/GPU log sessionization): gap-based
    * sessionization — lag() flags a session break when the gap exceeds
    * 30 minutes, a cumulative sum numbers sessions, then two hash
    * aggregations produce per-user session stats. Integer microsecond
    * arithmetic keeps the break predicate exact.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    val sessions = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTs))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum))
    sessions.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("events_in_session"))
      .groupBy("user_id")
      .agg(max(col("session_id")).as("n_sessions"),
           sum(col("events_in_session")).as("n_events"),
           max(col("events_in_session")).as("max_session_events"))
      .orderBy("user_id")
  }

  /** F6/§2.11 (generate_usage_report.py:96-127 weekly usage report):
    * epoch-cutoff + category filter then tumbling weekly rollup — the
    * cron-scheduled pandas report as one windowed aggregation.
    */
  def weeklyUsage(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("purchase", "click") &&
              col("ts") >= lit("2024-01-08"))
      .withColumn("week", date_trunc("week", col("ts")).cast("date"))
      .groupBy("week")
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .orderBy("week")

  /** K4/W3 (status_manager.py append + latest-wins view): current status
    * per entity = last event by time — the status-store read path.
    */
  /** q332: SCD TYPE-2 STATUS HISTORY build — the slowly-changing-
    * dimension table the warehouse keeps BETWEEN q26's latest-status
    * snapshot and q112's transition counts: every (user, status) spell
    * becomes a validity interval [valid_from, valid_to) with a version
    * number and an is_current flag, consecutive duplicate statuses
    * COLLAPSED into one spell (the SCD2 change-detection rule — a
    * repeated reading is not a new version). This is the table as-of
    * joins (q60) point into and audits replay.
    *
    * Determinism: spell boundaries come from lag() over the (ts,
    * event_id) total order; interval endpoints render via the q26
    * date_format convention. Scale: two windows over the SAME
    * (user_id)-clustered sort — one shuffle, no self-join, and the
    * spell collapse is a running-flag sum, not a gaps-and-islands
    * self-join.
    */
  def statusHistory(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val spells = events
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
             lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("spell", sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("spell"))
      .agg(first(col("event_type")).as("status"),
        min(struct(col("ts"), col("event_id"))).as("fromk"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy("user_id").orderBy("spell")
    spells
      .withColumn("valid_to_ts", lead(col("fromk.ts"), 1).over(w2))
      .select(col("user_id"), col("spell").as("version"), col("status"),
        date_format(col("fromk.ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("n_events"), col("valid_to_ts").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  def latestStatus(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_type").as("last_status"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_seen"))
      .orderBy("user_id")
  }

  /** P2 (email_providers.py:300-338 ingest_url/created_date derivation):
    * derived string/date columns with native expressions — no UDFs.
    */
  def derivedDateReport(events: DataFrame): DataFrame =
    events
      .withColumn("month", date_format(col("ts"), "yyyy-MM"))
      .withColumn("entity_url",
        concat(lit("https://example.org/"), col("event_type"), lit("/"), col("user_id")))
      .groupBy("month")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("entity_url")).as("n_entities"))
      .orderBy("month")

  /** J1 complete two-hop shape (generate_usage_report.py:153-198): first
    * hop joins the extracted ref to the dimension, second hop joins the
    * dimension key into the fact table — both equi-joins after
    * normalization.
    */
  def twoHopUsage(events: DataFrame, part: DataFrame, li: DataFrame): DataFrame = {
    // Aggregation pushdown below the join: every (event, line) pair for a
    // part contributes the same per-part line stats, so pre-aggregate the
    // fact table per partkey (map-side partial agg collapses it before the
    // shuffle) and join the tiny per-part rollup instead of the raw fact.
    // Cents stay integers, so n_refs × cents_p is exact — bit-identical to
    // aggregating the expanded pairs. At 100 TB this is the difference
    // between shuffling the whole fact table and shuffling one row per key.
    // PRECONDITION for sum(n_distinct_events) == countDistinct(event_id)
    // per brand: an event_id resolves to at most one ref (one regexp
    // capture per row, and event_id is unique in the events table) — a
    // repeated event_id spanning two parts of one brand would be counted
    // once per part here but once per brand by the direct formulation.
    val perPart = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("part_lines"),
           sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("part_cents"))
    val refs = events
      .withColumn("ref_str", regexp_extract(col("props"), """"k": (\d+)""", 1))
      .withColumn("ref", when(col("ref_str") =!= "", col("ref_str").cast("long")))
      .filter(col("ref").isNotNull)
      .join(broadcast(part), col("ref") === part("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(countDistinct(col("event_id")).as("n_distinct_events"),
           count(lit(1)).as("n_event_rows"))
    refs.join(perPart, refs("p_partkey") === perPart("l_partkey"))
      .groupBy("p_brand")
      .agg(sum(col("n_distinct_events")).as("n_events"),
           sum(col("n_event_rows") * col("part_lines")).as("n_lines"),
           fromCents(sum(col("n_event_rows") * col("part_cents"))).as("revenue"))
      .orderBy("p_brand")
  }

  /** V4 timestamp tolerance (akoya_codex_data_collection.py:36-64 ±1h):
    * events within one hour of the user's previous event — exact integer
    * microsecond comparison.
    */
  def withinTolerancePairs(events: DataFrame, toleranceSeconds: Long = 3600L): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tolUs = toleranceSeconds * 1000000L
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byTs))
      .withColumn("close", col("prev_us").isNotNull && col("us") - col("prev_us") <= tolUs)
      .groupBy("user_id")
      .agg(sum(when(col("close"), 1L).otherwise(0L)).as("n_close"),
           count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_derived_dates"  -> ((s, d) => derivedDateReport(Tables(s, d).events)),
    "q45_two_hop_usage"  -> ((s, d) => { val t = Tables(s, d); twoHopUsage(t.events, t.part, t.lineitem) }),
    "q48_tolerance_pairs" -> ((s, d) => withinTolerancePairs(Tables(s, d).events)),
    "q11_extract_join"   -> ((s, d) => { val t = Tables(s, d); extractAndJoin(t.events, t.part) }),
    "q12_running_revenue" -> ((s, d) => runningRevenue(Tables(s, d).lineitem)),
    "q13_top3_per_brand" -> ((s, d) => { val t = Tables(s, d); top3PartsPerBrand(t.lineitem, t.part) }),
    "q14_sessionize"     -> ((s, d) => sessionize(Tables(s, d).events)),
    "q25_weekly_usage"   -> ((s, d) => weeklyUsage(Tables(s, d).events)),
    "q26_latest_status"  -> ((s, d) => latestStatus(Tables(s, d).events)),
    "q332_status_history" -> ((s, d) => statusHistory(Tables(s, d).events)),
  )

  override def oracles: Map[String, String] = Map(
    "q44_derived_dates" ->
      """SELECT strftime(ts, '%Y-%m') AS month, count(*) AS n_events,
                count(DISTINCT 'https://example.org/' || event_type || '/' || user_id) AS n_entities
         FROM events GROUP BY 1 ORDER BY month""",
    "q45_two_hop_usage" ->
      """SELECT p_brand, count(DISTINCT event_id) AS n_events, count(*) AS n_lines,
                sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100 AS revenue
         FROM (SELECT event_id, TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS ref
               FROM events) e
         JOIN part ON e.ref = p_partkey
         JOIN lineitem ON p_partkey = l_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q48_tolerance_pairs" ->
      """SELECT user_id,
                CAST(sum(CASE WHEN close THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
                count(*) AS n_events
         FROM (SELECT user_id,
                 lag(ts) OVER w IS NOT NULL AND
                 (epoch_ns(ts) // 1000) - (epoch_ns(lag(ts) OVER w) // 1000) <= 3600000000 AS close
               FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         GROUP BY user_id ORDER BY user_id""",
    "q11_extract_join" ->
      """SELECT p_brand, count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM (SELECT TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS ref, value
               FROM events) e
         JOIN part ON e.ref = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q12_running_revenue" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
             sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100 AS running_revenue
         FROM lineitem WHERE l_suppkey <= 25
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q13_top3_per_brand" ->
      """SELECT p_brand, p_partkey, revenue, rank FROM (
           SELECT p_brand, p_partkey, revenue,
                  row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rank
           FROM (SELECT p_brand, p_partkey,
                        sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100 AS revenue
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 GROUP BY p_brand, p_partkey))
         WHERE rank <= 3 ORDER BY p_brand, rank""",
    "q14_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ns(ts) // 1000 - epoch_ns(lag(ts) OVER w) // 1000 > 1800000000
                       THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT user_id,
                  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged),
         per_session AS (
           SELECT user_id, session_id, count(*) AS events_in_session
           FROM numbered GROUP BY user_id, session_id)
         SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
                CAST(sum(events_in_session) AS BIGINT) AS n_events,
                max(events_in_session) AS max_session_events
         FROM per_session GROUP BY user_id ORDER BY user_id""",
    "q25_weekly_usage" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
                count(*) AS n_events, round(sum(value), 2) AS total_value
         FROM events
         WHERE event_type IN ('purchase', 'click') AND ts >= TIMESTAMP '2024-01-08'
         GROUP BY 1 ORDER BY week""",
    // same (ts, event_id) total order, running-flag spell numbering,
    // q26 timestamp rendering; statuses inside a spell are identical so
    // min(event_type) is the spell status
    "q332_status_history" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |     FROM events),
        |s AS (SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type
        |                         THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS UNBOUNDED PRECEDING)::BIGINT AS spell
        |      FROM o),
        |sp AS (SELECT user_id, spell, min(event_type) AS status,
        |              min(ts) AS from_ts, count(*)::BIGINT AS n_events
        |       FROM s GROUP BY user_id, spell)
        |SELECT user_id, spell AS version, status,
        |       strftime(from_ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |       strftime(lead(from_ts) OVER (PARTITION BY user_id ORDER BY spell),
        |                '%Y-%m-%d %H:%M:%S') AS valid_to,
        |       n_events,
        |       lead(from_ts) OVER (PARTITION BY user_id ORDER BY spell) IS NULL
        |         AS is_current
        |FROM sp ORDER BY user_id, version""".stripMargin,
    "q26_latest_status" ->
      """SELECT user_id, last_status, last_seen FROM (
           SELECT user_id, event_type AS last_status,
                  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
  )
}
