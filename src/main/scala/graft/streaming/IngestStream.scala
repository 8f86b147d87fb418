package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming layer (SURVEY.md §2.11): the reference is
  * event-triggered batch (REST triggers + cron + sleep-polling); here
  * the ingest queue is a real stream with the upgrade semantics the
  * survey maps out:
  *  - run-id dedup (`endpoint.py:370-372` "The request happened twice?")
  *    → `dropDuplicates` within the watermark;
  *  - cron report jobs (`@weekly` usage report) → event-time tumbling
  *    windows with a watermark for late data;
  *  - status stream → append-only events, latest-wins view at read.
  *
  * All transforms are expressed on an unbounded DataFrame, so the same
  * code runs in batch (tests, backfills) and streaming (production).
  */
object IngestStream {

  /** Ingest-request stream: dedup by run_id within the watermark window.
    * Input schema: (run_id, dataset_id, process, request_time).
    */
  def dedupRequests(requests: DataFrame, watermark: String = "1 hour"): DataFrame =
    requests
      .withWatermark("request_time", watermark)
      // WithinWatermark variant: plain dropDuplicates(subset) ignores the
      // watermark when the event-time column isn't in the subset → state
      // grows unboundedly; this evicts run_ids older than the watermark
      .dropDuplicatesWithinWatermark("run_id")

  /** Weekly usage report as an event-time tumbling window (replaces the
    * @weekly cron + pandas scan): count + value sum per (window, type).
    */
  def windowedUsage(events: DataFrame, window_ : String = "7 days",
                    watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("event_type"), col("n_events"), col("total_value"))

  /** Stream-static enrichment: join the request stream against a static
    * dimension snapshot (the entity-api lookup table of SURVEY S19) —
    * broadcast on the static side, so each micro-batch pays a map-side
    * hash join and the stream never shuffles. The static plan re-reads
    * per micro-batch, so a parquet-backed dimension picks up snapshot
    * refreshes without restarting the query.
    */
  def enrichRequests(requests: DataFrame, dim: DataFrame,
                     key: String = "dataset_id"): DataFrame =
    requests.join(broadcast(dim), Seq(key), "left")

  /** Route a deduped request micro-batch through the workflow rule table
    * and append status events — the foreachBatch body (batch-mode
    * DataFrame in, side-effect-free DataFrames out; sinks are adapters).
    */
  def routeBatch(batch: DataFrame, rules: Seq[graft.operators.Routing.RoutingRule]): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val rulesDf = rules.toDF("pattern", "workflow", "priority")
    graft.operators.Routing
      .firstMatch(batch, rulesDf, keyCol = "run_id", matchCol = "process", default = "wf_default")
      .select("run_id", "dataset_id", "process", "workflow", "request_time")
  }

  /** Wire the full stream: requests → dedup → route → injected sink
    * adapter (K5 pattern: selection/formatting is DataFrame work, the
    * send is a driver side-effect).
    */
  def start(requests: DataFrame, rules: Seq[graft.operators.Routing.RoutingRule])
           (onBatch: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    dedupRequests(requests)
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) => onBatch(routeBatch(batch, rules)) }
      .start()
}

/** Batch-parity oracle surface for the streaming layer: the SAME
  * `IngestStream.windowedUsage` plan (tumbling event-time window over a
  * watermarked column) run as a batch DataFrame — Structured Streaming's
  * unified model means the plan is identical in both modes, so a DuckDB
  * hash-match here certifies the streaming report's window arithmetic.
  * Spark's `window(ts, "1 day")` aligns buckets to the epoch in the
  * session timezone (UTC) — i.e. calendar UTC days, which is exactly
  * DuckDB `date_trunc('day', ts)`.
  */
object StreamParity extends graft.QueryModule {
  import org.apache.spark.sql.functions._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_windowed_usage" -> ((s, d) =>
      IngestStream.windowedUsage(graft.Tables(s, d).events, "1 day", "1 day")
        .select(col("window_start"), col("window_end"), col("event_type"),
                col("n_events"), round(col("total_value"), 2).as("total_value"))
        .orderBy("window_start", "event_type")),
  )

  override def oracles: Map[String, String] = Map(
    "q57_windowed_usage" ->
      """SELECT date_trunc('day', ts)::TIMESTAMP AS window_start,
        |       date_trunc('day', ts)::TIMESTAMP + INTERVAL 1 DAY AS window_end,
        |       event_type, count(*) AS n_events,
        |       round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,
  )
}
