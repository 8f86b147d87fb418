package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.moneySum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory from SURVEY.md §2.3–§2.7: the
  * aggregation / join / window / set-op shapes the reference implements
  * with pandas (`email_providers.py`, `extra_utils.py`,
  * `generate_usage_report.py`), re-expressed as declarative DataFrame
  * plans so Catalyst gets predicate pushdown, column pruning and join
  * selection for free.
  *
  * Scale notes (100 TB design intent):
  *  - dimension joins (`part`, `nation`, `region`, `customer`) are
  *    explicitly `broadcast()` — no shuffle of the fact side;
  *  - aggregations are plain hash aggregates with map-side partial
  *    aggregation; no driver-side collect anywhere;
  *  - windows partition by high-cardinality keys (custkey/suppkey), so
  *    they parallelize across executors.
  */
object RelationalReports extends QueryModule {

  /** A1/A5/P2 (email_providers.py:500-508 value_counts; utils.py:770-796
    * file stats): TPC-H Q1-shaped pricing/status summary over lineitem.
    */
  def pricingSummary(li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A1 (email_providers.py:500-508): count-by-status report. */
  def statusCounts(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** A2 (email_providers.py:130,277-283): distinct-entity counts per group. */
  def distinctCustomersByPriority(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("o_orderpriority")

  /** A6 (utils.py:1196-1208 source_type consolidation): single-value
    * consolidation with conflict detection — label "mixed" when a group
    * has more than one distinct value.
    */
  def segmentConsolidation(customer: DataFrame, nation: DataFrame): DataFrame =
    customer.join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name")
      .agg(
        when(countDistinct(col("c_mktsegment")) > 1, lit("mixed"))
          .otherwise(min(col("c_mktsegment"))).as("segment"),
        count(lit(1)).as("n_customers"))
      .orderBy("n_name")

  /** A5 (utils.py:770-796): per-group file/size stats, on documents. */
  def docStats(documents: DataFrame): DataFrame =
    documents.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy("source")

  /** J2/J3 (generate_usage_report.py:200-212, CPU_GPU_statistics.py:139):
    * fact-to-dimension enrichment as an explicit broadcast hash join —
    * the small side never shuffles the fact table.
    */
  def revenueByBrand(li: DataFrame, part: DataFrame): DataFrame =
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy("p_brand")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("p_brand")

  /** J8-flavored multi-hop dimension walk (survey.py:226-251 organs/donor
    * lookups become joins): customer → nation → region rollup.
    */
  def regionRollup(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"),
           round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy("r_name")

  /** J7/W3 (extra_utils.py:20-49 latest published derived child): top-1
    * per group by timestamp — `row_number()` over a per-key window, which
    * shuffles once on the partition key and scales with key cardinality.
    */
  def latestOrderPerCustomer(orders: DataFrame): DataFrame =
    // argmax as a struct-max hash aggregate (map-side partial agg, no
    // per-partition sort) instead of a row_number window: one shuffle of
    // pre-aggregated rows. Struct comparison is lexicographic, so
    // max(struct(date, key, ...)) == row_number over (date DESC, key
    // DESC) = 1.
    orders.groupBy("o_custkey")
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))).as("top"))
      .select(
        col("o_custkey"),
        col("top.o_orderkey").as("latest_orderkey"),
        col("top.o_orderdate").cast("date").as("latest_orderdate"),
        round(col("top.o_totalprice"), 2).as("latest_totalprice"))
      .orderBy("o_custkey")

  /** J10 (utils.py:2110-2112 anti-membership): customers with no
    * FINALIZED order — left anti join against the filtered fact side
    * (filter pushed below the join, so the anti join probes a smaller
    * build). Broadcast of the keys side is left to AQE; at 100 TB this
    * is a shuffled anti join on the key, which is the right plan.
    * The status filter keeps the result non-empty on the test data —
    * every customer has SOME order, so an unfiltered anti join would
    * hash-match vacuously on zero rows.
    */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders.filter(col("o_orderstatus") === "F"),
        customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** P5 (split_and_create.py:254-257 per-parent-row equality filter →
    * real semi-join): parts that have at least one high-quantity sale.
    */
  def partsWithBigSales(part: DataFrame, li: DataFrame): DataFrame =
    part.join(li.filter(col("l_quantity") > 40), part("p_partkey") === li("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")

  /** §2.7 set ops (status_manager.py:102-107, utils.py:2110-2112):
    * customers that placed orders EXCEPT those that hit an error event.
    */
  def activeMinusErrored(orders: DataFrame, events: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("custkey")).distinct()
      .except(events.filter(col("event_type") === "error")
        .select(col("user_id").as("custkey")).distinct())
      .orderBy("custkey")

  /** P8 (split_and_create.py:142-146 NaN scrub): null/negative scrubbing
    * with coalesce/when — pure narrow projection, no shuffle.
    */
  def scrubbedBalances(customer: DataFrame): DataFrame =
    customer.select(
        col("c_custkey"),
        round(when(col("c_acctbal").isNull || col("c_acctbal") < 0, lit(0.0))
          .otherwise(col("c_acctbal")), 2).as("acctbal_clean"),
        when(col("c_acctbal") < 0, lit("debtor")).otherwise(lit("ok")).as("flag"))
      .orderBy("c_custkey")

  /** A9 (scanpy_entry_point.py:37-47 calculate_qc_metrics): per-entity QC
    * over a long-format (cell, gene, count) table — here (orderkey,
    * partkey, quantity): feature counts, totals, and top-feature
    * fraction, one hash aggregation + an argmax.
    */
  def qcMetrics(li: DataFrame): DataFrame = {
    val perGene = li.groupBy("l_orderkey", "l_partkey")
      .agg(sum(col("l_quantity")).as("gene_count"))
    perGene.groupBy("l_orderkey")
      .agg(countDistinct(col("l_partkey")).as("n_genes"),
           sum(col("gene_count")).as("total_counts"),
           max(col("gene_count")).as("top_gene_count"))
      .select(col("l_orderkey"), col("n_genes"),
        col("total_counts").cast("long").as("total_counts"),
        round(col("top_gene_count") / col("total_counts"), 4).as("pct_top_gene"))
      .orderBy("l_orderkey")
  }

  /** Multi-grain margins in ONE pass (§2.5 extension): detail rows,
    * per-flag subtotals and the grand total from a single `rollup`.
    * Spark compiles this to one Expand + one hash aggregate — each input
    * row fans out to its 3 grouping sets BEFORE the only shuffle, so the
    * subtotals cost no extra fact-table scan (vs 3 aggregations + union,
    * which would read 100 TB three times). `grouping_id` disambiguates
    * genuine group values from the rolled-up 'ALL' rows.
    */
  def marginRollup(li: DataFrame): DataFrame =
    li.rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("grp"),
           count(lit(1)).as("n_rows"),
           moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("ret_flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
        col("grp"), col("n_rows"), col("revenue"))
      .orderBy("grp", "ret_flag", "line_status")

  /** Status pivot matrix (§2.5 extension): orders counted per
    * (priority, status) reshaped to one row per priority. The pivot
    * values are pinned (`Seq("F","O","P")`), so Spark compiles straight
    * to conditional aggregation — one scan, one shuffle to 5 priority
    * rows, NO extra distinct-values job and no wide-row hazard (an
    * unpinned pivot would first run a collect to discover columns).
    */
  def statusPivot(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .withColumn("n_total", col("n_f") + col("n_o") + col("n_p"))
      .orderBy("o_orderpriority")

  /** q170: slowly-changing-dimension (type 2) history build — the
    * warehouse operator that turns an event stream into versioned
    * validity intervals: one row per run of a user's attribute value
    * (here `event_type`), with `valid_from`/`valid_to` microsecond
    * bounds, half-open [from, to), `valid_to` NULL on the current
    * version. Consecutive duplicates collapse into one version
    * (SCD2 only versions CHANGES, not repeats).
    *
    * Classic gaps-and-islands: lag() flags changes, a running sum of
    * flags numbers the versions, and each run collapses WITHOUT a
    * second shuffle — the run's first row (chg = 1) already carries
    * everything: its `us` is valid_from, the NEXT run-start's `us`
    * (lead over the filtered frame) closes the interval, and n_events
    * is the row_number gap to that next start. Every window partitions
    * by the natural key, so the whole build is ONE corpus shuffle on
    * user_id (a groupBy(user_id, version) formulation would re-shuffle
    * the corpus on the composite key — plan-contract-pinned out).
    * Rows for one user sort locally; there is NO global sort and no
    * driver state. Tie-break inside a user is (ts, event_id), pinned
    * on both engines.
    */
  def scd2History(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTs = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val byStart = Window.partitionBy("user_id").orderBy("rn")
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("chg",
        when(lag("event_type", 1).over(byTs).isNull ||
             lag("event_type", 1).over(byTs) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("rn", row_number().over(byTs))
      .withColumn("n_all", count(lit(1)).over(Window.partitionBy("user_id")))
      .withColumn("version", sum("chg").over(byTs))
      .filter(col("chg") === 1L)
      .select(col("user_id"), col("version"), col("event_type"),
        col("us").as("valid_from_us"),
        coalesce(lead("rn", 1).over(byStart) - col("rn"), col("n_all") - col("rn") + 1L)
          .as("n_events"),
        lead("us", 1).over(byStart).as("valid_to_us"),
        lead("us", 1).over(byStart).isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** q277: INCREMENTAL VIEW MAINTENANCE merge — the "yesterday's cube +
    * today's delta, never a full recompute" contract every 100 TB daily
    * rollup depends on. The materialized state is the per-(type, day)
    * partial-aggregate frame over history BEFORE the cutoff; the delta
    * aggregates ONLY the cutoff day's events; the refreshed per-type
    * rollup merges the two with the mergeable-statistic algebra
    * (count/sum add, min/max combine — the same contracts the
    * sketches module spec-pins). The oracle aggregates the WHOLE
    * stream directly, so a green row certifies merge ≡ recompute.
    *
    * Scale: the daily refresh touches |delta| + |state| rows — the
    * state frame is calendar×type-bounded, and the full history is
    * never re-read. Values micro-quantize before summation (exact
    * integer merge on any engine).
    */
  def ivmMergedRollup(events: DataFrame, cutoffDay: String = "2024-01-25"): DataFrame = {
    def partials(src: DataFrame) = src
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
    val state = partials(events.filter(to_date(col("ts")) < lit(cutoffDay)))
    val delta = partials(events.filter(to_date(col("ts")) >= lit(cutoffDay)))
    state.unionByName(delta)
      .groupBy("event_type")
      .agg(sum("n").as("n_events"), sum("s").as("sum_milli"),
        min("mn").as("min_milli"), max("mx").as("max_milli"),
        count(lit(1)).as("n_partials"))
      .orderBy("event_type")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q277_ivm_merge"        -> ((s, d) => ivmMergedRollup(Tables(s, d).events)),
    "q170_scd2_history"     -> ((s, d) => scd2History(Tables(s, d).events)),
    "q50_qc_metrics"        -> ((s, d) => qcMetrics(Tables(s, d).lineitem)),
    "q139_margin_rollup"    -> ((s, d) => marginRollup(Tables(s, d).lineitem)),
    "q140_status_pivot"     -> ((s, d) => statusPivot(Tables(s, d).orders)),
    "q01_pricing_summary"   -> ((s, d) => pricingSummary(Tables(s, d).lineitem)),
    "q02_status_counts"     -> ((s, d) => statusCounts(Tables(s, d).orders)),
    "q03_distinct_by_prio"  -> ((s, d) => distinctCustomersByPriority(Tables(s, d).orders)),
    "q04_segment_consolidation" -> ((s, d) => { val t = Tables(s, d); segmentConsolidation(t.customer, t.nation) }),
    "q05_doc_stats"         -> ((s, d) => docStats(Tables(s, d).documents)),
    "q06_revenue_by_brand"  -> ((s, d) => { val t = Tables(s, d); revenueByBrand(t.lineitem, t.part) }),
    "q07_region_rollup"     -> ((s, d) => { val t = Tables(s, d); regionRollup(t.customer, t.nation, t.region) }),
    "q08_latest_order"      -> ((s, d) => latestOrderPerCustomer(Tables(s, d).orders)),
    "q09_customers_no_orders" -> ((s, d) => { val t = Tables(s, d); customersWithoutOrders(t.customer, t.orders) }),
    "q10_parts_big_sales"   -> ((s, d) => { val t = Tables(s, d); partsWithBigSales(t.part, t.lineitem) }),
    "q15_active_minus_errored" -> ((s, d) => { val t = Tables(s, d); activeMinusErrored(t.orders, t.events) }),
    "q18_scrubbed_balances" -> ((s, d) => scrubbedBalances(Tables(s, d).customer)),
  )

  override def oracles: Map[String, String] = Map(
    // direct whole-stream aggregate — a green row certifies the Spark
    // side's state+delta merge equals a full recompute; n_partials is
    // the distinct-day count because partial cells split exactly at the
    // cutoff-day boundary
    "q277_ivm_merge" ->
      """WITH base AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events)
        |SELECT event_type, count(*)::BIGINT AS n_events,
        |       sum(v)::BIGINT AS sum_milli,
        |       min(v) AS min_milli, max(v) AS max_milli,
        |       count(DISTINCT day)::BIGINT AS n_partials
        |FROM base GROUP BY event_type ORDER BY event_type""".stripMargin,
    // ns -> us truncation mirrors Tables.events (epoch_ns // 1000);
    // (ts, event_id) tie-break and run numbering identical to the Spark plan
    "q170_scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, event_type, us,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR lag(event_type) OVER w <> event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |v AS (
        |  SELECT user_id, event_type, us,
        |         sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS version
        |  FROM c),
        |runs AS (
        |  SELECT user_id, version, min(event_type) AS event_type,
        |         min(us)::BIGINT AS valid_from_us, count(*)::BIGINT AS n_events
        |  FROM v GROUP BY user_id, version)
        |SELECT user_id, version, event_type, valid_from_us, n_events,
        |       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)::BIGINT
        |         AS valid_to_us,
        |       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) IS NULL
        |         AS is_current
        |FROM runs ORDER BY user_id, version""".stripMargin,
    "q139_margin_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS ret_flag,
                coalesce(l_linestatus, 'ALL') AS line_status,
                CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grp,
                count(*) AS n_rows,
                sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100 AS revenue
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY grp, ret_flag, line_status""",
    "q140_status_pivot" ->
      """SELECT o_orderpriority, n_f, n_o, n_p, n_f + n_o + n_p AS n_total FROM (
           SELECT o_orderpriority,
                  count(*) FILTER (o_orderstatus = 'F') AS n_f,
                  count(*) FILTER (o_orderstatus = 'O') AS n_o,
                  count(*) FILTER (o_orderstatus = 'P') AS n_p
           FROM orders GROUP BY o_orderpriority)
         ORDER BY o_orderpriority""",
    "q50_qc_metrics" ->
      """SELECT l_orderkey, n_genes, CAST(total_counts AS BIGINT) AS total_counts,
                round(top_gene_count / total_counts, 4) AS pct_top_gene
         FROM (SELECT l_orderkey, count(DISTINCT l_partkey) AS n_genes,
                      sum(gene_count) AS total_counts, max(gene_count) AS top_gene_count
               FROM (SELECT l_orderkey, l_partkey, sum(l_quantity) AS gene_count
                     FROM lineitem GROUP BY 1, 2)
               GROUP BY l_orderkey)
         ORDER BY l_orderkey""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100 AS sum_disc_price,
         sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5)) / 100 AS sum_charge,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_status_counts" ->
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "q03_distinct_by_prio" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q04_segment_consolidation" ->
      """SELECT n_name,
         CASE WHEN count(DISTINCT c_mktsegment) > 1 THEN 'mixed' ELSE min(c_mktsegment) END AS segment,
         count(*) AS n_customers
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q05_doc_stats" ->
      """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         round(avg(n_chars), 2) AS avg_chars
         FROM documents GROUP BY source ORDER BY source""",
    "q06_revenue_by_brand" ->
      """SELECT p_brand, sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100 AS revenue,
         count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q07_region_rollup" ->
      """SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q08_latest_order" ->
      """SELECT o_custkey, latest_orderkey, latest_orderdate, latest_totalprice FROM (
           SELECT o_custkey, o_orderkey AS latest_orderkey,
                  CAST(o_orderdate AS DATE) AS latest_orderdate,
                  round(o_totalprice, 2) AS latest_totalprice,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1 ORDER BY o_custkey""",
    "q09_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q10_parts_big_sales" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 40)
         ORDER BY p_partkey""",
    "q15_active_minus_errored" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
         EXCEPT
         SELECT DISTINCT user_id AS custkey FROM events WHERE event_type = 'error'
         ORDER BY custkey""",
    "q18_scrubbed_balances" ->
      """SELECT c_custkey,
         round(CASE WHEN c_acctbal IS NULL OR c_acctbal < 0 THEN 0.0 ELSE c_acctbal END, 2) AS acctbal_clean,
         CASE WHEN c_acctbal < 0 THEN 'debtor' ELSE 'ok' END AS flag
         FROM customer ORDER BY c_custkey""",
  )
}
