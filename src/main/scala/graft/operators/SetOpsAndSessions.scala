package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.moneySum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining §2 inventory shapes: A2 collect_set consolidation, A4
  * duration sessionization (exact integer-µs arithmetic), W2 top-N with
  * "…N more" footer, §2.7 intersect, and tagged multi-source union.
  */
object SetOpsAndSessions extends QueryModule {

  /** A2 (email_providers.py:277-283 unique_groups_found): sorted distinct
    * value set per group. The set is serialized to a '|'-joined string so
    * the result is hashable by row-oriented comparators (the driver's
    * pandas sort cannot order raw array cells); the array form remains
    * available via [[segmentSetsArray]].
    */
  def segmentSets(customer: DataFrame, nation: DataFrame): DataFrame =
    segmentSetsArray(customer, nation)
      .withColumn("segments", array_join(col("segments"), "|"))

  /** Array-typed variant of [[segmentSets]] (the natural collect_set shape). */
  def segmentSetsArray(customer: DataFrame, nation: DataFrame): DataFrame =
    customer.join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name")
      .agg(sort_array(collect_set(col("c_mktsegment"))).as("segments"),
           countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy("n_name")

  /** A4 (extra_utils.py:184-257 per-dataset CPU seconds): gap-based
    * sessions with summed durations — all arithmetic in integer
    * microseconds (exact across engines; no float time math).
    */
  def sessionDurations(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byTs))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy("user_id", "session_id")
      .agg((max(col("us")) - min(col("us"))).as("dur_us"),
           count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(sum(col("dur_us")).as("total_session_us"),
           max(col("dur_us")).as("longest_session_us"),
           count(lit(1)).as("n_sessions"))
      .orderBy("user_id")
  }

  /** q110: time-decayed engagement per user — each event's value decays
    * by a daily half-life (weight 2^-⌊age_days⌋ relative to the
    * corpus's newest event), the standard recency-weighted feature for
    * training-data user/source scoring. Day-floored powers of two keep
    * every weight EXACT in double (no libm exp/pow in the plan), so the
    * only float hazard is summation order — pinned by folding each
    * user's weighted values in (ts, event_id) order (the q87 contract).
    * Raw totals use the cents-exact q51 convention.
    *
    * Scale shape: the global max timestamp is one broadcast scalar row;
    * everything else is narrow per-row arithmetic plus ONE groupBy with
    * a per-user bounded collect. Ages ≥ 63 days clamp to weight 0
    * (shift-width guard; at a daily half-life they are ≈ 0 anyway).
    */
  def decayedEngagement(events: DataFrame): DataFrame = {
    val mx = events.agg(max(unix_micros(col("ts"))).as("max_us"))
    val weighted = events
      .withColumn("us", unix_micros(col("ts")))
      .crossJoin(broadcast(mx))
      .withColumn("age_days", expr("(max_us - us) div 86400000000"))
      .withColumn("wv",
        when(col("age_days") >= 63, lit(0.0))
          .otherwise(col("value") /
            expr("shiftleft(1L, cast(age_days as int))").cast("double")))
    weighted
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("age_days")).as("last_seen_days"),
        (sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0).as("total_value"),
        (round(aggregate(
          array_sort(collect_list(struct(col("us"), col("event_id"), col("wv")))),
          lit(0.0), (acc, x) => acc + x.getField("wv")), 4) + lit(0.0)).as("decayed_value"))
      .withColumn("total_value", round(col("total_value"), 2))
      .orderBy("user_id")
  }

  /** q112: first-order Markov transition matrix over each user's event
    * stream — P(next event type | current), the sequence-mining summary
    * behind funnel and anomaly dashboards (a transition that drifts is
    * a product change or a bot). One lead() per user-ordered stream,
    * then an integer count matrix; probabilities are one ratio of
    * counts (deterministic). The event order is (ts, event_id) with ts
    * at µs truncation — the q40 ordering contract, so both engines walk
    * identical sequences even for sub-µs neighbors.
    *
    * Scale shape: ONE shuffle on user_id for the lead window, then a
    * types×types-sized aggregation (map-side combined) — the matrix is
    * tiny regardless of corpus size, and the per-row window carries no
    * unbounded state.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")), col("event_id"))
    val counts = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("n_from", sum(col("n")).over(Window.partitionBy("from_type")))
      .withColumn("p", round(col("n") / col("n_from").cast("double"), 4))
      .orderBy("from_type", "to_type")
  }

  /** q115: winsorized (robust) per-type value stats — p05/p95 exact
    * interpolated percentiles, the raw mean, and the mean after
    * clipping to [p05, p95]. The outlier-robust preprocessing step for
    * any numeric feature column: a raw mean a few bots can drag is
    * reported next to the clipped one.
    *
    * Determinism: the raw mean is cents-exact (q51 convention); the
    * percentile interpolation is the q85 contract; the clipped sum
    * folds per type in (event_id)-pinned order because clipped values
    * inherit the percentile cut's full double precision.
    *
    * Scale shape: cuts are one aggregation to a types-sized broadcast
    * table; the clip pass is narrow per-row work.
    */
  def winsorizedStats(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"), col("event_id"), col("value"))
    val counts = e.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
    // interpolated percentile computed EXPLICITLY (vl + (vu − vl)·frac
    // over the two bracketing order statistics) so both engines run the
    // identical double expression — builtin percentile implementations
    // are free to interpolate as (1−g)·l + g·u, which differs in ulps
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val ranked = e.withColumn("rn", row_number().over(w).cast("long") - 1)
      .join(broadcast(counts.select("event_type", "n")), "event_type")
    def cut(q: Double, name: String): DataFrame = {
      val h = (col("n") - 1) * lit(q)
      ranked.filter(col("rn") === floor(h) || col("rn") === ceil(h))
        .groupBy("event_type")
        .agg(max(when(col("rn") === floor((col("n") - 1) * lit(q)), col("value"))).as("vl"),
          max(when(col("rn") === ceil((col("n") - 1) * lit(q)), col("value"))).as("vu"),
          max((col("n") - 1) * lit(q)).as("h"))
        .select(col("event_type"),
          (col("vl") + (col("vu") - col("vl")) * (col("h") - floor(col("h")))).as(name))
    }
    val cuts = counts.join(cut(0.05, "p05"), "event_type").join(cut(0.95, "p95"), "event_type")
    e.join(broadcast(cuts), "event_type")
      .withColumn("cv", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy("event_type")
      .agg(max(col("n")).as("n_events"),
        round(max(col("cents")) / 100.0 / max(col("n")), 4).as("raw_mean"),
        round(max(col("p05")), 4).as("p05"),
        round(max(col("p95")), 4).as("p95"),
        (round(aggregate(
          array_sort(collect_list(struct(col("event_id"), col("cv")))),
          lit(0.0), (acc, x) => acc + x.getField("cv")) / max(col("n")), 4) + lit(0.0))
          .as("winsor_mean"))
      .orderBy("event_type")
  }

  /** q125: daily rate-spike detection — per event type, each day's count
    * z-scored against the trailing `window` days (the crawl/ingest
    * health alarm: a type whose volume jumps >2σ is a bot, an outage,
    * or a release). Warm-up days (< 3 prior days) are excluded.
    *
    * Determinism: the trailing moments are integer sums over ≤ `window`
    * integer day-counts, and z's numerator k·n − Σc stays integer, so
    * z = (k·n − Σc)/√(k·Σc² − (Σc)²) is two correctly-rounded IEEE ops
    * — identical on both engines. σ = 0 windows: z = 0 when the day
    * equals the constant, NULL-z + spike flag when it deviates.
    *
    * Scale shape: one map-side-combined (type, day) count — the only
    * shuffle — then a window over (types × days) rows, partitioned by
    * type. The fact table never enters a window.
    */
  def rateSpikes(events: DataFrame, window: Int = 7, zThresh: Double = 2.0): DataFrame = {
    val daily = events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-window, -1)
    daily
      .withColumn("n_prev", count(col("n")).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .filter(col("n_prev") >= 3)
      .withColumn("var_num", col("n_prev") * col("s2") - col("s1") * col("s1"))
      .withColumn("z",
        when(col("var_num") === 0L,
          when(col("n") * col("n_prev") === col("s1"), lit(0.0)).otherwise(lit(null).cast("double")))
        .otherwise(round((col("n") * col("n_prev") - col("s1")).cast("double") /
                         sqrt(col("var_num").cast("double")), 4)))
      .withColumn("is_spike",
        when(col("var_num") === 0L, col("n") * col("n_prev") =!= col("s1"))
          .otherwise(abs(col("z")) >= zThresh))
      .select(col("event_type"), col("day"), col("n"), col("n_prev"),
        round(col("s1") / col("n_prev").cast("double"), 4).as("mean_prev"),
        col("z"), col("is_spike"))
      .orderBy("event_type", "day")
  }

  /** q137: robust outlier audit — per event type, median and MAD
    * (median absolute deviation) of `value`, and the count of events
    * beyond k·MAD. The outlier detector that survives what q115's
    * winsorized mean documents: a heavy tail wrecks mean/σ z-scores,
    * while median/MAD stay put (the robust-statistics default).
    *
    * Determinism: both medians use the explicit (vl+vu)/2 bracketing
    * form (exact for odd n, the standard interpolation for even n),
    * deviations are identical double expressions on both engines, and
    * the k·MAD comparison runs on those identical doubles. MAD = 0
    * degenerates to "any deviation flags" — the conventional reading.
    *
    * Scale shape: two rank passes partitioned by type (the q115 order-
    * statistic machinery) plus narrow flag arithmetic; the output is
    * types-sized.
    */
  def madOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    val e = events.select(col("event_type"), col("event_id"), col("value"))
    def medianOf(df: DataFrame, valueCol: String, name: String): DataFrame = {
      val counts = df.groupBy("event_type").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy(col(valueCol), col("event_id"))
      val h = (col("n") - 1) * lit(0.5)
      df.withColumn("rn", row_number().over(w).cast("long") - 1)
        .join(broadcast(counts), "event_type")
        .filter(col("rn") === floor(h) || col("rn") === ceil(h))
        .groupBy("event_type")
        .agg(max(when(col("rn") === floor((col("n") - 1) * lit(0.5)), col(valueCol))).as("vl"),
          max(when(col("rn") === ceil((col("n") - 1) * lit(0.5)), col(valueCol))).as("vu"))
        .select(col("event_type"), ((col("vl") + col("vu")) / 2).as(name))
    }
    val med = medianOf(e, "value", "med")
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = medianOf(dev.select(col("event_type"), col("event_id"), col("adev")), "adev", "mad")
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(max(col("med")), 4).as("median"),
        round(max(col("mad")), 4).as("mad"),
        sum(when(col("adev") > lit(k) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_rate",
        round(col("n_outliers") / col("n_events").cast("double"), 4))
      .orderBy("event_type")
  }

  /** q135: cohort retention — users bucketed by first-seen week, then
    * the fraction of each cohort active in each subsequent week-offset.
    * The product-health matrix every event pipeline ships; a cohort
    * whose week-1 retention drops after a release is the canonical
    * regression signal.
    *
    * Determinism: days are integer µs floor-divs (the q110 age
    * convention), cohort/offset are integer floor-divs of those, and
    * retention is one closing division of integer counts.
    *
    * Scale shape: first-seen is one map-side-combined min per user; the
    * re-join is user-keyed (same key as the groupBy — the shuffle
    * partitioning is reusable); the matrix is cohorts × offsets rows.
    */
  def cohortRetention(events: DataFrame, bucketDays: Int = 7): DataFrame = {
    val e = events.select(col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day"))
    val first = e.groupBy("user_id").agg(min(col("day")).as("first_day"))
    val active = e.join(first, "user_id")
      .select(col("user_id"),
        expr(s"first_day div $bucketDays").as("cohort"),
        expr(s"(day - first_day) div $bucketDays").as("offset"))
      .distinct()
    val sizes = first
      .groupBy(expr(s"first_day div $bucketDays").as("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    active.groupBy("cohort", "offset").agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort")
      .withColumn("retention",
        round(col("n_active") / col("cohort_users").cast("double"), 4))
      .orderBy("cohort", "offset")
  }

  /** q130: association rules over user event baskets — for every event-
    * type pair, support / confidence (both directions) / lift from the
    * per-user distinct-type sets. The market-basket view of a product
    * event stream: lift ≫ 1 pairs are the co-occurring behaviors a
    * recommender or funnel designer wants surfaced.
    *
    * Scale shape: the basket table is distinct (user, type) — one
    * map-side-combined shuffle on user_id — and the pair expansion is a
    * per-user self-join bounded by types² per user (event-type
    * vocabulary, not event volume). All moments are integer counts;
    * confidence and lift are closing divisions.
    */
  def associationRules(events: DataFrame, minUsers: Long = 5L): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val pairs = ut.as("a")
      .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ante"), col("b.event_type").as("cons"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minUsers)
    val singles = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val total = ut.select("user_id").distinct().agg(count(lit(1)).as("n_users"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("ante"), col("n").as("n_a"))), "ante")
      .join(broadcast(singles.select(col("event_type").as("cons"), col("n").as("n_b"))), "cons")
      .crossJoin(broadcast(total))
      .select(col("ante"), col("cons"), col("n_both"), col("n_a"), col("n_b"),
        round(col("n_both") / col("n_users").cast("double"), 4).as("support"),
        round(col("n_both") / col("n_a").cast("double"), 4).as("conf_a_to_b"),
        round(col("n_both") / col("n_b").cast("double"), 4).as("conf_b_to_a"),
        round((col("n_both") * col("n_users")).cast("double") /
              (col("n_a") * col("n_b")), 4).as("lift"))
      .orderBy("ante", "cons")
  }

  /** q116: top session paths — sessionize (the q14/q40 gap rule), take
    * each session's first `headLen` event types in stream order, and
    * count sessions per path string. The classic "how do users actually
    * move" report; a path whose frequency jumps is a bot signature.
    *
    * Scale shape: the session assignment is the one user-keyed window
    * shuffle q40 already pays; the per-session head is row_number ≤ k
    * (WindowGroupLimit), so no unbounded per-session state; the path
    * count is a tiny aggregation over path strings.
    */
  def topSessionPaths(events: DataFrame, gapSeconds: Long = 1800L,
                      headLen: Int = 5, k: Int = 20): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    val sessions = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byTs))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum))
    val inSession = Window.partitionBy("user_id", "session_id")
      .orderBy(col("us"), col("event_id"))
    sessions
      .withColumn("rn", row_number().over(inSession))
      .filter(col("rn") <= headLen)
      .groupBy("user_id", "session_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("us"), col("event_id"), col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(k)
  }

  /** q114: ordered funnel conversion — users who did stage 1, then
    * stage 2 strictly after their first stage-1 event, then stage 3
    * strictly after that first qualifying stage-2 event. The
    * first-touch semantics ("after the FIRST qualifying prior stage")
    * make the count well-defined without scanning subsequences.
    *
    * Scale shape: one min-aggregation per stage, each keyed on
    * user_id — co-partitioned joins, no window over the full stream,
    * no per-user state beyond one timestamp. Times compare at the µs
    * truncation on both engines (q40 contract).
    */
  def funnelConversion(events: DataFrame,
                       stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val s0 = e.filter(col("event_type") === stages(0))
      .groupBy("user_id").agg(min("us").as("t0"))
    val s1 = e.filter(col("event_type") === stages(1)).join(s0, "user_id")
      .filter(col("us") > col("t0")).groupBy("user_id").agg(min("us").as("t1"))
    val s2 = e.filter(col("event_type") === stages(2)).join(s1, "user_id")
      .filter(col("us") > col("t1")).groupBy("user_id").agg(min("us").as("t2"))
    val counts = s0.agg(count(lit(1)).as("n0"))
      .crossJoin(s1.agg(count(lit(1)).as("n1")))
      .crossJoin(s2.agg(count(lit(1)).as("n2")))
    val stageRows = Seq(
      (lit(1L), lit(stages(0)), col("n0"), lit(1.0), lit(1.0)),
      (lit(2L), lit(stages(1)), col("n1"),
        round(col("n1") / col("n0").cast("double"), 4),
        round(col("n1") / col("n0").cast("double"), 4)),
      (lit(3L), lit(stages(2)), col("n2"),
        round(col("n2") / col("n1").cast("double"), 4),
        round(col("n2") / col("n0").cast("double"), 4)))
    stageRows.map { case (i, nm, n, cp, cf) =>
      counts.select(i.as("stage"), nm.as("stage_name"), n.as("n_users"),
        cp.as("conv_from_prev"), cf.as("conv_from_first"))
    }.reduce(_ unionByName _).orderBy("stage")
  }

  /** W2 (email_providers.py:345,485-489): top-N rows with the overall
    * count alongside, so the "…k more" footer is derivable. Ranking on
    * cents-exact totals keeps the cut deterministic.
    */
  def topSpenders(orders: DataFrame, n: Int = 20): DataFrame = {
    val totals = orders.groupBy("o_custkey")
      .agg(moneySum(col("o_totalprice")).as("total_spent"),
           count(lit(1)).as("n_orders"))
    val overall = totals.agg(count(lit(1)).as("total_customers"))
    totals.orderBy(col("total_spent").desc, col("o_custkey"))
      .limit(n)
      .crossJoin(broadcast(overall))
      .orderBy(col("total_spent").desc, col("o_custkey"))
  }

  /** §2.7 intersect: entities present in both activity sources. */
  def activeInBoth(orders: DataFrame, events: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("id")).distinct()
      .intersect(events.select(col("user_id").as("id")).distinct())
      .orderBy("id")

  /** §2.7 union (utils.py:178-183 accumulate across sources): tagged
    * unionByName + per-source counts.
    */
  def taggedUnionCounts(orders: DataFrame, events: DataFrame, li: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("id")).withColumn("src", lit("orders"))
      .unionByName(events.select(col("user_id").as("id")).withColumn("src", lit("events")))
      .unionByName(li.select(col("l_orderkey").as("id")).withColumn("src", lit("lineitem")))
      .groupBy("src")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("id")).as("n_ids"))
      .orderBy("src")

  /** W4/W5 (survey.py:52-104 column_sorter / ROW_SORT_KEYS): survey
    * report with computed multi-key row ordering and a dense rank over
    * the primary grouping — presentation-layer ordering as part of the
    * plan, not a post-process.
    */
  def surveyReport(orders: DataFrame): DataFrame = {
    // unpartitioned rank over a BOUNDED frame: the window input is the
    // post-aggregate status x priority grid (<= 15 rows), never orders
    val w = Window.orderBy(col("o_orderstatus"), col("o_orderpriority"))
    orders
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice")).as("total_price"))
      .withColumn("report_rank", dense_rank().over(w).cast("long"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** q146: gaps-and-islands per user — runs of consecutive active days
    * (islands) and the silences between them (gaps), the classic
    * retention-quality profile that [[cohortRetention]]'s matrix can't
    * see (a user active on days 1 and 28 is not "retained for a month").
    *
    * The island key is the textbook trick: day_index − row_number is
    * constant within a consecutive run, so islands fall out of ONE
    * narrow window over distinct (user, day) pairs — no self-join, no
    * spine table. Gaps derive from island boundaries (lead(start) −
    * end − 1) over the islands-sized frame. Both windows partition by
    * user, so they parallelize across the user key space; everything is
    * exact integer day arithmetic.
    */
  def activityIslands(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min(col("day")).as("start"), max(col("day")).as("end"))
    val iw = Window.partitionBy("user_id").orderBy("start")
    islands
      .withColumn("gap", lead(col("start"), 1).over(iw) - col("end") - 1)
      .groupBy("user_id")
      .agg(sum(col("len")).as("active_days"),
        count(lit(1)).as("n_islands"),
        max(col("len")).as("longest_run"),
        coalesce(max(col("gap")), lit(0L)).cast("long").as("longest_gap"))
      .orderBy("user_id")
  }

  /** q147: day-of-week seasonality with a chi-square uniformity score
    * per event type. The χ² numerator stays EXACT INTEGER by
    * cross-multiplying (Σ(7·n_d − T)² over the dense 7-cell grid — a
    * zero-count weekday contributes T², which is why the grid must be
    * densified with a literal spine, not just the observed cells);
    * the single division happens once at the end. Day-of-week is epoch
    * arithmetic (days-since-1970 mod 7), immune to engine locale/
    * first-day-of-week conventions.
    */
  def dowSeasonality(events: DataFrame): DataFrame = {
    val counts = events.select(col("event_type"),
        (datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")) % 7).as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
    val dense = counts.select("event_type").distinct()
      .select(col("event_type"), explode(sequence(lit(0), lit(6))).as("dow"))
      .join(counts, Seq("event_type", "dow"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val totals = dense.groupBy("event_type").agg(sum(col("n")).as("total"))
    dense.join(totals, Seq("event_type"))
      .withColumn("dev", lit(7L) * col("n") - col("total"))
      .groupBy("event_type")
      .agg(max(col("total")).as("total"), sum(col("dev") * col("dev")).as("chi2_num"))
      .select(col("event_type"), col("total"),
        round(col("chi2_num") / (lit(7.0) * col("total")), 4).as("chi2"))
      .orderBy("event_type")
  }

  /** q148: A/B experiment read-out — users hash-split into two arms
    * (md5, deterministic and engine-portable like the corpus samplers),
    * conversion = "`convType` makes up at least 1/4 of the user's
    * events" (exact integer compare `4·c ≥ t`, so the definition is
    * scale-invariant: on synthetic data where every user eventually
    * emits every event type, mere presence converges to 100% as SF
    * grows and the pooled z-test degenerates to 0/0 — a share
    * threshold keeps real variation at every SF). Compared with a
    * pooled two-proportion z-test; counts are exact integers; the z
    * statistic is ONE identical arithmetic expression on both engines
    * (single sqrt, single division), rounded to 4, with the p∈{0,1}
    * degenerate denominator nulled rather than ANSI-faulted.
    *
    * Scale shape: conversion and arm assignment ride ONE groupBy on
    * the user key (no join at all — the flag is an aggregate over the
    * user's own events); the z-test runs on a 1-row frame.
    */
  def abTestReport(events: DataFrame, convType: String = "purchase"): DataFrame = {
    val users = events.groupBy("user_id").agg(
        count(lit(1)).as("t"),
        sum(when(col("event_type") === convType, 1L).otherwise(0L)).as("cv"))
      .select(
        when(md5(concat(lit("ab|"), col("user_id"))) < "8", lit("A")).otherwise(lit("B")).as("arm"),
        when(col("cv") * 4 >= col("t"), 1L).otherwise(0L).as("converted"))
    val byArm = users.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
    val one = byArm.agg(
      sum(when(col("arm") === "A", col("n"))).as("n_a"),
      sum(when(col("arm") === "A", col("c"))).as("conv_a"),
      sum(when(col("arm") === "B", col("n"))).as("n_b"),
      sum(when(col("arm") === "B", col("c"))).as("conv_b"))
    val p = (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b"))
    val den = sqrt(p * (lit(1) - p) * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    one.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(col("conv_a") / col("n_a"), 4).as("rate_a"),
      round(col("conv_b") / col("n_b"), 4).as("rate_b"),
      round(
        (col("conv_a") / col("n_a") - col("conv_b") / col("n_b")) /
          when(den === 0, lit(null)).otherwise(den), 4).as("z"))
  }

  /** q149: CUPED variance reduction on top of q148's arm split
    * (Deng et al. 2013, "Improving the Sensitivity of Online Controlled
    * Experiments by Utilizing Pre-Experiment Data"): covariate x = the
    * user's event count in the FIRST half of the observed span, metric
    * y = the count in the second half. θ = cov(x,y)/var(x) is estimated
    * POOLED (the standard form), and the arm effect is reported raw and
    * CUPED-adjusted: Δ_cuped = Δ_y − θ·Δ_x.
    *
    * Determinism: x and y are integer counts; every Pearson moment is
    * an exact integer sum (q122 convention), θ and the deltas are
    * closed-form doubles over those sums, rounded once. Degenerate
    * var(x) = 0 reports NULL θ/Δ_cuped rather than an ANSI fault.
    *
    * Scale shape: the span midpoint is a 1-row broadcast; per-user
    * counts are ONE groupBy over the fact table; everything after runs
    * on a users-sized frame and the final z is a 1-row reduce.
    */
  def cupedAbTest(events: DataFrame): DataFrame = {
    val day = datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long")
    val days = events.select(day.as("day"))
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(expr("(d0 + d1 + 1) div 2").as("mid"))
    val perUser = events.select(col("user_id"), day.as("day"))
      .crossJoin(broadcast(days))
      .groupBy("user_id").agg(
        sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("x"),
        sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("y"))
      .withColumn("arm",
        when(md5(concat(lit("ab|"), col("user_id"))) < "8", lit("A")).otherwise(lit("B")))
    val m = perUser.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("x"))).as("sx_a"),
      sum(when(col("arm") === "A", col("y"))).as("sy_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "B", col("x"))).as("sx_b"),
      sum(when(col("arm") === "B", col("y"))).as("sy_b"))
    val varX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val covXY = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val theta = covXY / when(varX === 0d, lit(null)).otherwise(varX)
    val dX = col("sx_b") / col("n_b") - col("sx_a") / col("n_a")
    val dY = col("sy_b") / col("n_b") - col("sy_a") / col("n_a")
    m.select(col("n_a"), col("n_b"),
      round(theta, 4).as("theta"),
      round(dY, 4).as("diff_raw"),
      round(dY - theta * dX, 4).as("diff_cuped"))
  }

  /** q162: Benford first-digit audit over transaction amounts — the
    * classic fraud / synthetic-data smell test. Amounts go through
    * exact integer cents first (round-half-up on the raw double is
    * deterministic given identical parquet bytes), and the leading
    * digit is string arithmetic on that integer — no log10 near a
    * power-of-ten boundary, where cross-engine ULP drift could flip
    * the digit. The expected Benford mass ln(1+1/d)/ln(10) and the
    * observed share are identical pinned expressions on both engines.
    *
    * Scale shape: one map-side-combined groupBy on a 9-value key; the
    * digit spine is a literal sequence so zero-count digits still
    * report (the q147 densify convention); the total is a broadcast
    * 1-row frame.
    */
  def benfordAudit(events: DataFrame): DataFrame = {
    val digits = events
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = events.sparkSession.range(1, 10).select(col("id").cast("int").as("digit"))
    val total = digits.agg(sum("n").as("total"))
    spine.join(digits, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(expr("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)"), 4).as("share"),
        round(expr("ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)"), 4).as("benford"),
        round(expr(
          "CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)"),
          4).as("excess"))
      .orderBy("digit")
  }

  /** q163: classical seasonal decomposition of the daily event series —
    * count = trend (centered 7-day moving average) + day-of-week
    * component + residual — with anomaly flags on days whose residual
    * exceeds 20% of the overall mean. The additive decomposition is
    * what rate-spike alerting (q125) graduates into once a series has
    * weekly structure: a Sunday dip is SEASONAL, not an incident.
    *
    * All inputs are exact integer daily counts (densified over the
    * min..max day spine so silent gap days surface as anomalies, not
    * missing rows); trend/dow means are integer-sum ÷ count divisions
    * pinned to the same shape on both engines; dow is epoch-day mod 7
    * (q147 convention — no locale).
    *
    * Scale shape: ONE shuffle (groupBy day); everything after is
    * days-sized — the moving-average window and dow rollup run on a
    * frame with one row per day, never per event.
    */
  def seasonalDecomposition(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("dow", col("day") % 7)
    val wMa = Window.orderBy("day").rowsBetween(-3, 3)
    val trended = dense
      .withColumn("trend_s", sum("n").over(wMa))
      .withColumn("trend_c", count(lit(1)).over(wMa))
    val dowMeans = dense.groupBy("dow").agg(
      sum("n").as("dow_s"), count(lit(1)).as("dow_c"))
    val overall = dense.agg(sum("n").as("all_s"), count(lit(1)).as("all_c"))
    trended
      .join(broadcast(dowMeans), Seq("dow"))
      .crossJoin(broadcast(overall))
      .withColumn("trend", expr("CAST(trend_s AS DOUBLE) / CAST(trend_c AS DOUBLE)"))
      .withColumn("seasonal", expr(
        "CAST(dow_s AS DOUBLE) / CAST(dow_c AS DOUBLE) - CAST(all_s AS DOUBLE) / CAST(all_c AS DOUBLE)"))
      .withColumn("resid", expr("CAST(n AS DOUBLE) - trend - seasonal"))
      .select(col("day"), col("dow"), col("n"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("resid"), 4).as("resid"),
        (abs(col("resid")) > expr("0.2 * CAST(all_s AS DOUBLE) / CAST(all_c AS DOUBLE)"))
          .as("is_anomaly"))
      .orderBy("day")
  }

  /** q167: stationary distribution of the event-type Markov chain —
    * where user sessions spend their time in the long run, the
    * steady-state view of q112's one-step transition matrix. Useful
    * as a drift monitor: the stationary mass moving between releases
    * means navigation structure changed even if raw event counts
    * didn't.
    *
    * EXACT-INTEGER power iteration (the q143 fixed-point convention):
    * mass starts at 10^12 div k and each step moves
    * (v_i · c_ij) div c_i· per cell — integer arithmetic, summation-
    * order-independent, so both engines (and any partitioning) agree
    * bit-for-bit on the mass vector; the only doubles are the final
    * normalized shares. Driver-side BigInt keeps the products exact
    * past int64 at corpus scale.
    *
    * Scale shape: the corpus-sized work is the q112 anatomy — one
    * user-window pass and one groupBy on (from,to). The iteration
    * runs on the COLLECTED |event_types|² matrix, the legitimate
    * model-sized collect (q129 precedent): k is schema-bounded, never
    * data-bounded.
    */
  def markovStationary(events: DataFrame, iters: Int = 12): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")), col("event_id"))
    val counts = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val states = counts.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val c = Array.ofDim[Long](k, k)
    counts.foreach(r => c(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
    val rowSum = c.map(_.sum)
    var v = Array.fill(k)(1000000000000L / k)
    for (_ <- 1 to iters) {
      val nv = Array.fill(k)(0L)
      for (i <- 0 until k; j <- 0 until k if c(i)(j) != 0L && rowSum(i) != 0L)
        nv(j) += (BigInt(v(i)) * c(i)(j) / rowSum(i)).toLong
      v = nv
    }
    val sumV = v.sum
    val rows = states.zipWithIndex.map { case (s, i) =>
      (s, v(i), BigDecimal(v(i).toDouble / sumV.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val spark = events.sparkSession
    import spark.implicits._
    rows.toSeq.toDF("state", "mass", "p").orderBy("state")
  }

  /** q328: ENTROPY RATE of the event-transition Markov chain — the
    * information-theoretic capstone of the chain family: q112 measures
    * the transitions, q167 finds where the chain LIVES (stationary π),
    * this says how PREDICTABLE it is there — H = Σᵢ πᵢ·H(next|state=i)
    * nats/step (Shannon). Near ln(k) means user flows are noise; near 0
    * means deterministic funnels — the one number that decides whether
    * sequence features (q225/q255) carry any signal worth modeling.
    *
    * Exactness: per-cell surprisal ln(n_from/n) floor-quantizes to
    * integer micro-nats (the q187 device), per-state conditional
    * entropy and the π-weighted total are then pure integer floor
    * divisions (all operands non-negative — truncation == floor on
    * both engines), with the q167 stationary mass reused verbatim.
    * Scale: the corpus collapses to the k×k transition frame in the
    * one q167 pass; everything after is model-sized (the same
    * justified driver-side bounded iteration as q167).
    */
  def markovEntropyRate(events: DataFrame, iters: Int = 12): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")), col("event_id"))
    val counts = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val states = counts.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val c = Array.ofDim[Long](k, k)
    counts.foreach(r => c(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
    val rowSum = c.map(_.sum)
    var v = Array.fill(k)(1000000000000L / k)
    for (_ <- 1 to iters) {
      val nv = Array.fill(k)(0L)
      for (i <- 0 until k; j <- 0 until k if c(i)(j) != 0L && rowSum(i) != 0L)
        nv(j) += (BigInt(v(i)) * c(i)(j) / rowSum(i)).toLong
      v = nv
    }
    val sumV = v.sum
    val hMicro = (0 until k).map { i =>
      if (rowSum(i) == 0L) 0L
      else {
        val num = (0 until k).map { j =>
          if (c(i)(j) == 0L) BigInt(0)
          else BigInt(c(i)(j)) * math.floor(
            math.log(rowSum(i).toDouble / c(i)(j).toDouble) * 1e6).toLong
        }.sum
        (num / rowSum(i)).toLong
      }
    }
    val contrib = (0 until k).map(i => (BigInt(v(i)) * hMicro(i) / sumV).toLong)
    val rate = contrib.sum
    val spark = events.sparkSession
    import spark.implicits._
    states.zipWithIndex.map { case (s, i) =>
      (s, rowSum(i), v(i), hMicro(i), contrib(i), rate)
    }.toSeq.toDF("state", "n_out", "mass", "h_micro", "contrib_micro", "rate_micro")
      .orderBy("state")
  }

  /** q171: Kaplan-Meier time-to-conversion curve — survival S(t) over
    * "days from a user's first event to their first `purchase`",
    * right-censoring users who never purchase at their full observed
    * span (their conversion time is a lower bound, not a failure to
    * convert). The product-limit estimator S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)
    * runs in SCALED-INTEGER arithmetic (units of 1e-9, the q143/q167
    * integer-iteration convention): sᵢ = sᵢ₋₁·(nᵢ−dᵢ) // nᵢ, a defined
    * deterministic quantity with no float-summation order to pin
    * across engines — the floor loses < 1e-9 per step, invisible at
    * the 6-decimal output rounding.
    *
    * Scale shape: ONE corpus-sized groupBy collapses events to per-user
    * (first event, first purchase) pairs; those collapse again to the
    * per-duration (n_at, deaths) frame, whose cardinality is bounded by
    * the horizon in DAYS — independent of corpus size — so the risk-set
    * window and the driver-side product recurrence (BigInt, exact) are
    * model-sized (q129/q167 collect convention). The oracle replays the
    * identical recurrence as a recursive CTE in HUGEINT.
    */
  def kaplanMeier(events: DataFrame, convertType: String = "purchase"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val mx = events.agg(max(unix_micros(col("ts"))).as("max_us"))
    val perDur = events
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("first_us"),
           min(when(col("event_type") === convertType, unix_micros(col("ts"))))
             .as("conv_us"))
      .crossJoin(broadcast(mx))
      .select(
        when(col("conv_us").isNotNull,
          expr("(conv_us - first_us) div 86400000000"))
          .otherwise(expr("(max_us - first_us) div 86400000000")).as("dur_days"),
        when(col("conv_us").isNotNull, 0L).otherwise(1L).as("censored"))
      .groupBy("dur_days")
      .agg(count(lit(1)).as("n_at"), sum(lit(1L) - col("censored")).as("d"))
    val pts = perDur
      .withColumn("n_risk", sum("n_at").over(Window.orderBy(col("dur_days").desc)))
      .select("dur_days", "n_risk", "d")
      .orderBy("dur_days")
      .collect()
    var s = BigInt(1000000000L)
    val rows = pts.toSeq.map { r =>
      val (t, n, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      s = s * BigInt(n - d) / BigInt(n) // d = 0 divides exactly: s unchanged
      (t, n, d, s.toLong)
    }.filter(_._3 > 0)
    rows.toDF("dur_days", "n_risk", "n_events", "surv_scaled")
      .withColumn("survival", round(col("surv_scaled") / 1000000000.0, 6))
      .orderBy("dur_days")
  }

  /** q173: population-stability-index drift report — the model-ops
    * metric for "has this feature's distribution shifted", here
    * `value` banded (the q164 bands) and compared between the first
    * and second half of the observation window. Per-band contribution
    * psiᵢ = (pᵢ − qᵢ)·ln(pᵢ/qᵢ) with add-one smoothing so empty bands
    * stay finite (the standard PSI epsilon, made exact and
    * engine-portable). Emitted PER BAND (the q165 `mi_part`
    * convention) — the total is the reader's trivial sum, and the
    * output carries the exact integer counts it derives from.
    *
    * Scale shape: the window midpoint is one broadcast scalar; then ONE
    * corpus scan with conditional integer sums per band (map-side
    * combined); the band-count window runs over the bounded band frame.
    * All doubles are per-row expressions from exact integers — no
    * float summation anywhere.
    */
  def psiDrift(events: DataFrame): DataFrame = {
    val b = events.agg(min(unix_micros(col("ts"))).as("min_us"),
                       max(unix_micros(col("ts"))).as("max_us"))
    val cells = events
      .crossJoin(broadcast(b))
      .withColumn("cur", (unix_micros(col("ts")) >=
        expr("min_us + (max_us - min_us) div 2")).cast("long"))
      .groupBy(expr("CAST(floor(value / 50.0) AS INT)").as("band"))
      .agg(sum(lit(1L) - col("cur")).as("n_ref"), sum("cur").as("n_cur"))
    val w = Window.partitionBy(lit(1))
    cells
      .withColumn("tot_ref", sum("n_ref").over(w))
      .withColumn("tot_cur", sum("n_cur").over(w))
      .withColumn("n_bands", count(lit(1)).over(w))
      .select(col("band"), col("n_ref"), col("n_cur"),
        round(expr(
          """((CAST(n_ref + 1 AS DOUBLE) / (tot_ref + n_bands))
            |  - (CAST(n_cur + 1 AS DOUBLE) / (tot_cur + n_bands)))
            | * ln((CAST(n_ref + 1 AS DOUBLE) / (tot_ref + n_bands))
            |     / (CAST(n_cur + 1 AS DOUBLE) / (tot_cur + n_bands)))""".stripMargin), 6)
          .as("psi_part"))
      .orderBy("band")
  }

  /** q225: SEQUENCE-PATTERN matching over per-user event histories —
    * the MATCH_RECOGNIZE capability Spark lacks, composed from
    * builtins: each user's history collapses to a compact symbol
    * string (one initial per event — the five event types have
    * distinct initials — ordered by (ts, event_id)), and behavioral
    * patterns become plain regexes evaluated by the codegen'd
    * `regexp_count`. Reported per pattern: users with ≥1 match and
    * total non-overlapping matches.
    *
    * Patterns: view→clicks→purchase runs (`vc*p`), error bursts
    * (`e{2,}`), signup bounce straight to an error (`se`).
    *
    * Scale shape: ONE shuffle to assemble per-user strings (map-side
    * struct collect; a user's history is bounded, the corpus isn't),
    * then a 3-row broadcast of patterns and a map-side-combined
    * aggregate. The symbol string is the whole point: 90 events become
    * 90 bytes, so a billion users' histories are regex-scanned as a
    * few GB of strings, not re-joined event rows.
    */
  def sequenceMatch(events: DataFrame,
                    patterns: Seq[String] = Seq("vc*p", "e{2,}", "se")): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val seqs = events
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), substring(col("event_type"), 1, 1).as("i")).as("s"))
      .groupBy("user_id")
      .agg(expr("array_join(transform(sort_array(collect_list(s)), x -> x.i), '')").as("seq"))
    seqs.crossJoin(broadcast(patterns.toDF("pattern")))
      .select(col("pattern"), expr("regexp_count(seq, pattern)").cast("long").as("n"))
      .groupBy("pattern")
      .agg(sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_users"),
        sum("n").as("n_matches"))
      .orderBy("pattern")
  }

  /** q254: INTER-EVENT REGULARITY bands (bot screening) — per user, the
    * coefficient of variation of gaps between consecutive events, as
    * the exact identity cv² = (n·Σg² − (Σg)²)/(Σg)²: machine-like
    * accounts fire on a clock (cv ≈ 0), humans are bursty. Users with
    * ≥ 2 gaps band into regular (cv < 0.1) / normal (< 0.5) / bursty,
    * compared entirely by integer cross-multiplication — gaps are
    * exact epoch-µs, squares ride decimal(38,0) (HUGEINT in the
    * oracle, the q199 convention), no sqrt or float division anywhere.
    *
    * Scale: one lag window per user (the A4 sessionization shuffle),
    * collapsing immediately to 3 per-user integers; the band histogram
    * is map-side.
    */
  def regularityBands(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gaps = events.select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("g", col("us") - lag(col("us"), 1).over(w))
      .filter(col("g").isNotNull)
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("ng"), sum("g").as("sg"),
        sum(expr("cast(g as decimal(38,0)) * g")).as("sg2"))
      .filter(col("ng") >= 2)
      .select(
        when(expr("sg = 0"), "regular")
          .when(expr("(cast(ng as decimal(38,0)) * sg2 - cast(sg as decimal(38,0)) * sg) * 100 " +
            "< cast(sg as decimal(38,0)) * sg"), "regular")
          .when(expr("(cast(ng as decimal(38,0)) * sg2 - cast(sg as decimal(38,0)) * sg) * 4 " +
            "< cast(sg as decimal(38,0)) * sg"), "normal")
          .otherwise("bursty").as("band"))
      .groupBy("band").agg(count(lit(1)).as("n_users"))
      .orderBy("band")
  }

  /** q255: FREQUENT 3-EVENT SEQUENCES (PrefixSpan-lite) — consecutive
    * event-type triples per user history, ranked by user support then
    * total occurrences: the length-3 extension of q112's transition
    * matrix, i.e. the smallest sequential pattern a funnel designer
    * can't read off pairwise counts.
    *
    * Scale: one per-user window pass (two leads ride the same sort),
    * then a (e1,e2,e3)-keyed aggregate — support via countDistinct is
    * the one extra shuffle; top-k cuts with TakeOrdered, no global
    * sort.
    */
  def tripleSequences(events: DataFrame, topN: Int = 15): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_users").desc, col("n_occurrences").desc,
        col("e1"), col("e2"), col("e3"))
      .limit(topN)
  }

  /** q256: PEAK CONCURRENCY — the capacity-planning sweep: sessionize
    * each user's events (30-min inactivity gap), split every session
    * interval at UTC day boundaries, and sweep each day's +1/−1
    * endpoints in time order to find the maximum number of sessions
    * open at once. Ends sort before starts at the same microsecond
    * (back-to-back sessions don't double-count).
    *
    * Scale: the day split is exactly what makes the sweep
    * partitionable — each day's running sum is an independent window
    * partition (no global ordering), and a session crossing midnight
    * contributes correctly to BOTH days. Output is the global peak and
    * the first day/instant it occurs.
    */
  def peakConcurrency(events: DataFrame, gapUs: Long = 1800L * 1000000): DataFrame = {
    val dayUs = 86400L * 1000000
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val sess = events.select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("new_sess",
        when(col("us") - lag("us", 1).over(w) > gapUs || lag("us", 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(min("us").as("s"), max("us").as("e"))
    val segs = sess
      .select(col("s"), col("e"),
        explode(expr(s"sequence(s div $dayUs, e div $dayUs)")).as("day"))
      .select(col("day"),
        greatest(col("s"), col("day") * dayUs).as("seg_s"),
        least(col("e"), (col("day") + 1) * dayUs - 1).as("seg_e"))
    val bounds = segs.select(col("day"), col("seg_s").as("us"), lit(1L).as("delta"))
      .unionAll(segs.select(col("day"), (col("seg_e") + 1).as("us"), lit(-1L).as("delta")))
    val sweep = Window.partitionBy("day").orderBy(col("us"), col("delta"))
    val perDay = bounds
      .withColumn("open", sum("delta").over(
        sweep.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("day").agg(max("open").as("day_peak"))
    perDay.agg(max(struct(col("day_peak"), (-col("day")).as("nd"), col("day"))).as("m"))
      .crossJoin(broadcast(sess.agg(count(lit(1)).as("n_sessions"))))
      .select(col("n_sessions"), col("m.day_peak").as("peak_concurrent"),
        to_date(timestamp_micros(col("m.day") * dayUs)).as("peak_day"))
  }

  /** q258: SAMPLE-RATIO-MISMATCH guardrail — the pre-flight check every
    * A/B readout (q148/q149) must pass: under the 50/50 hash
    * assignment, χ² = (n_a − n_b)²/(n_a + n_b); an excess over the 95%
    * critical value means the assignment itself is broken and the
    * experiment unreadable. Flagged by integer cross-multiplication
    * (100·(n_a−n_b)² > 384·n) — no float χ² anywhere.
    */
  def sampleRatioCheck(events: DataFrame): DataFrame =
    events.select(col("user_id")).distinct()
      .select(when(md5(concat(lit("ab|"), col("user_id"))) < "8", 1L).otherwise(0L).as("a"))
      .agg(count(lit(1)).as("n_users"), sum("a").as("n_a"))
      .withColumn("n_b", col("n_users") - col("n_a"))
      .withColumn("chi2_micro",
        expr("(n_a - n_b) * (n_a - n_b) * 1000000 div n_users"))
      .withColumn("srm_flag",
        expr("100 * (n_a - n_b) * (n_a - n_b) > 384 * n_users"))

  /** q259: MONTHLY SEASONAL INDEX per market segment — revenue against
    * its centered 12-month moving average (ratio-to-moving-average
    * decomposition, the classic X-11 first step): index_ppm > 10⁶ means
    * the month runs hot for that segment. Exact cents; the ratio
    * cross-multiplies through the 12-month window SUM (never an
    * average), and months lacking a full ±6 window are excluded rather
    * than padded.
    *
    * Scale: the fact table collapses to (segment, month) cents
    * map-side; the moving window runs over that bounded frame.
    */
  def seasonalIndex(orders: DataFrame, customer: DataFrame): DataFrame = {
    val monthly = orders
      .join(customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    val w = Window.partitionBy("c_mktsegment").orderBy("ym").rowsBetween(-6, 5)
    monthly
      .withColumn("ma_sum", sum("cents").over(w))
      .withColumn("ma_n", count(lit(1)).over(w))
      .filter(col("ma_n") === 12)
      .select(col("c_mktsegment"), col("ym"),
        round(col("cents") / 100.0, 2).as("revenue"),
        expr("cents * 12 * 1000000 div ma_sum").as("index_ppm"))
      .orderBy("c_mktsegment", "ym")
  }

  /** q265: EWMA (exponentially weighted moving average) of each user's
    * event values, α = 1/2 over the LAST 30 events — the standard
    * recency-weighted activity score. α = 1/2 makes every weight an
    * exact power of two, so the whole average is INTEGER arithmetic:
    * value → micro-units, weight for the i-th most recent event =
    * 2^(30−i), and ewma = Σ µv·w / Σ w with one final double division.
    * No pow()/exp() anywhere — the cross-engine float-determinism trap
    * the recursive EWMA formulation would hit (and the reason the
    * window is capped: 30 binary weight levels keep the numerator
    * < 2^30·µv_max·2, far inside int64).
    *
    * Scale: one window shuffle on user_id; the following aggregate
    * reuses the same partitioning (no second exchange). State per user
    * is the 30-row tail, never the full history.
    */
  def userEwma(events: DataFrame, lastN: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 1000000 + 0.5).cast("long").as("uv"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= lastN)
      .select(col("user_id"), col("uv"),
        expr(s"shiftleft(1L, $lastN - rn)").as("wt"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_used"),
        sum(col("uv") * col("wt")).as("num"),
        sum(col("wt")).as("den"))
      .select(col("user_id"), col("n_used"),
        round(col("num").cast("double") / col("den") / 1000000.0, 6).as("ewma"))
      .orderBy("user_id")
  }

  /** q289: PROPENSITY-SCORE MATCHING — the observational-causal rung
    * above q148 (randomized arms) and q149 (variance reduction):
    * "treatment" is self-selected (purchase-heavy users, ≥20% purchase
    * events), so the naive outcome gap is confounded by activity.
    * Each treated user 1-NN-matches (with replacement) to the nearest
    * control on the activity score, caliper 3; ATT is the mean matched
    * outcome difference, reported next to the naive gap it corrects.
    *
    * Nearest-neighbor matching is SORT-MERGE, not O(n²): controls
    * collapse to one deterministic representative per score (min id),
    * both cohorts interleave into one (score, flag, id)-ordered stream,
    * and each treated row reads its floor/ceiling control from two
    * running windows — prev wins distance ties. All arithmetic is
    * integer micro-units until the two final divisions.
    *
    * Scale: everything up to the windows clusters by user_id; the
    * merge then runs PER SCORE BAND (band = score div 64, so the
    * running windows are `Window.partitionBy(band)` — users scale
    * with the corpus and a global-window sort would drag every user
    * through ONE task). Band edges stitch exactly: each band's
    * missing floor/ceiling control is the last control of any earlier
    * band / first control of any later band, computed on the BOUNDED
    * per-band control frame (one row per occupied band) via a
    * triangular broadcast join — no unpartitioned window anywhere,
    * and a fixture spec pins band-edge matches == the global-window
    * answer.
    */
  def propensityMatch(events: DataFrame, caliper: Long = 3L): DataFrame = {
    val bandW = 64L
    val u = events.groupBy("user_id").agg(
      count(lit(1)).as("score"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"),
      sum(expr("cast(floor(value * 1000000) as bigint)")).as("vq"))
      .withColumn("treated", col("np") * 5 >= col("score"))
    val ctrlRep = u.filter(!col("treated"))
      .groupBy("score").agg(min(struct(col("user_id"), col("vq"))).as("r"))
      .select(col("score"), col("r.user_id").as("id"), col("r.vq").as("cvq"))
    val stream = ctrlRep.select(col("score"), lit(0).as("flag"), col("id"),
        col("cvq").as("vq"))
      .unionByName(u.filter(col("treated")).select(col("score"), lit(1).as("flag"),
        col("user_id").as("id"), col("vq")))
      .withColumn("band", expr(s"score div $bandW"))
    val ord = Window.partitionBy("band").orderBy("score", "flag", "id")
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ctrlScore = when(col("flag") === 0, col("score"))
    val ctrlVq = when(col("flag") === 0, col("vq"))
    // band-edge carry: controls are unique per score (ctrlRep), so the
    // last control before band b in stream order is the max-(score)
    // control over bands < b, and symmetrically for the first after.
    // Both frames are band-count-sized (bounded); the triangular join
    // broadcasts them, so no global sort and no single-partition window
    // exists anywhere in the plan.
    val bandCtrl = stream.filter(col("flag") === 0)
      .groupBy(col("band").as("cb"))
      .agg(max(struct(col("score"), col("vq"))).as("mx"),
           min(struct(col("score"), col("vq"))).as("mn"))
    val allBands = stream.select("band").distinct()
    val carry = allBands
      .join(broadcast(bandCtrl), col("cb") < col("band"), "left")
      .groupBy("band").agg(max(struct(col("cb"), col("mx"))).as("cp"))
      .join(allBands.join(broadcast(bandCtrl), col("cb") > col("band"), "left")
          .groupBy(col("band").as("band2"))
          .agg(min(struct(col("cb"), col("mn"))).as("cn")),
        col("band") === col("band2"))
      .select(col("band"),
        col("cp.mx.score").as("cps"), col("cp.mx.vq").as("cpv"),
        col("cn.mn.score").as("cns"), col("cn.mn.vq").as("cnv"))
    val matched = stream
      .withColumn("ps0", last(ctrlScore, ignoreNulls = true).over(wPrev))
      .withColumn("pv0", last(ctrlVq, ignoreNulls = true).over(wPrev))
      .withColumn("ns0", first(ctrlScore, ignoreNulls = true).over(wNext))
      .withColumn("nv0", first(ctrlVq, ignoreNulls = true).over(wNext))
      .join(broadcast(carry), Seq("band"), "left")
      .withColumn("ps", coalesce(col("ps0"), col("cps")))
      .withColumn("pv", when(col("ps0").isNotNull, col("pv0")).otherwise(col("cpv")))
      .withColumn("ns", coalesce(col("ns0"), col("cns")))
      .withColumn("nv", when(col("ns0").isNotNull, col("nv0")).otherwise(col("cnv")))
      .filter(col("flag") === 1)
      .withColumn("usePrev", col("ps").isNotNull &&
        (col("ns").isNull || (col("score") - col("ps")) <= (col("ns") - col("score"))))
      .withColumn("ms", when(col("usePrev"), col("ps")).otherwise(col("ns")))
      .withColumn("mv", when(col("usePrev"), col("pv")).otherwise(col("nv")))
      .withColumn("ok", col("ms").isNotNull && abs(col("score") - col("ms")) <= caliper)
    val naive = u.agg(
      sum(when(col("treated"), col("vq"))).as("tvq"),
      sum(when(col("treated"), 1L).otherwise(0L)).as("nt"),
      sum(when(!col("treated"), col("vq"))).as("cvq"),
      sum(when(!col("treated"), 1L).otherwise(0L)).as("nc"))
    matched.agg(
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("ok"), col("vq") - col("mv")).otherwise(0L)).as("dsum"))
      .crossJoin(broadcast(naive))
      .select(col("nt").as("n_treated"), col("nc").as("n_control"),
        col("n_matched"),
        round((col("tvq").cast("double") / col("nt") -
          col("cvq").cast("double") / col("nc")) / lit(1000000.0), 4).as("naive_gap"),
        round(col("dsum").cast("double") / col("n_matched") / lit(1000000.0), 4)
          .as("att"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q289_propensity_match" -> ((s, d) => propensityMatch(Tables(s, d).events)),
    "q265_user_ewma"          -> ((s, d) => userEwma(Tables(s, d).events)),
    "q258_srm_check"          -> ((s, d) => sampleRatioCheck(Tables(s, d).events)),
    "q259_seasonal_index"     -> ((s, d) => { val t = Tables(s, d)
      seasonalIndex(t.orders, t.customer) }),
    "q255_triple_sequences"   -> ((s, d) => tripleSequences(Tables(s, d).events)),
    "q256_peak_concurrency"   -> ((s, d) => peakConcurrency(Tables(s, d).events)),
    "q254_regularity_bands"   -> ((s, d) => regularityBands(Tables(s, d).events)),
    "q225_sequence_match"     -> ((s, d) => sequenceMatch(Tables(s, d).events)),
    "q173_psi_drift"          -> ((s, d) => psiDrift(Tables(s, d).events)),
    "q171_kaplan_meier"       -> ((s, d) => kaplanMeier(Tables(s, d).events)),
    "q167_markov_stationary"  -> ((s, d) => markovStationary(Tables(s, d).events)),
    "q328_entropy_rate"       -> ((s, d) => markovEntropyRate(Tables(s, d).events)),
    "q149_cuped"         -> ((s, d) => cupedAbTest(Tables(s, d).events)),
    "q51_survey_report"  -> ((s, d) => surveyReport(Tables(s, d).orders)),
    "q39_segment_sets"   -> ((s, d) => { val t = Tables(s, d); segmentSets(t.customer, t.nation) }),
    "q40_session_durations" -> ((s, d) => sessionDurations(Tables(s, d).events)),
    "q41_top_spenders"   -> ((s, d) => topSpenders(Tables(s, d).orders)),
    "q42_active_in_both" -> ((s, d) => { val t = Tables(s, d); activeInBoth(t.orders, t.events) }),
    "q43_tagged_union"   -> ((s, d) => { val t = Tables(s, d); taggedUnionCounts(t.orders, t.events, t.lineitem) }),
    "q110_decayed_engagement" -> ((s, d) => decayedEngagement(Tables(s, d).events)),
    "q112_event_transitions"  -> ((s, d) => eventTransitions(Tables(s, d).events)),
    "q114_funnel"             -> ((s, d) => funnelConversion(Tables(s, d).events)),
    "q115_winsorized_stats"   -> ((s, d) => winsorizedStats(Tables(s, d).events)),
    "q116_session_paths"      -> ((s, d) => topSessionPaths(Tables(s, d).events)),
    "q125_rate_spikes"        -> ((s, d) => rateSpikes(Tables(s, d).events)),
    "q130_assoc_rules"        -> ((s, d) => associationRules(Tables(s, d).events)),
    "q135_cohort_retention"   -> ((s, d) => cohortRetention(Tables(s, d).events)),
    "q137_mad_outliers"       -> ((s, d) => madOutliers(Tables(s, d).events)),
    "q146_activity_islands"   -> ((s, d) => activityIslands(Tables(s, d).events)),
    "q147_dow_seasonality"    -> ((s, d) => dowSeasonality(Tables(s, d).events)),
    "q148_ab_test"            -> ((s, d) => abTestReport(Tables(s, d).events)),
    "q162_benford"            -> ((s, d) => benfordAudit(Tables(s, d).events)),
    "q163_seasonal_decomp"    -> ((s, d) => seasonalDecomposition(Tables(s, d).events)),
  )

  /** The q167 oracle unrolls the 12 integer power-iteration steps as
    * chained CTEs (recursive CTEs disallow the per-step aggregate);
    * the arithmetic is the same `(v·n) // n_from` integer expression
    * the Scala side evaluates, so the mass vector matches exactly.
    */
  private val markovOracle: String = {
    val iterCtes = (1 to 12).map { i =>
      s"""i$i AS (SELECT t.to_type AS state, sum((i${i - 1}.v::HUGEINT * t.n) // t.n_from)::BIGINT AS v
         |       FROM i${i - 1} JOIN t ON i${i - 1}.state = t.from_type GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT from_type, to_type, n,
       |         sum(n) OVER (PARTITION BY from_type)::BIGINT AS n_from
       |  FROM (SELECT event_type AS from_type, next_type AS to_type, count(*)::BIGINT AS n
       |        FROM (SELECT event_type,
       |                     lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
       |              FROM events)
       |        WHERE next_type IS NOT NULL GROUP BY 1, 2)),
       |states AS (SELECT DISTINCT from_type AS s FROM t
       |           UNION SELECT DISTINCT to_type FROM t),
       |kk AS (SELECT count(*)::BIGINT AS k FROM states),
       |i0 AS (SELECT s AS state, 1000000000000 // k AS v FROM states, kk),
       |$iterCtes,
       |tot AS (SELECT sum(v)::BIGINT AS sv FROM i12)
       |SELECT s AS state, coalesce(i12.v, 0)::BIGINT AS mass,
       |       round(CAST(coalesce(i12.v, 0) AS DOUBLE) / CAST(sv AS DOUBLE), 6) AS p
       |FROM states LEFT JOIN i12 ON states.s = i12.state, tot
       |ORDER BY state""".stripMargin
  }

  /** q328 oracle: the q167 CTE chain + micro-nat surprisal cells, all
    * floor divisions on non-negative integers.
    */
  private val entropyRateOracle: String = {
    val iterCtes = (1 to 12).map { i =>
      s"""i$i AS (SELECT t.to_type AS state, sum((i${i - 1}.v::HUGEINT * t.n) // t.n_from)::BIGINT AS v
         |       FROM i${i - 1} JOIN t ON i${i - 1}.state = t.from_type GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT from_type, to_type, n,
       |         sum(n) OVER (PARTITION BY from_type)::BIGINT AS n_from
       |  FROM (SELECT event_type AS from_type, next_type AS to_type, count(*)::BIGINT AS n
       |        FROM (SELECT event_type,
       |                     lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
       |              FROM events)
       |        WHERE next_type IS NOT NULL GROUP BY 1, 2)),
       |states AS (SELECT DISTINCT from_type AS s FROM t
       |           UNION SELECT DISTINCT to_type FROM t),
       |kk AS (SELECT count(*)::BIGINT AS k FROM states),
       |i0 AS (SELECT s AS state, 1000000000000 // k AS v FROM states, kk),
       |$iterCtes,
       |tot AS (SELECT sum(v)::BIGINT AS sv FROM i12),
       |cells AS (SELECT from_type, n_from, n,
       |          CAST(floor(ln(n_from::DOUBLE / n::DOUBLE) * 1000000) AS BIGINT) AS cost
       |          FROM t),
       |hs AS (SELECT from_type AS state, max(n_from)::BIGINT AS n_out,
       |              (sum(n * cost) // max(n_from))::BIGINT AS h_micro
       |       FROM cells GROUP BY from_type),
       |j AS (SELECT states.s AS state,
       |             coalesce(h.n_out, 0)::BIGINT AS n_out,
       |             coalesce(i12.v, 0)::BIGINT AS mass,
       |             coalesce(h.h_micro, 0)::BIGINT AS h_micro,
       |             (coalesce(i12.v, 0)::HUGEINT * coalesce(h.h_micro, 0) // sv)::BIGINT AS contrib_micro
       |      FROM states LEFT JOIN hs h ON states.s = h.state
       |           LEFT JOIN i12 ON states.s = i12.state, tot)
       |SELECT state, n_out, mass, h_micro, contrib_micro,
       |       sum(contrib_micro) OVER ()::BIGINT AS rate_micro
       |FROM j ORDER BY state""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q328_entropy_rate" -> entropyRateOracle,
    // same interleaved-stream windows, same tie rules (prev control wins
    // equal distance; equal-score control sorts before the treated row)
    "q289_propensity_match" ->
      """WITH u AS (
        |  SELECT user_id, count(*)::BIGINT AS score,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS np,
        |         sum(CAST(floor(value * 1000000) AS BIGINT))::BIGINT AS vq
        |  FROM events GROUP BY user_id),
        |t AS (SELECT *, (np * 5 >= score) AS treated FROM u),
        |rep AS (SELECT score, min(user_id) AS id FROM t WHERE NOT treated GROUP BY score),
        |repv AS (SELECT r.score, r.id, c.vq AS cvq FROM rep r JOIN t c ON c.user_id = r.id),
        |stream AS (
        |  SELECT score, 0 AS flag, id, cvq AS vq FROM repv
        |  UNION ALL
        |  SELECT score, 1, user_id, vq FROM t WHERE treated),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN flag = 0 THEN score END IGNORE NULLS) OVER
        |      (ORDER BY score, flag, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps,
        |    last_value(CASE WHEN flag = 0 THEN vq END IGNORE NULLS) OVER
        |      (ORDER BY score, flag, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    first_value(CASE WHEN flag = 0 THEN score END IGNORE NULLS) OVER
        |      (ORDER BY score, flag, id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ns,
        |    first_value(CASE WHEN flag = 0 THEN vq END IGNORE NULLS) OVER
        |      (ORDER BY score, flag, id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        |  FROM stream),
        |m AS (
        |  SELECT score, vq,
        |         CASE WHEN ps IS NOT NULL AND (ns IS NULL OR (score - ps) <= (ns - score))
        |              THEN ps ELSE ns END AS ms,
        |         CASE WHEN ps IS NOT NULL AND (ns IS NULL OR (score - ps) <= (ns - score))
        |              THEN pv ELSE nv END AS mv
        |  FROM w WHERE flag = 1),
        |mm AS (
        |  SELECT sum(CASE WHEN ms IS NOT NULL AND abs(score - ms) <= 3 THEN 1 ELSE 0 END)::BIGINT AS n_matched,
        |         sum(CASE WHEN ms IS NOT NULL AND abs(score - ms) <= 3 THEN vq - mv ELSE 0 END)::BIGINT AS dsum
        |  FROM m),
        |nv2 AS (
        |  SELECT sum(CASE WHEN treated THEN vq END)::BIGINT AS tvq,
        |         sum(CASE WHEN treated THEN 1 ELSE 0 END)::BIGINT AS nt,
        |         sum(CASE WHEN NOT treated THEN vq END)::BIGINT AS cvq,
        |         sum(CASE WHEN NOT treated THEN 1 ELSE 0 END)::BIGINT AS nc
        |  FROM t)
        |SELECT nt AS n_treated, nc AS n_control, n_matched,
        |       round((tvq::DOUBLE / nt - cvq::DOUBLE / nc) / CAST(1000000 AS DOUBLE), 4) AS naive_gap,
        |       round(dsum::DOUBLE / n_matched / CAST(1000000 AS DOUBLE), 4) AS att
        |FROM mm, nv2""".stripMargin,
    "q265_user_ewma" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |                  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS uv
        |           FROM events),
        |r AS (SELECT user_id, uv,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY us DESC, event_id DESC) AS rn
        |      FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_used,
        |       round(sum(uv * (1::BIGINT << (30 - rn)))::DOUBLE
        |             / sum(1::BIGINT << (30 - rn)) / 1000000.0, 6) AS ewma
        |FROM r WHERE rn <= 30
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q258_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t AS (SELECT count(*)::BIGINT AS n_users,
        |             sum(CASE WHEN md5('ab|' || user_id) < '8' THEN 1 ELSE 0 END)::BIGINT AS n_a
        |      FROM u)
        |SELECT n_users, n_a, (n_users - n_a)::BIGINT AS n_b,
        |       ((n_a - (n_users - n_a)) * (n_a - (n_users - n_a)) * 1000000
        |          // n_users)::BIGINT AS chi2_micro,
        |       100 * (n_a - (n_users - n_a)) * (n_a - (n_users - n_a)) > 384 * n_users
        |         AS srm_flag
        |FROM t""".stripMargin,
    "q259_seasonal_index" ->
      """WITH monthly AS (
        |  SELECT c_mktsegment, year(o_orderdate) * 100 + month(o_orderdate) AS ym,
        |         sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |win AS (
        |  SELECT c_mktsegment, ym, cents,
        |         sum(cents) OVER (PARTITION BY c_mktsegment ORDER BY ym
        |                          ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS ma_sum,
        |         count(*) OVER (PARTITION BY c_mktsegment ORDER BY ym
        |                        ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS ma_n
        |  FROM monthly)
        |SELECT c_mktsegment, ym::INT AS ym, round(cents / 100.0, 2) AS revenue,
        |       (cents * 12 * 1000000 // ma_sum)::BIGINT AS index_ppm
        |FROM win WHERE ma_n = 12
        |ORDER BY c_mktsegment, ym""".stripMargin,
    "q255_triple_sequences" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
        |seq AS (SELECT user_id, event_type AS e1,
        |               lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e2,
        |               lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS e3
        |        FROM e)
        |SELECT e1, e2, e3, count(DISTINCT user_id)::BIGINT AS n_users,
        |       count(*)::BIGINT AS n_occurrences
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n_users DESC, n_occurrences DESC, e1, e2, e3 LIMIT 15""".stripMargin,
    "q256_peak_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |s1 AS (SELECT user_id, us, event_id,
        |              CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |                     OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |                        > 1800000000
        |                   THEN 1 ELSE 0 END AS new_sess
        |       FROM e),
        |s2 AS (SELECT user_id, us,
        |              sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess_id
        |       FROM s1),
        |sess AS (SELECT user_id, sess_id, min(us) AS s, max(us) AS e
        |         FROM s2 GROUP BY user_id, sess_id),
        |segs AS (SELECT day, greatest(s, day * 86400000000) AS seg_s,
        |                least(e, (day + 1) * 86400000000 - 1) AS seg_e
        |         FROM (SELECT s, e, unnest(range(s // 86400000000, e // 86400000000 + 1)) AS day
        |               FROM sess)),
        |bounds AS (SELECT day, seg_s AS us, 1::BIGINT AS delta FROM segs
        |           UNION ALL SELECT day, seg_e + 1, (-1)::BIGINT FROM segs),
        |sweep AS (SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY us, delta) AS open
        |          FROM bounds),
        |pd AS (SELECT day, max(open)::BIGINT AS day_peak FROM sweep GROUP BY day),
        |best AS (SELECT day, day_peak FROM (
        |           SELECT day, day_peak, row_number() OVER (
        |             ORDER BY day_peak DESC, day) AS rn FROM pd) WHERE rn = 1)
        |SELECT (SELECT count(*) FROM sess)::BIGINT AS n_sessions,
        |       b.day_peak AS peak_concurrent,
        |       epoch_ms(b.day * 86400000)::DATE AS peak_day
        |FROM best b""".stripMargin,
    "q254_regularity_bands" ->
      """WITH g AS (
        |  SELECT user_id,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS g
        |  FROM events),
        |s AS (SELECT user_id, count(*)::BIGINT AS ng, sum(g)::BIGINT AS sg,
        |             sum(g::HUGEINT * g) AS sg2
        |      FROM g WHERE g IS NOT NULL GROUP BY user_id HAVING count(*) >= 2),
        |b AS (SELECT CASE
        |        WHEN sg = 0 THEN 'regular'
        |        WHEN (ng::HUGEINT * sg2 - sg::HUGEINT * sg) * 100 < sg::HUGEINT * sg
        |          THEN 'regular'
        |        WHEN (ng::HUGEINT * sg2 - sg::HUGEINT * sg) * 4 < sg::HUGEINT * sg
        |          THEN 'normal'
        |        ELSE 'bursty' END AS band
        |      FROM s)
        |SELECT band, count(*)::BIGINT AS n_users FROM b
        |GROUP BY band ORDER BY band""".stripMargin,
    // regexp_extract_all length == Spark's regexp_count for these
    // patterns (leftmost non-overlapping, greedy — identical in Java
    // regex and DuckDB's RE2 for alternation-free patterns)
    "q225_sequence_match" ->
      """WITH s AS (SELECT user_id,
        |             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        |           FROM events GROUP BY user_id),
        |p AS (SELECT unnest(['vc*p', 'e{2,}', 'se']) AS pattern),
        |m AS (SELECT pattern, len(regexp_extract_all(seq, pattern))::BIGINT AS n FROM s, p)
        |SELECT pattern,
        |       sum(CASE WHEN n > 0 THEN 1 ELSE 0 END)::BIGINT AS n_users,
        |       sum(n)::BIGINT AS n_matches
        |FROM m GROUP BY pattern ORDER BY pattern""".stripMargin,
    // same one-pass conditional band counts; identical smoothed
    // per-band expression (integers in, one rounded double out per row)
    "q173_psi_drift" ->
      """WITH b AS (SELECT min(epoch_ns(ts) // 1000) AS min_us,
        |                  max(epoch_ns(ts) // 1000) AS max_us FROM events),
        |cells AS (
        |  SELECT CAST(floor(value / 50.0) AS INT) AS band,
        |         sum(CASE WHEN epoch_ns(ts) // 1000 >=
        |                       min_us + (max_us - min_us) // 2
        |                  THEN 0 ELSE 1 END)::BIGINT AS n_ref,
        |         sum(CASE WHEN epoch_ns(ts) // 1000 >=
        |                       min_us + (max_us - min_us) // 2
        |                  THEN 1 ELSE 0 END)::BIGINT AS n_cur
        |  FROM events, b GROUP BY 1),
        |m AS (SELECT band, n_ref, n_cur,
        |             sum(n_ref) OVER ()::BIGINT AS tot_ref,
        |             sum(n_cur) OVER ()::BIGINT AS tot_cur,
        |             count(*) OVER ()::BIGINT AS n_bands
        |      FROM cells)
        |SELECT band, n_ref, n_cur,
        |       round(((CAST(n_ref + 1 AS DOUBLE) / (tot_ref + n_bands))
        |               - (CAST(n_cur + 1 AS DOUBLE) / (tot_cur + n_bands)))
        |             * ln((CAST(n_ref + 1 AS DOUBLE) / (tot_ref + n_bands))
        |                  / (CAST(n_cur + 1 AS DOUBLE) / (tot_cur + n_bands))), 6)
        |         AS psi_part
        |FROM m ORDER BY band""".stripMargin,
    // identical scaled-integer recurrence as a recursive CTE (HUGEINT
    // product, floor division); µs truncation + day floor-div mirror
    // Tables.events and the Spark plan
    "q171_kaplan_meier" ->
      """WITH RECURSIVE mx AS (SELECT max(epoch_ns(ts) // 1000) AS max_us FROM events),
        |u AS (SELECT user_id, min(epoch_ns(ts) // 1000) AS first_us,
        |             min(CASE WHEN event_type = 'purchase'
        |                      THEN epoch_ns(ts) // 1000 END) AS conv_us
        |      FROM events GROUP BY user_id),
        |dd AS (SELECT CASE WHEN conv_us IS NOT NULL
        |                   THEN (conv_us - first_us) // 86400000000
        |                   ELSE ((SELECT max_us FROM mx) - first_us) // 86400000000
        |              END AS dur_days,
        |              CASE WHEN conv_us IS NOT NULL THEN 0 ELSE 1 END AS censored
        |       FROM u),
        |g AS (SELECT dur_days, count(*)::BIGINT AS n_at,
        |             sum(1 - censored)::BIGINT AS d
        |      FROM dd GROUP BY 1),
        |r AS (SELECT dur_days, n_at, d,
        |             sum(n_at) OVER (ORDER BY dur_days DESC
        |                             ROWS UNBOUNDED PRECEDING)::BIGINT AS n_risk,
        |             row_number() OVER (ORDER BY dur_days) AS i
        |      FROM g),
        |s(i, surv) AS (
        |  SELECT 0::BIGINT, 1000000000::BIGINT
        |  UNION ALL
        |  SELECT r.i, ((s.surv::HUGEINT * (r.n_risk - r.d)) // r.n_risk)::BIGINT
        |  FROM s JOIN r ON r.i = s.i + 1)
        |SELECT r.dur_days, r.n_risk, r.d AS n_events, s.surv AS surv_scaled,
        |       round(s.surv / 1000000000.0, 6) AS survival
        |FROM s JOIN r ON r.i = s.i
        |WHERE r.d > 0 ORDER BY r.dur_days""".stripMargin,
    "q167_markov_stationary" -> markovOracle,
    "q146_activity_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, (CAST(ts AS DATE) - DATE '1970-01-01') AS day FROM events),
              isl AS (SELECT user_id, day, day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp FROM days),
              islands AS (SELECT user_id, grp, count(*)::BIGINT AS len,
                                 min(day) AS istart, max(day) AS iend
                          FROM isl GROUP BY user_id, grp),
              g AS (SELECT user_id, len,
                           lead(istart) OVER (PARTITION BY user_id ORDER BY istart) - iend - 1 AS gap
                    FROM islands)
         SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days, count(*)::BIGINT AS n_islands,
                CAST(max(len) AS BIGINT) AS longest_run,
                CAST(coalesce(max(gap), 0) AS BIGINT) AS longest_gap
         FROM g GROUP BY user_id ORDER BY user_id""",
    "q147_dow_seasonality" ->
      """WITH counts AS (SELECT event_type, (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS dow,
                                count(*)::BIGINT AS n
                         FROM events GROUP BY 1, 2),
              dense AS (SELECT t.event_type, d.dow, coalesce(c.n, 0) AS n
                        FROM (SELECT DISTINCT event_type FROM counts) t
                        CROSS JOIN (SELECT CAST(range AS INT) AS dow FROM range(7)) d
                        LEFT JOIN counts c ON c.event_type = t.event_type AND c.dow = d.dow),
              tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM dense GROUP BY 1)
         SELECT e.event_type, total,
                round(CAST(sum((7 * n - total) * (7 * n - total)) AS DOUBLE) / (7.0 * total), 4) AS chi2
         FROM dense e JOIN tot USING (event_type)
         GROUP BY e.event_type, total ORDER BY event_type""",
    "q149_cuped" ->
      """WITH d AS (SELECT user_id, (CAST(ts AS DATE) - DATE '1970-01-01') AS day FROM events),
        |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM d),
        |pu AS (SELECT user_id,
        |              sum(CASE WHEN day < mid THEN 1 ELSE 0 END)::BIGINT AS x,
        |              sum(CASE WHEN day >= mid THEN 1 ELSE 0 END)::BIGINT AS y
        |       FROM d, mid GROUP BY user_id),
        |a AS (SELECT CASE WHEN md5('ab|' || user_id) < '8' THEN 'A' ELSE 'B' END AS arm, x, y FROM pu),
        |m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |             sum(x*y)::BIGINT AS sxy, sum(x*x)::BIGINT AS sxx,
        |             sum(CASE WHEN arm='A' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |             sum(CASE WHEN arm='A' THEN x END)::BIGINT AS sx_a,
        |             sum(CASE WHEN arm='A' THEN y END)::BIGINT AS sy_a,
        |             sum(CASE WHEN arm='B' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |             sum(CASE WHEN arm='B' THEN x END)::BIGINT AS sx_b,
        |             sum(CASE WHEN arm='B' THEN y END)::BIGINT AS sy_b
        |      FROM a)
        |SELECT n_a, n_b,
        |       round((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0)::DOUBLE, 4) AS theta,
        |       round(sy_b/n_b::DOUBLE - sy_a/n_a::DOUBLE, 4) AS diff_raw,
        |       round((sy_b/n_b::DOUBLE - sy_a/n_a::DOUBLE)
        |             - ((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0)::DOUBLE)
        |               * (sx_b/n_b::DOUBLE - sx_a/n_a::DOUBLE), 4) AS diff_cuped
        |FROM m""".stripMargin,
    "q148_ab_test" ->
      """WITH per_user AS (SELECT user_id, count(*)::BIGINT AS t,
                                  coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)::BIGINT AS cv
                           FROM events GROUP BY user_id),
              users AS (SELECT CASE WHEN md5('ab|' || user_id) < '8' THEN 'A' ELSE 'B' END AS arm,
                               CASE WHEN cv * 4 >= t THEN 1 ELSE 0 END::BIGINT AS converted
                        FROM per_user),
              by_arm AS (SELECT arm, count(*)::BIGINT AS n, sum(converted)::BIGINT AS c
                         FROM users GROUP BY arm),
              one AS (SELECT CAST(sum(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS n_a,
                             CAST(sum(CASE WHEN arm = 'A' THEN c END) AS BIGINT) AS conv_a,
                             CAST(sum(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS n_b,
                             CAST(sum(CASE WHEN arm = 'B' THEN c END) AS BIGINT) AS conv_b
                      FROM by_arm)
         SELECT n_a, conv_a, n_b, conv_b,
                round(conv_a / n_a, 4) AS rate_a,
                round(conv_b / n_b, 4) AS rate_b,
                round((conv_a / n_a - conv_b / n_b) /
                      nullif(sqrt(((conv_a + conv_b) / (n_a + n_b)) * (1 - (conv_a + conv_b) / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b)), 0), 4) AS z
         FROM one""",
    // two explicit (vl+vu)/2 median passes; identical double flag expr
    "q137_mad_outliers" ->
      """WITH e AS (SELECT event_type, event_id, value FROM events),
        |n1 AS (SELECT event_type, count(*)::BIGINT AS n FROM e GROUP BY 1),
        |r1 AS (SELECT event_type, value,
        |              row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) - 1 AS rn
        |       FROM e),
        |med AS (
        |  SELECT r1.event_type,
        |         (max(CASE WHEN rn = floor((n - 1) * 0.5) THEN value END)
        |          + max(CASE WHEN rn = ceil((n - 1) * 0.5) THEN value END)) / 2 AS med
        |  FROM r1 JOIN n1 USING (event_type)
        |  WHERE rn = floor((n - 1) * 0.5) OR rn = ceil((n - 1) * 0.5)
        |  GROUP BY 1),
        |dev AS (SELECT e.event_type, e.event_id, abs(e.value - m.med) AS adev, m.med
        |        FROM e JOIN med m USING (event_type)),
        |r2 AS (SELECT event_type, adev,
        |              row_number() OVER (PARTITION BY event_type ORDER BY adev, event_id) - 1 AS rn
        |       FROM dev),
        |mad AS (
        |  SELECT r2.event_type,
        |         (max(CASE WHEN rn = floor((n - 1) * 0.5) THEN adev END)
        |          + max(CASE WHEN rn = ceil((n - 1) * 0.5) THEN adev END)) / 2 AS mad
        |  FROM r2 JOIN n1 USING (event_type)
        |  WHERE rn = floor((n - 1) * 0.5) OR rn = ceil((n - 1) * 0.5)
        |  GROUP BY 1)
        |SELECT d.event_type, count(*)::BIGINT AS n_events,
        |       round(max(d.med), 4) AS median, round(max(mad.mad), 4) AS mad,
        |       coalesce(sum(CASE WHEN d.adev > 3.0 * mad.mad THEN 1 END), 0)::BIGINT AS n_outliers,
        |       round(coalesce(sum(CASE WHEN d.adev > 3.0 * mad.mad THEN 1 END), 0)
        |             / count(*)::DOUBLE, 4) AS outlier_rate
        |FROM dev d JOIN mad USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // µs floor-div day/cohort/offset keys; one closing division
    "q135_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT e.user_id, f.first_day // 7 AS cohort,
        |         (e.day - f.first_day) // 7 AS "offset"
        |  FROM e JOIN f USING (user_id)),
        |sizes AS (SELECT first_day // 7 AS cohort, count(*)::BIGINT AS cohort_users
        |          FROM f GROUP BY 1)
        |SELECT cohort, "offset", count(*)::BIGINT AS n_active, cohort_users,
        |       round(count(*) / cohort_users::DOUBLE, 4) AS retention
        |FROM act JOIN sizes USING (cohort)
        |GROUP BY cohort, "offset", cohort_users
        |ORDER BY cohort, "offset"""".stripMargin,
    // integer basket counts; confidence/lift are closing divisions
    "q130_assoc_rules" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |p AS (
        |  SELECT a.event_type AS ante, b.event_type AS cons, count(*)::BIGINT AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |s AS (SELECT event_type, count(*)::BIGINT AS n FROM ut GROUP BY 1),
        |t AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM ut)
        |SELECT ante, cons, n_both, sa.n AS n_a, sb.n AS n_b,
        |       round(n_both / n_users::DOUBLE, 4) AS support,
        |       round(n_both / sa.n::DOUBLE, 4) AS conf_a_to_b,
        |       round(n_both / sb.n::DOUBLE, 4) AS conf_b_to_a,
        |       round((n_both * n_users) / (sa.n * sb.n)::DOUBLE, 4) AS lift
        |FROM p JOIN s sa ON p.ante = sa.event_type
        |       JOIN s sb ON p.cons = sb.event_type, t
        |ORDER BY ante, cons""".stripMargin,
    // integer trailing moments; z's numerator k·n − Σc stays integer
    "q125_rate_spikes" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n,
        |         count(n) OVER win::BIGINT AS n_prev,
        |         sum(n) OVER win::BIGINT AS s1,
        |         sum(n * n) OVER win::BIGINT AS s2
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n, n_prev,
        |       round(s1 / n_prev::DOUBLE, 4) AS mean_prev,
        |       CASE WHEN n_prev * s2 - s1 * s1 = 0
        |            THEN CASE WHEN n * n_prev = s1 THEN 0.0 END
        |            ELSE round((n * n_prev - s1) / sqrt((n_prev * s2 - s1 * s1)::DOUBLE), 4)
        |       END AS z,
        |       CASE WHEN n_prev * s2 - s1 * s1 = 0 THEN n * n_prev <> s1
        |            ELSE abs(round((n * n_prev - s1)
        |                           / sqrt((n_prev * s2 - s1 * s1)::DOUBLE), 4)) >= 2.0
        |       END AS is_spike
        |FROM w WHERE n_prev >= 3 ORDER BY event_type, day""".stripMargin,
    "q51_survey_report" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
                sum(floor(o_totalprice * 100 + 0.5)) / 100 AS total_price,
                CAST(dense_rank() OVER (ORDER BY o_orderstatus, o_orderpriority) AS BIGINT) AS report_rank
         FROM orders GROUP BY o_orderstatus, o_orderpriority
         ORDER BY o_orderstatus, o_orderpriority""",
    "q39_segment_sets" ->
      """SELECT n_name, array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
                count(DISTINCT c_mktsegment) AS n_segments
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    // the interpolation expression (vl + (vu − vl)·frac over explicit
    // order statistics) is written out identically on both engines; the
    // clipped sum folds in event_id-pinned order (q87), raw mean is
    // cents-exact (q51)
    "q115_winsorized_stats" ->
      """WITH e AS (SELECT event_type, event_id, value FROM events),
        |c AS (SELECT event_type, count(*)::BIGINT AS n,
        |             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        |      FROM e GROUP BY 1),
        |r AS (SELECT e.event_type, event_id, value, n,
        |             row_number() OVER (PARTITION BY e.event_type
        |                                ORDER BY value, event_id) - 1 AS rn
        |      FROM e JOIN c ON e.event_type = c.event_type),
        |p05 AS (
        |  SELECT event_type,
        |         max(CASE WHEN rn = floor((n - 1) * 0.05) THEN value END) +
        |         (max(CASE WHEN rn = ceil((n - 1) * 0.05) THEN value END) -
        |          max(CASE WHEN rn = floor((n - 1) * 0.05) THEN value END)) *
        |         (max((n - 1) * 0.05) - floor(max((n - 1) * 0.05))) AS p05
        |  FROM r WHERE rn = floor((n - 1) * 0.05) OR rn = ceil((n - 1) * 0.05)
        |  GROUP BY 1),
        |p95 AS (
        |  SELECT event_type,
        |         max(CASE WHEN rn = floor((n - 1) * 0.95) THEN value END) +
        |         (max(CASE WHEN rn = ceil((n - 1) * 0.95) THEN value END) -
        |          max(CASE WHEN rn = floor((n - 1) * 0.95) THEN value END)) *
        |         (max((n - 1) * 0.95) - floor(max((n - 1) * 0.95))) AS p95
        |  FROM r WHERE rn = floor((n - 1) * 0.95) OR rn = ceil((n - 1) * 0.95)
        |  GROUP BY 1),
        |w AS (
        |  SELECT e.event_type, e.event_id,
        |         least(greatest(e.value, p05.p05), p95.p95) AS cv
        |  FROM e JOIN p05 ON e.event_type = p05.event_type
        |         JOIN p95 ON e.event_type = p95.event_type)
        |SELECT c.event_type AS event_type, c.n AS n_events,
        |       round(c.cents / 100.0 / c.n, 4) AS raw_mean,
        |       round(p05.p05, 4) AS p05, round(p95.p95, 4) AS p95,
        |       round(list_sum(list_transform(
        |         list_sort(list({'e': w.event_id, 'v': w.cv})), x -> x.v)) / c.n, 4) + 0.0
        |         AS winsor_mean
        |FROM w JOIN c ON w.event_type = c.event_type
        |       JOIN p05 ON w.event_type = p05.event_type
        |       JOIN p95 ON w.event_type = p95.event_type
        |GROUP BY c.event_type, c.n, c.cents, p05.p05, p95.p95
        |ORDER BY event_type""".stripMargin,
    // session rule and ordering are the q40 contract at µs truncation;
    // the path is an ordered string_agg over the rank-capped head
    "q116_session_paths" ->
      """WITH s AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR (epoch_ns(ts) // 1000) - (epoch_ns(lag(ts) OVER w) // 1000) > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, event_type, us,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s),
        |headed AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
        |                               ORDER BY us, event_id) AS rn
        |  FROM sess),
        |paths AS (
        |  SELECT user_id, session_id,
        |         string_agg(event_type, '>' ORDER BY us, event_id) AS path
        |  FROM headed WHERE rn <= 5 GROUP BY 1, 2)
        |SELECT path, count(*)::BIGINT AS n_sessions
        |FROM paths GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // stage times compare at the µs truncation (q40 contract); counts
    // are integers, conversions single ratios
    "q114_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |s0 AS (SELECT user_id, min(us) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(us) AS t1 FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE event_type = 'click' AND us > t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'purchase' AND us > t1 GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s0)::BIGINT AS n0,
        |             (SELECT count(*) FROM s1)::BIGINT AS n1,
        |             (SELECT count(*) FROM s2)::BIGINT AS n2)
        |SELECT 1::BIGINT AS stage, 'view' AS stage_name, n0 AS n_users,
        |       1.0 AS conv_from_prev, 1.0 AS conv_from_first FROM c
        |UNION ALL
        |SELECT 2, 'click', n1, round(n1 / n0::DOUBLE, 4), round(n1 / n0::DOUBLE, 4) FROM c
        |UNION ALL
        |SELECT 3, 'purchase', n2, round(n2 / n1::DOUBLE, 4), round(n2 / n0::DOUBLE, 4) FROM c
        |ORDER BY stage""".stripMargin,
    // µs-truncated (ts, event_id) ordering = the q40 contract; counts
    // are integers, p is one ratio
    "q112_event_transitions" ->
      """WITH s AS (
        |  SELECT event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_ns(ts) // 1000, event_id) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type AS from_type, next_type AS to_type, count(*)::BIGINT AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       sum(n) OVER (PARTITION BY from_type)::BIGINT AS n_from,
        |       round(n / sum(n) OVER (PARTITION BY from_type)::DOUBLE, 4) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    // ns -> us truncation mirrors Tables.events (epoch_ns // 1000, the
    // q40 convention); weights are exact powers of two; the per-user
    // sum folds over the (us, event_id)-sorted weighted list (q87) and
    // the raw total uses the q51 cents convention
    "q110_decayed_engagement" ->
      """WITH mx AS (SELECT max(epoch_ns(ts) // 1000) AS max_us FROM events),
        |e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us, value,
        |         (max_us - epoch_ns(ts) // 1000) // 86400000000 AS age_days
        |  FROM events, mx),
        |w AS (
        |  SELECT user_id, us, event_id, value, age_days,
        |         CASE WHEN age_days >= 63 THEN 0.0
        |              ELSE value / (1::UBIGINT << age_days::INTEGER)::DOUBLE END AS wv
        |  FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |       min(age_days)::BIGINT AS last_seen_days,
        |       round(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS total_value,
        |       round(list_sum(list_transform(
        |         list_sort(list({'u': us, 'e': event_id, 'w': wv})), x -> x.w)), 4) + 0.0
        |         AS decayed_value
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q40_session_durations" ->
      """WITH flagged AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR (epoch_ns(ts) // 1000) - (epoch_ns(lag(ts) OVER w) // 1000) > 1800000000
                       THEN 1 ELSE 0 END AS new_session
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT user_id, us,
                  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged),
         per_session AS (
           SELECT user_id, session_id, max(us) - min(us) AS dur_us, count(*) AS n_events
           FROM numbered GROUP BY user_id, session_id)
         SELECT user_id, CAST(sum(dur_us) AS BIGINT) AS total_session_us,
                max(dur_us) AS longest_session_us, count(*) AS n_sessions
         FROM per_session GROUP BY user_id ORDER BY user_id""",
    "q41_top_spenders" ->
      """WITH totals AS (
           SELECT o_custkey, sum(floor(o_totalprice * 100 + 0.5)) / 100 AS total_spent,
                  count(*) AS n_orders
           FROM orders GROUP BY o_custkey),
         overall AS (SELECT count(*) AS total_customers FROM totals)
         SELECT o_custkey, total_spent, n_orders, total_customers
         FROM totals, overall
         ORDER BY total_spent DESC, o_custkey LIMIT 20""",
    "q42_active_in_both" ->
      """SELECT DISTINCT o_custkey AS id FROM orders
         INTERSECT
         SELECT DISTINCT user_id AS id FROM events
         ORDER BY id""",
    "q43_tagged_union" ->
      """SELECT src, count(*) AS n_rows, count(DISTINCT id) AS n_ids FROM (
           SELECT o_custkey AS id, 'orders' AS src FROM orders
           UNION ALL SELECT user_id, 'events' FROM events
           UNION ALL SELECT l_orderkey, 'lineitem' FROM lineitem)
         GROUP BY src ORDER BY src""",
    // exact integer cents → leading digit via string arithmetic (no
    // log10 boundary ULP risk); literal 1..9 spine densifies
    "q162_benford" ->
      """WITH d AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
        |           FROM (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |           WHERE cents > 0),
        |c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1),
        |spine AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
        |t AS (SELECT sum(n)::BIGINT AS total FROM c)
        |SELECT spine.digit, coalesce(c.n, 0)::BIGINT AS n,
        |       round(CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(total AS DOUBLE), 4) AS share,
        |       round(ln(1.0 + 1.0 / CAST(spine.digit AS DOUBLE)) / ln(10.0), 4) AS benford,
        |       round(CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(total AS DOUBLE)
        |             - ln(1.0 + 1.0 / CAST(spine.digit AS DOUBLE)) / ln(10.0), 4) AS excess
        |FROM spine LEFT JOIN c ON spine.digit = c.digit, t
        |ORDER BY spine.digit""".stripMargin,
    // dense day spine; trend = centered 7-day average with shorter
    // edge windows (ROWS BETWEEN mirrors Spark's rowsBetween exactly)
    "q163_seasonal_decomp" ->
      """WITH daily AS (SELECT (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
        |                      count(*)::BIGINT AS n
        |               FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |dense AS (SELECT sp.day, coalesce(daily.n, 0)::BIGINT AS n, sp.day % 7 AS dow
        |          FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM b) sp
        |          LEFT JOIN daily ON sp.day = daily.day),
        |tr AS (SELECT day, dow, n,
        |              sum(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT AS trend_s,
        |              count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT AS trend_c
        |       FROM dense),
        |dm AS (SELECT dow, sum(n)::BIGINT AS dow_s, count(*)::BIGINT AS dow_c
        |       FROM dense GROUP BY 1),
        |ov AS (SELECT sum(n)::BIGINT AS all_s, count(*)::BIGINT AS all_c FROM dense),
        |x AS (SELECT day, tr.dow AS dow, n,
        |             CAST(trend_s AS DOUBLE) / CAST(trend_c AS DOUBLE) AS trend,
        |             CAST(dow_s AS DOUBLE) / CAST(dow_c AS DOUBLE)
        |               - CAST(all_s AS DOUBLE) / CAST(all_c AS DOUBLE) AS seasonal,
        |             0.2 * CAST(all_s AS DOUBLE) / CAST(all_c AS DOUBLE) AS thresh
        |      FROM tr JOIN dm ON tr.dow = dm.dow, ov)
        |SELECT CAST(day AS INT) AS day, CAST(dow AS INT) AS dow, n,
        |       round(trend, 4) AS trend,
        |       round(seasonal, 4) AS seasonal,
        |       round(CAST(n AS DOUBLE) - trend - seasonal, 4) AS resid,
        |       (abs(CAST(n AS DOUBLE) - trend - seasonal) > thresh) AS is_anomaly
        |FROM x ORDER BY day""".stripMargin,
  )
}
