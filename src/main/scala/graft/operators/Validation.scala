package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validation & consistency operators (SURVEY.md §2.8) and structured
  * payload extraction (S5/S15): the reference asserts JSON Schemas and
  * row constraints at every boundary (schema_utils.py, utils.py:
  * 1286-1369); here constraints are aggregate expressions producing a
  * violations report instead of throwing, and JSON payload parsing is a
  * codegen'd `get_json_object` — no UDF, pushdown-friendly.
  */
object Validation extends QueryModule {

  /** V1/V2-shaped constraint check: one row of violation counters over
    * the whole table — a single partial-aggregated scan.
    */
  def documentConstraints(documents: DataFrame): DataFrame =
    documents.agg(
      sum(when(col("text").isNull || length(col("text")) === 0, 1).otherwise(0)).as("n_empty_text"),
      sum(when(length(col("text")) =!= col("n_chars"), 1).otherwise(0)).as("n_len_mismatch"),
      sum(when(!col("lang").isin("en", "fr", "es", "zh", "de"), 1).otherwise(0)).as("n_bad_lang"),
      count(lit(1)).as("n_total"))

  /** S15 (email_providers.py:205-234 json_normalize of ES hits): parse a
    * JSON payload column and aggregate over an extracted field.
    */
  def jsonPropsHistogram(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("bucket", pmod(col("k"), lit(10)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
      .orderBy("bucket")

  /** V4 (akoya_codex_data_collection.py:36-64 close_enough_match):
    * relative-tolerance numeric consistency between two sources — here
    * order totals vs their lineitem sums, |a-b|/(|a|+|b|) < 1e-9 → the
    * mismatch report the reference computes per-field in Python.
    */
  def toleranceConsistency(orders: DataFrame, li: DataFrame): DataFrame = {
    val sums = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("li_total"))
    orders.join(sums, orders("o_orderkey") === sums("l_orderkey"))
      .withColumn("close_enough",
        abs(col("o_totalprice") - col("li_total")) /
          (abs(col("o_totalprice")) + abs(col("li_total"))) < lit(0.05))
      .groupBy("close_enough")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("close_enough")
  }

  /** V6 (diagnostics/diagnostic_plugin.py:31-80 ordered plugin chain;
    * find_errors_plugin.py regex scan): first-match diagnostic
    * classification of error events — the plugin chain as a CASE
    * cascade, counts per diagnosis.
    */
  def errorDiagnostics(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "error")
      .withColumn("diagnosis",
        when(get_json_object(col("props"), "$.k").cast("long") >= 90, "resource_exhausted")
          .when(get_json_object(col("props"), "$.k").cast("long") >= 50, "illegal_argument")
          .when(col("props").rlike("\"k\": \\d"), "io_error")
          .otherwise("unclassified"))
      .groupBy("diagnosis")
      .agg(count(lit(1)).as("n"),
           round(avg(col("value")), 4).as("avg_value"))
      .orderBy("diagnosis")

  /** S15 end-to-end (email_providers.py:205-234,291-320): a full ES
    * search-response round trip through the REAL reader. A bounded
    * "search page" is rendered from orders as an actual ES envelope
    * (took/timed_out/hits.total/hits.hits with _index/_id/_score/
    * _source), parsed back with `spark.read.json`, and flattened by
    * [[graft.sources.EsJson.flattenHits]] — explode + `_id` → uuid +
    * `_source.*` keep-list rename. The oracle recomputes the page
    * directly from orders, so a reader that mangles any field or type
    * fails the hash. The page is bounded like a real ES page: the key
    * cap mirrors the API's `size` limit (≤10k hits at ANY scale
    * factor), deterministic so the oracle can reproduce it — the
    * single-doc assembly never grows with the corpus; scrolled pages
    * land as one doc per file and stay distributed.
    */
  def esRoundTrip(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val page = orders.filter(col("o_orderkey") % 97 === 0 && col("o_orderkey") <= 970000)
    val hitJson = page.select(to_json(struct(
      lit("orders").as("_index"),
      concat(lit("order-"), col("o_orderkey")).as("_id"),
      lit(1.0).as("_score"),
      struct(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("created_date"),
        col("o_orderpriority")).as("_source"))).as("hit"))
    val envelope = hitJson.agg(concat(
      lit("""{"took":3,"timed_out":false,"hits":{"total":{"value":"""),
      count(lit(1)),
      lit(""","relation":"eq"},"max_score":1.0,"hits":["""),
      concat_ws(",", collect_list(col("hit"))),
      lit("]}}")).as("body")).as[String]
    graft.sources.EsJson.flattenHits(spark.read.json(envelope),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "created_date", "o_orderpriority"))
      .orderBy("uuid")
  }

  /** q138: generic table profiler — one output row per column with null
    * count, exact distinct count, and a uniqueness flag, for ANY input
    * schema (columns enumerated from the DataFrame's own schema). The
    * "what did we actually ingest" audit every new source gets before
    * anything joins on it: a should-be-key column with is_unique=false
    * or a should-be-populated column with nulls is caught here, not in
    * a downstream join's row explosion.
    *
    * Scale shape: ONE aggregation pass computes every column's
    * counters (Spark plans multi-distinct via a single Expand — cost
    * grows with column count, not extra scans), then the one-row
    * result is pivoted to per-column rows by a literal struct explode.
    */
  def tableProfile(df: DataFrame): DataFrame = {
    val cols = df.schema.fieldNames.toSeq
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"))) :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("column"), col("__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"))): _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"), col("p.n_distinct"),
        (col("p.n_distinct") === col("p.n_rows")).as("is_unique"))
      .orderBy("column")
  }

  /** BPE-ish token counting (training-data mandate): regex token classes
    * (letter runs / digit runs) instead of whitespace — the
    * subword-tokenizer-approximation used for corpus budgeting.
    */
  def bpeTokenStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_bpe_tokens",
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0)")).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_bpe_tokens")).as("total_bpe_tokens"),
           round(avg(col("n_bpe_tokens")), 4).as("avg_bpe_tokens"))
      .orderBy("lang")

  /** q145: header-vs-detail reconciliation — the accounting audit that
    * every header/detail pair needs: does each order's stored total
    * equal the sum of its line charges? Exact integer cents on both
    * sides (floor(x·100 + ½)), so "mismatch" means a genuine break,
    * never float noise. Childless headers are their own bucket (a real
    * referential break, not a zero-total match).
    *
    * Scale shape: the detail side collapses to per-order cents BEFORE
    * the join (map-side combined aggregation), then one co-partitioned
    * join on the order key; the rollup is status-sized.
    */
  def orderReconciliation(orders: DataFrame, li: DataFrame): DataFrame = {
    val charges = li.groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * (lit(1) + col("l_tax")) * 100 + lit(0.5)).cast("long")).as("charge_cents"))
    orders.select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("total_cents"))
      .join(charges, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("charge_cents").isNull, 1L).otherwise(0L)).as("n_no_lines"),
        sum(when(col("charge_cents") === col("total_cents"), 1L).otherwise(0L)).as("n_match"),
        sum(when(col("charge_cents").isNotNull && col("charge_cents") =!= col("total_cents"), 1L)
          .otherwise(0L)).as("n_mismatch"),
        max(when(col("charge_cents").isNotNull,
          abs(col("charge_cents") - col("total_cents"))).otherwise(lit(0L))).as("max_abs_diff_cents"))
      .orderBy("o_orderstatus")
  }

  /** Table-version diff over pre-hashed snapshots: inputs are (k, h)
    * frames — one row hash per key — and the output classifies every
    * key as added / removed / changed with a per-class rollup.
    *
    * Scale shape: the projection to (key, 16 B md5) happens BEFORE the
    * full-outer join, so the wide rows never shuffle — the join carries
    * key + digest only. At 100 TB both snapshots live bucketed on the
    * key (graft.sources.Bucketing) and the diff plans exchange-free;
    * the rollup is three rows. This is the delta-detection primitive an
    * incremental pipeline runs between corpus versions before deciding
    * what to re-process.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame =
    v1.select(col("k"), col("h").as("h1"))
      .join(v2.select(col("k"), col("h").as("h2")), Seq("k"), "full_outer")
      .select(col("k"),
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed").as("change_type"))
      .filter(col("change_type").isNotNull)
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_rows"), min("k").as("min_key"), max("k").as("max_key"))
      .orderBy("change_type")

  /** q213 wrapper: two deterministic synthetic "versions" of orders —
    * v1 lacks the %101 keys (later additions), v2 lacks the %97 keys
    * (deletions) and bumps the %89 keys' price (modifications). The row
    * hash covers every column, money as exact cents (round() leaves an
    * integral double, which BOTH engines then cast exactly — a raw
    * double→int cast would truncate on Spark and round on DuckDB).
    */
  def orderSnapshotDiff(orders: DataFrame): DataFrame = {
    def hashed(price: org.apache.spark.sql.Column) = (df: DataFrame) => df.select(
      col("o_orderkey").as("k"),
      md5(concat_ws("|",
        col("o_custkey"), col("o_orderstatus"),
        round(price * 100).cast("long"),
        col("o_orderdate").cast("date").cast("string"),
        col("o_orderpriority"))).as("h"))
    val v1 = hashed(col("o_totalprice"))(orders.filter(col("o_orderkey") % 101 =!= 0))
    val v2 = hashed(when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 10.0)
        .otherwise(col("o_totalprice")))(orders.filter(col("o_orderkey") % 97 =!= 0))
    snapshotDiff(v1, v2)
  }

  /** q214: Benford first-digit audit of o_totalprice — the classic
    * fabricated-data screen. The first digit comes from exact integer
    * cents (leading digit is invariant under the ×100 shift), observed
    * counts join a 1..9 spine so absent digits still contribute their
    * full expected mass, and the chi-square statistic sums MICRO-
    * QUANTIZED per-digit contributions (floor(c·10⁶) as int64) — an
    * order-independent integer sum, so the statistic is identical on
    * any partitioning and any engine. The nine Benford probabilities
    * are embedded as decimal literals (both engines parse them to the
    * same doubles) — no libm log10 in the data path at all.
    *
    * Scale shape: one scan → 9-cell hash aggregate; everything after
    * is constant-size.
    */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val benford = "array(0.3010299956639812D, 0.17609125905568124D, 0.12493873660829993D," +
      " 0.09691001300805642D, 0.07918124604762482D, 0.06694678963061322D," +
      " 0.05799194697768673D, 0.05115252244738129D, 0.04575749056067514D)"
    val obs = orders
      .select(substring(round(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val spine = orders.sparkSession.range(1, 10).toDF("digit")
    val tot = obs.agg(sum("n_obs").as("n"))
    spine.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .crossJoin(broadcast(tot))
      .withColumn("p", expr(s"element_at($benford, cast(digit as int))"))
      .withColumn("contrib_q", expr(
        "cast(floor((n_obs - n * p) * (n_obs - n * p) / (n * p) * 1000000) as bigint)"))
      .select(col("digit"), col("n_obs"),
        round(expr("n * p"), 2).as("expected"),
        round(expr("cast(contrib_q as double) / 1000000.0"), 6).as("contrib"),
        round(expr("cast(sum(contrib_q) over () as double) / 1000000.0"), 6).as("chi2"))
      .orderBy("digit")
  }

  /** q228: declarative EXPECTATION SUITE (the Deequ / Great-
    * Expectations shape) — a battery of named data-quality constraints
    * evaluated in ONE corpus pass: every constraint compiles to a
    * conditional aggregate over the same scan, so adding checks never
    * adds passes. Metrics are micro-quantized ratios (integer
    * division) so pass/fail thresholds compare engine-exactly.
    *
    * The suite on orders: completeness (no null keys/status), domain
    * membership (status ∈ {O,F,P}), bounds (positive totalprice),
    * uniqueness (orderkey), referential shape (custkey ≥ 0), and
    * freshness (max orderdate within the observed range — trivially
    * true, the report shape is the point).
    *
    * Scale: one map-side-combined aggregate; uniqueness rides the same
    * pass as count − count(distinct) (distinct is the one extra
    * shuffle a uniqueness check fundamentally needs).
    */
  def expectationSuite(orders: DataFrame): DataFrame = {
    val m = orders.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_key"),
      sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("null_status"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("in_domain"),
      sum(when(col("o_totalprice") > 0, 1L).otherwise(0L)).as("positive_price"),
      countDistinct(col("o_orderkey")).as("distinct_keys"),
      sum(when(col("o_custkey") >= 0, 1L).otherwise(0L)).as("valid_cust"))
    def ratioQ(num: String) = s"(($num) * 1000000) div n"
    val checks = Seq(
      ("completeness:o_orderkey", s"${ratioQ("n - null_key")}", 1000000L),
      ("completeness:o_orderstatus", s"${ratioQ("n - null_status")}", 1000000L),
      ("domain:o_orderstatus in (O,F,P)", s"${ratioQ("in_domain")}", 1000000L),
      ("bounds:o_totalprice > 0", s"${ratioQ("positive_price")}", 1000000L),
      ("uniqueness:o_orderkey", s"${ratioQ("distinct_keys")}", 1000000L),
      ("referential:o_custkey >= 0", s"${ratioQ("valid_cust")}", 1000000L))
    val arms = checks.map { case (name, metricExpr, thr) =>
      m.select(lit(name).as("constraint"),
        expr(metricExpr).as("metric_q"),
        lit(thr).as("threshold_q"))
    }
    arms.reduce(_.unionByName(_))
      .select(col("constraint"),
        round(expr("cast(metric_q as double) / 1000000.0"), 6).as("metric"),
        round(expr("cast(threshold_q as double) / 1000000.0"), 6).as("threshold"),
        (col("metric_q") >= col("threshold_q")).as("passed"))
      .orderBy("constraint")
  }

  /** q247: REFERENTIAL-INTEGRITY audit across the whole star schema —
    * every FK edge, one row: child count, orphan count (children whose
    * key has no parent), and the orphan rate in ppm. The structural
    * complement to q228's single-table expectations and q145's
    * amount-level reconciliation: this is the first report to run on a
    * fresh snapshot, because every join downstream silently drops
    * orphans.
    *
    * Scale: each edge is ONE left-anti-join count keyed on the FK —
    * dimension parents (nation, region, part, supplier) broadcast;
    * fact-fact edges (lineitem→orders, orders→customer) shuffle on the
    * key like the joins they guard. Arms union to a 7-row frame.
    */
  def referentialAudit(t: Tables): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
             parent: DataFrame, parentKey: String): DataFrame = {
      val keys = child.select(col(childKey).as("k"))
      val orphans = keys.join(parent.select(col(parentKey).as("k")).distinct(),
        Seq("k"), "left_anti")
      keys.agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"),
          expr("n_orphans * 1000000 div n_rows").as("orphan_ppm"))
    }
    Seq(
      edge("lineitem.l_orderkey -> orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey"),
      edge("lineitem.l_partkey -> part", t.lineitem, "l_partkey", t.part, "p_partkey"),
      edge("lineitem.l_suppkey -> supplier", t.lineitem, "l_suppkey", t.supplier, "s_suppkey"),
      edge("orders.o_custkey -> customer", t.orders, "o_custkey", t.customer, "c_custkey"),
      edge("customer.c_nationkey -> nation", t.customer, "c_nationkey", t.nation, "n_nationkey"),
      edge("supplier.s_nationkey -> nation", t.supplier, "s_nationkey", t.nation, "n_nationkey"),
      edge("nation.n_regionkey -> region", t.nation, "n_regionkey", t.region, "r_regionkey"),
    ).reduce(_.unionByName(_)).orderBy("fk_edge")
  }

  /** q248: DATA-SUBJECT ACCESS manifest (the export side of q227's
    * right-to-be-forgotten): for the smallest customer key, every
    * table's related-row count plus an order-insensitive content
    * checksum (sum of per-row hashes — mergeable, so the manifest is
    * reproducible shard-by-shard). What a governance pipeline returns
    * for "give me everything you hold on subject X".
    *
    * Scale: the subject's orders frame is tiny — it broadcasts into the
    * lineitem probe; every arm is one filtered scan + scalar agg.
    */
  def subjectAccessManifest(t: Tables): DataFrame = {
    val subject = t.customer.agg(min("c_custkey").as("ck"))
    // per-row hash = first 8 hex digits of md5 as an integer — exact and
    // engine-portable (DuckDB parses the same prefix with shifts)
    def arm(name: String, rows: DataFrame, hashCols: Seq[String]): DataFrame = {
      val catCols = hashCols.map(c => s"cast($c as string)").mkString(", ")
      rows.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(expr(
            s"cast(conv(substring(md5(concat_ws('|', $catCols)), 1, 8), 16, 10) as bigint)")),
            lit(0L)).as("content_checksum"))
        .select(lit(name).as("table_name"), col("n_rows"), col("content_checksum"))
    }
    val cust = t.customer.join(broadcast(subject), col("c_custkey") === col("ck"))
    val ords = t.orders.join(broadcast(subject), col("o_custkey") === col("ck"))
    val lis = t.lineitem.join(
      broadcast(ords.select(col("o_orderkey").as("sk"))),
      col("l_orderkey") === col("sk"))
    Seq(
      arm("customer", cust, Seq("c_custkey", "c_name", "c_mktsegment")),
      arm("orders", ords, Seq("o_orderkey", "o_orderstatus", "o_orderpriority")),
      arm("lineitem", lis, Seq("l_orderkey", "l_linenumber", "l_returnflag")),
    ).reduce(_.unionByName(_)).orderBy("table_name")
  }

  /** q312: ORC round-trip fidelity audit — the columnar-format escape
    * hatch: write the corpus to ORC partitioned by `lang` (Spark's
    * second first-class columnar sink, zero extra dependencies), read
    * it back through partition discovery, and prove row fidelity with
    * per-source counts, sums, and an md5-derived content signature the
    * oracle recomputes from the ORIGINAL parquet — any encode/decode,
    * partition-column, or schema-evolution corruption breaks the hash.
    * (The q24 checksum-manifest contract applied to a format boundary;
    * a real pipeline runs exactly this gate before switching formats
    * or engines.)
    *
    * Scale: the write is a normal partitioned sink (one shuffle-free
    * pass); the audit is one map-side-combined aggregate per side.
    * Overwrite mode keeps the query re-runnable in one session (the
    * q205 lesson).
    */
  def orcRoundTrip(documents: DataFrame, path: String): DataFrame = {
    documents.write.mode("overwrite").partitionBy("lang").orc(path)
    val back = documents.sparkSession.read.orc(path)
    back.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum(conv(substring(md5(concat(lit("orc|"), col("text"))), 1, 15), 16, 10)
          .cast("long") % 1000000000L).as("text_sig"))
      .orderBy("source")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q312_orc_roundtrip" -> ((s, d) =>
      orcRoundTrip(Tables(s, d).documents, "target/graft_orc_roundtrip")),
    "q247_referential_audit" -> ((s, d) => referentialAudit(Tables(s, d))),
    "q248_subject_access" -> ((s, d) => subjectAccessManifest(Tables(s, d))),
    "q228_expectations" -> ((s, d) => expectationSuite(Tables(s, d).orders)),
    "q213_snapshot_diff" -> ((s, d) => orderSnapshotDiff(Tables(s, d).orders)),
    "q214_benford_audit" -> ((s, d) => benfordAudit(Tables(s, d).orders)),
    "q145_reconciliation" -> ((s, d) => { val t = Tables(s, d); orderReconciliation(t.orders, t.lineitem) }),
    "q46_error_diagnostics" -> ((s, d) => errorDiagnostics(Tables(s, d).events)),
    "q49_bpe_tokens"        -> ((s, d) => bpeTokenStats(Tables(s, d).documents)),
    "q32_doc_constraints" -> ((s, d) => documentConstraints(Tables(s, d).documents)),
    "q37_json_props"      -> ((s, d) => jsonPropsHistogram(Tables(s, d).events)),
    "q38_tolerance_check" -> ((s, d) => { val t = Tables(s, d); toleranceConsistency(t.orders, t.lineitem) }),
    "q69_es_hits"         -> ((s, d) => esRoundTrip(Tables(s, d).orders)),
    "q138_table_profile"  -> ((s, d) => tableProfile(Tables(s, d).orders)),
  )

  /** q138 oracle: one UNION ALL arm per orders column. */
  private def tableProfileSql(cols: Seq[String]): String = {
    val arms = cols.map(c =>
      s"""SELECT '$c' AS "column", (SELECT count(*) FROM orders)::BIGINT AS n_rows,
         |  (SELECT count(*) FROM orders WHERE $c IS NULL)::BIGINT AS n_nulls,
         |  (SELECT count(DISTINCT $c) FROM orders)::BIGINT AS n_distinct""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""SELECT "column", n_rows, n_nulls, n_distinct, n_distinct = n_rows AS is_unique
       |FROM ($arms) ORDER BY "column"""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    // computed from the ORIGINAL parquet — equality proves the ORC
    // write→partition-discovery→read chain preserved every row
    "q312_orc_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       sum(list_reduce(list_transform(range(1, 16),
        |             i -> strpos('0123456789abcdef', substr(md5('orc|' || text), i, 1)) - 1),
        |             (a, b) -> a * 16 + b)::BIGINT % 1000000000)::BIGINT AS text_sig
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q247_referential_audit" -> {
      val edges = Seq(
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey -> region", "nation", "n_regionkey", "region", "r_regionkey"))
      val arms = edges.map { case (name, child, ck, parent, pk) =>
        s"""SELECT '$name' AS fk_edge,
           |  (SELECT count(*) FROM $child)::BIGINT AS n_rows,
           |  (SELECT count(*) FROM $child c WHERE NOT EXISTS (
           |     SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))::BIGINT AS n_orphans""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT fk_edge, n_rows, n_orphans,
         |       (n_orphans * 1000000 // n_rows)::BIGINT AS orphan_ppm
         |FROM ($arms) ORDER BY fk_edge""".stripMargin
    },
    "q248_subject_access" ->
      """WITH s AS (SELECT min(c_custkey) AS ck FROM customer),
        |hexv AS (SELECT '0123456789abcdef' AS hx),
        |cu AS (SELECT md5(concat_ws('|', c_custkey::VARCHAR, c_name::VARCHAR,
        |                            c_mktsegment::VARCHAR)) AS h
        |       FROM customer, s WHERE c_custkey = ck),
        |o AS (SELECT o_orderkey,
        |             md5(concat_ws('|', o_orderkey::VARCHAR, o_orderstatus::VARCHAR,
        |                           o_orderpriority::VARCHAR)) AS h
        |      FROM orders, s WHERE o_custkey = ck),
        |l AS (SELECT md5(concat_ws('|', l_orderkey::VARCHAR, l_linenumber::VARCHAR,
        |                           l_returnflag::VARCHAR)) AS h
        |      FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM o)),
        |hx8 AS (
        |  SELECT 'customer' AS table_name, h FROM cu
        |  UNION ALL SELECT 'orders', h FROM o
        |  UNION ALL SELECT 'lineitem', h FROM l),
        |parsed AS (
        |  SELECT table_name,
        |         list_sum(list_transform(range(8),
        |           i -> (strpos(hx, substr(h, CAST(i + 1 AS INT), 1)) - 1)
        |                  * (1::BIGINT << CAST(4 * (7 - i) AS INT)))) AS v
        |  FROM hx8 CROSS JOIN hexv),
        |agg AS (SELECT table_name, count(*)::BIGINT AS n_rows,
        |               coalesce(sum(v), 0)::BIGINT AS content_checksum
        |        FROM parsed GROUP BY table_name)
        |SELECT t.table_name, coalesce(a.n_rows, 0)::BIGINT AS n_rows,
        |       coalesce(a.content_checksum, 0)::BIGINT AS content_checksum
        |FROM (VALUES ('customer'), ('orders'), ('lineitem')) t(table_name)
        |LEFT JOIN agg a ON a.table_name = t.table_name
        |ORDER BY t.table_name""".stripMargin,
    "q228_expectations" ->
      """WITH m AS (
        |  SELECT count(*)::BIGINT AS n,
        |         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_key,
        |         sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_status,
        |         sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1 ELSE 0 END)::BIGINT AS in_domain,
        |         sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)::BIGINT AS positive_price,
        |         count(DISTINCT o_orderkey)::BIGINT AS distinct_keys,
        |         sum(CASE WHEN o_custkey >= 0 THEN 1 ELSE 0 END)::BIGINT AS valid_cust
        |  FROM orders),
        |c AS (
        |  SELECT 'completeness:o_orderkey' AS constraint, ((n - null_key) * 1000000) // n AS metric_q FROM m
        |  UNION ALL SELECT 'completeness:o_orderstatus', ((n - null_status) * 1000000) // n FROM m
        |  UNION ALL SELECT 'domain:o_orderstatus in (O,F,P)', (in_domain * 1000000) // n FROM m
        |  UNION ALL SELECT 'bounds:o_totalprice > 0', (positive_price * 1000000) // n FROM m
        |  UNION ALL SELECT 'uniqueness:o_orderkey', (distinct_keys * 1000000) // n FROM m
        |  UNION ALL SELECT 'referential:o_custkey >= 0', (valid_cust * 1000000) // n FROM m)
        |SELECT "constraint", round(metric_q::DOUBLE / 1000000.0, 6) AS metric,
        |       round(1000000::DOUBLE / 1000000.0, 6) AS threshold,
        |       metric_q >= 1000000 AS passed
        |FROM c ORDER BY "constraint"""".stripMargin,
    "q213_snapshot_diff" ->
      """WITH v1 AS (SELECT o_orderkey AS k,
        |  md5(concat_ws('|', o_custkey, o_orderstatus, round(o_totalprice * 100)::BIGINT,
        |                cast(o_orderdate AS DATE), o_orderpriority)) AS h
        |  FROM orders WHERE o_orderkey % 101 <> 0),
        |v2 AS (SELECT o_orderkey AS k,
        |  md5(concat_ws('|', o_custkey, o_orderstatus,
        |                round((CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 10.0
        |                            ELSE o_totalprice END) * 100)::BIGINT,
        |                cast(o_orderdate AS DATE), o_orderpriority)) AS h
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |d AS (SELECT coalesce(v1.k, v2.k) AS k,
        |        CASE WHEN v1.k IS NULL THEN 'added'
        |             WHEN v2.k IS NULL THEN 'removed'
        |             WHEN v1.h <> v2.h THEN 'changed' END AS change_type
        |      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
        |SELECT change_type, count(*)::BIGINT AS n_rows,
        |       min(k) AS min_key, max(k) AS max_key
        |FROM d WHERE change_type IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q214_benford_audit" ->
      """WITH p AS (SELECT unnest(range(1, 10))::BIGINT AS digit,
        |                  unnest([0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
        |                          0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
        |                          0.05799194697768673, 0.05115252244738129, 0.04575749056067514])::DOUBLE AS p),
        |o AS (SELECT substr((round(o_totalprice * 100)::BIGINT)::VARCHAR, 1, 1)::BIGINT AS digit,
        |             count(*)::BIGINT AS n_obs
        |      FROM orders
        |      WHERE substr((round(o_totalprice * 100)::BIGINT)::VARCHAR, 1, 1)::BIGINT >= 1
        |      GROUP BY 1),
        |tot AS (SELECT sum(n_obs)::BIGINT AS n FROM o),
        |c AS (SELECT p.digit, coalesce(o.n_obs, 0)::BIGINT AS n_obs, p.p, tot.n,
        |             CAST(floor((coalesce(o.n_obs, 0) - tot.n * p.p)
        |                        * (coalesce(o.n_obs, 0) - tot.n * p.p)
        |                        / (tot.n * p.p) * 1000000) AS BIGINT) AS contrib_q
        |      FROM p LEFT JOIN o ON p.digit = o.digit, tot)
        |SELECT digit, n_obs, round(n * p, 2) AS expected,
        |       round(contrib_q::DOUBLE / 1000000.0, 6) AS contrib,
        |       round(sum(contrib_q) OVER ()::DOUBLE / 1000000.0, 6) AS chi2
        |FROM c ORDER BY digit""".stripMargin,
    "q145_reconciliation" ->
      """WITH charges AS (
           SELECT l_orderkey,
                  CAST(sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5)) AS BIGINT) AS charge_cents
           FROM lineitem GROUP BY l_orderkey),
         j AS (SELECT o_orderstatus,
                      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents, charge_cents
               FROM orders LEFT JOIN charges ON o_orderkey = l_orderkey)
         SELECT o_orderstatus, count(*) AS n_orders,
                CAST(coalesce(sum(CASE WHEN charge_cents IS NULL THEN 1 END), 0) AS BIGINT) AS n_no_lines,
                CAST(coalesce(sum(CASE WHEN charge_cents = total_cents THEN 1 END), 0) AS BIGINT) AS n_match,
                CAST(coalesce(sum(CASE WHEN charge_cents IS NOT NULL AND charge_cents <> total_cents THEN 1 END), 0) AS BIGINT) AS n_mismatch,
                CAST(max(CASE WHEN charge_cents IS NOT NULL THEN abs(charge_cents - total_cents) ELSE 0 END) AS BIGINT) AS max_abs_diff_cents
         FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q138_table_profile" -> tableProfileSql(Seq(
      "o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")),
    "q46_error_diagnostics" ->
      """SELECT diagnosis, count(*) AS n, round(avg(value), 4) AS avg_value FROM (
           SELECT value,
             CASE WHEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) >= 90 THEN 'resource_exhausted'
                  WHEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) >= 50 THEN 'illegal_argument'
                  WHEN regexp_matches(props, '"k": \d') THEN 'io_error'
                  ELSE 'unclassified' END AS diagnosis
           FROM events WHERE event_type = 'error')
         GROUP BY diagnosis ORDER BY diagnosis""",
    "q49_bpe_tokens" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))) AS BIGINT) AS total_bpe_tokens,
                round(avg(CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS DOUBLE)), 4) AS avg_bpe_tokens
         FROM documents GROUP BY lang ORDER BY lang""",
    "q32_doc_constraints" ->
      """SELECT
           CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_text,
           CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_len_mismatch,
           CAST(sum(CASE WHEN lang NOT IN ('en','fr','es','zh','de') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_lang,
           count(*) AS n_total
         FROM documents""",
    "q37_json_props" ->
      """SELECT bucket, count(*) AS n, min(k) AS min_k, max(k) AS max_k
         FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
                      CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS bucket
               FROM events)
         GROUP BY bucket ORDER BY bucket""",
    "q38_tolerance_check" ->
      """SELECT close_enough, count(*) AS n_orders FROM (
           SELECT abs(o_totalprice - li_total) / (abs(o_totalprice) + abs(li_total)) < 0.05 AS close_enough
           FROM orders JOIN (
             SELECT l_orderkey,
                    sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS li_total
             FROM lineitem GROUP BY l_orderkey) s
           ON o_orderkey = s.l_orderkey)
         GROUP BY close_enough ORDER BY close_enough""",
    "q69_es_hits" ->
      """SELECT 'order-' || o_orderkey AS uuid,
                o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                strftime(o_orderdate, '%Y-%m-%d') AS created_date,
                o_orderpriority
         FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey <= 970000 ORDER BY uuid""",
  )
}
