package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches over the token stream —
  * the sketch family a 100 TB corpus dashboard actually runs on
  * (exact `count(distinct)` and exact per-token counts both shuffle
  * the raw token stream; these shuffle fixed-size register arrays).
  *
  * Both queries are CALIBRATION reports: sketch estimate side-by-side
  * with the exact answer (affordable at oracle scale), so the accuracy
  * claim is itself oracle-checked — the q94 (MinHash estimate vs exact
  * Jaccard) pattern.
  *
  * Cross-engine determinism: every hash is a 60-bit integer parsed
  * from 15 hex chars of md5 (engine-portable, the q66 convention); the
  * HLL harmonic sum is computed in SCALED INTEGER form (Σ 2^(55−r) ≤
  * 64·2^55 < 2^63 — exact in int64/HUGEINT, one IEEE int→double
  * conversion at the end), so there is NO float summation order to pin
  * — stronger than the sorted-fold contract the float queries need.
  */
object Sketches extends QueryModule {

  private def toks(documents: DataFrame): DataFrame =
    // fanOut: the tokenize-explode (and the 4-way hash expansion most
    // consumers stack on it) runs before any exchange — one core over a
    // one-row-group scan otherwise (graft.plans.Scans)
    graft.plans.Scans.fanOut(documents)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))

  /** 60-bit salted hash of a token: md5 hex prefix parsed as an integer
    * (identical arithmetic on the DuckDB side via a list_reduce fold).
    */
  private def hash60(salt: String, c: Column): Column =
    conv(substring(md5(concat(lit(salt + "|"), c)), 1, 15), 16, 10).cast("long")

  /** q106: HyperLogLog distinct-token estimate per source vs the exact
    * vocabulary — m = 64 registers (p = 6), rank = leading-zero count
    * of the remaining 54 bits + 1, with the standard small-range linear
    * counting correction (Flajolet et al. 2007).
    *
    * Scale shape: the registers are ONE groupBy (source, bucket) with
    * map-side partial `max` — at 100 TB each executor reduces its
    * token stream to ≤ 64 longs per source before the shuffle, and
    * registers from different days/partitions MERGE by pointwise max
    * (spec-pinned), which is what makes the sketch incrementally
    * maintainable. Repeated tokens collapse into the same register
    * update, so NO distinct shuffle ever happens — the exact
    * `vocab_exact` column beside it is the calibration reference, not
    * part of the sketch path.
    */
  def hllDistinct(documents: DataFrame): DataFrame = {
    val t = toks(documents)
    val h = t.select(col("source"), hash60("hll", col("w")).as("v"))
      .select(col("source"), (col("v") % 64).as("bucket"), expr("v div 64").as("rest"))
    val rank = when(col("rest") === 0, lit(55))
      .otherwise(lit(55) - length(bin(col("rest")))).cast("int")
    val regs = h.select(col("source"), col("bucket"), rank.as("r"))
      .groupBy("source", "bucket").agg(max("r").as("r"))
    // Σ 2^(55−r) over present buckets + 2^55 per empty bucket: exact
    // integer arithmetic (≤ 64·2^55 < 2^63), ONE int→double conversion
    val agg = regs.groupBy("source").agg(
      count(lit(1)).as("n_buckets"),
      sum(expr("shiftleft(1L, cast(55 - r as int))")).as("s"))
      .withColumn("m0", lit(64L) - col("n_buckets"))
      .withColumn("sum_pow",
        (col("s") + col("m0") * expr("shiftleft(1L, 55)")).cast("double") / lit(math.pow(2, 55)))
    val raw = lit(0.709 * 64 * 64) / col("sum_pow")
    val est = when(raw <= 160.0 && col("m0") > 0, lit(64.0) * log(lit(64.0) / col("m0")))
      .otherwise(raw)
    val exact = t.groupBy("source").agg(countDistinct(col("w")).as("vocab_exact"))
    agg.join(exact, "source")
      .select(col("source"), col("vocab_exact"), col("n_buckets"), col("m0"),
        round(est, 4).as("hll_est"),
        round((est - col("vocab_exact")) / col("vocab_exact"), 4).as("rel_err"))
      .orderBy("source")
  }

  /** q107: count-min sketch (Cormode & Muthukrishnan 2005) frequency
    * estimates for the corpus's top-k tokens vs their exact counts —
    * depth d = 4 salted rows × width w = 64 buckets.
    *
    * Scale shape: the counter table is ONE groupBy over a 4-row
    * explode, map-side combined to ≤ 256 cells per partition — the raw
    * token stream never shuffles, and cells from separate batches merge
    * by addition (the CMS mergeability contract, spec-pinned). Probing
    * broadcasts the 256-cell table onto the bounded probe set. The
    * estimate is min over rows, so it can only OVERcount (spec-pinned;
    * the `overest` column is the calibration signal).
    */
  def cmsFrequencies(documents: DataFrame, depth: Int = 4, probeK: Int = 10): DataFrame = {
    val t = toks(documents).select("w")
    val cells = t.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), (hash60(s"cm$j", col("w")) % 64).as("b"))): _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val probes = t.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("w")).limit(probeK)
    val probeCells = probes.select(col("w"), col("exact_cnt"),
      explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), (hash60(s"cm$j", col("w")) % 64).as("b"))): _*)).as("c"))
      .select(col("w"), col("exact_cnt"), col("c.j").as("j"), col("c.b").as("b"))
    probeCells.join(broadcast(cells), Seq("j", "b"))
      .groupBy("w")
      .agg(max("exact_cnt").as("exact_cnt"), min("cnt").as("cm_est"))
      .withColumn("overest", col("cm_est") - col("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("w"))
  }

  /** q113: Bloom-filter membership calibration over 3-gram shingles —
    * a reference batch (docs with doc_id ≡ 0 mod 10) builds an
    * m-bit / k-hash filter; every source's distinct shingles probe it,
    * and the report shows claimed vs true membership per source. The
    * filter is the cheap first pass of incremental dedup /
    * decontamination (q99/q75's exact-index lookup, but constant-size):
    * a batch shingle that misses CANNOT be in the corpus, and the
    * measured false-positive rate is the price of the shortcut.
    *
    * Scale shape: the bit set is ≤ m rows and broadcasts; probing is a
    * narrow 4-way position explode against it. The exact semi-join
    * producing `n_member` is the CALIBRATION REFERENCE only (the q106
    * pattern) — production keeps just the broadcast bits. No false
    * negatives by construction (spec-pinned): claimed ⊇ member.
    * m is the scale knob — size it to the expected reference
    * cardinality (fill_frac in the output is the saturation gauge).
    */
  def bloomCalibration(documents: DataFrame, m: Int = 16384, k: Int = 4): DataFrame = {
    val sh = documents.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.ShingleSet.shingleSet(col("text"), 3)).as("sh"))
    def pos(j: Int, c: Column): Column = hash60(s"bf$j", c) % m
    val ref = sh.filter(col("doc_id") % 10 === 0).select("sh").distinct()
    val bits = ref
      .select(explode(array((0 until k).map(j => pos(j, col("sh"))): _*)).as("pos"))
      .distinct().withColumn("hit", lit(1))
    val probe = sh.select("source", "sh").distinct()
    val claimed = probe
      .select(col("source"), col("sh"),
        explode(array((0 until k).map(j => pos(j, col("sh"))): _*)).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left")
      .groupBy("source", "sh")
      .agg((count(col("hit")) === k).as("claimed"))
    val member = probe.join(ref.select(col("sh"), lit(1).as("is_member")), Seq("sh"), "left")
    val refStats = ref.agg(count(lit(1)).as("n_ref"))
      .crossJoin(bits.agg(count(lit(1)).as("bits_set")))
    claimed.join(member, Seq("source", "sh"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_probe"),
        coalesce(sum(col("is_member")), lit(0L)).cast("long").as("n_member"),
        sum(when(col("claimed"), 1L).otherwise(0L)).as("n_claimed"))
      .crossJoin(broadcast(refStats))
      .withColumn("false_pos", col("n_claimed") - col("n_member"))
      .withColumn("fp_rate",
        round(col("false_pos") / greatest(col("n_probe") - col("n_member"), lit(1L)).cast("double"), 4))
      .withColumn("fill_frac", round(col("bits_set") / lit(m.toDouble), 4))
      .select(col("source"), col("n_probe"), col("n_member"), col("n_claimed"),
        col("false_pos"), col("fp_rate"), col("n_ref"), col("bits_set"), col("fill_frac"))
      .orderBy("source")
  }

  /** q127: histogram-quantile sketch calibration — per-source p50/p90/
    * p99 of `n_chars` estimated from a fixed-width integer-bin
    * histogram (uniform-within-bin interpolation), side by side with
    * the exact interpolated order statistic (the q115 percentile
    * contract). The histogram is THE mergeable quantile structure: bins
    * add across partitions/days, so the sketch maintains incrementally
    * where the exact percentile would re-sort the world.
    *
    * Determinism: bin keys and cumulative counts are integers (floor-
    * div binning, integer window sums); both estimates are closed-form
    * doubles over those integers. The bin-pick predicate
    * cum_before < q·n ≤ cum_before + bc runs on identical doubles on
    * both engines.
    *
    * Scale shape: one (source, bin) map-side-combined count; windows
    * run over the bounded histogram, never the fact table. The exact
    * side is calibration-only reference (oracle-affordable SFs).
    */
  def quantileSketchCalibration(documents: DataFrame, binWidth: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qdf = documents.sparkSession.range(1)
      .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
    val hist = documents
      .groupBy(col("source"), expr(s"n_chars div $binWidth").as("bin"))
      .agg(count(lit(1)).as("bc"))
    val wb = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cum_before", coalesce(sum(col("bc")).over(wb), lit(0L)))
    val totals = documents.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val est = cum
      .join(broadcast(totals), "source").crossJoin(broadcast(qdf))
      .withColumn("r", col("q") * col("n_docs"))
      .filter(col("cum_before") < col("r") && col("r") <= col("cum_before") + col("bc"))
      .select(col("source"), col("q"), col("n_docs"),
        (col("bin") * binWidth +
         lit(binWidth) * (col("r") - col("cum_before")) / col("bc")).as("sketch_raw"))
    // exact reference: explicit vl + (vu − vl)·frac over the bracketing
    // order statistics (the q115 interpolation contract)
    val wr = Window.partitionBy("source").orderBy("n_chars")
    val exact = documents.select(col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(wr).cast("long") - 1)
      .join(broadcast(totals), "source").crossJoin(broadcast(qdf))
      .withColumn("h", (col("n_docs") - 1) * col("q"))
      .filter(col("rn") === floor(col("h")) || col("rn") === ceil(col("h")))
      .groupBy("source", "q")
      .agg(max(when(col("rn") === floor(col("h")), col("n_chars"))).as("vl"),
        max(when(col("rn") === ceil(col("h")), col("n_chars"))).as("vu"),
        max(col("h")).as("h"))
      .select(col("source"), col("q"),
        (col("vl") + (col("vu") - col("vl")) * (col("h") - floor(col("h")))).as("exact_raw"))
    est.join(exact, Seq("source", "q"))
      .select(col("source"), col("q"), col("n_docs"),
        round(col("sketch_raw"), 4).as("sketch_est"),
        round(col("exact_raw"), 4).as("exact_pct"),
        round(col("sketch_raw") - col("exact_raw"), 4).as("err"))
      .orderBy("source", "q")
  }

  /** q257: ROLLING 7-DAY DISTINCT USERS via daily HLL register merge —
    * the sliding-window face of the q106 mergeability contract: build
    * 64 HLL registers PER DAY (one scan of the stream), then the 7-day
    * estimate for every day is a pure REGISTER-LEVEL max over the
    * window — expressed relationally as a bucket-partitioned,
    * day-ordered RANGE window over the (day × bucket) grid, so no raw
    * event is ever touched twice. The exact rolling distinct (a day ×
    * day-users range join that re-scans every user id 7 times) rides
    * along as the calibration reference, q106/q113 doctrine — at scale
    * it is precisely the thing the register merge replaces.
    */
  def rollingHllUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = events.select(expr("unix_micros(ts) div 86400000000").as("day"),
        hash60("rhll", col("user_id").cast("string")).as("v"))
      .select(col("day"), (col("v") % 64).as("bucket"), expr("v div 64").as("rest"))
    val rank = when(col("rest") === 0, lit(55))
      .otherwise(lit(55) - length(bin(col("rest")))).cast("int")
    val daily = h.select(col("day"), col("bucket"), rank.as("r"))
      .groupBy("day", "bucket").agg(max("r").as("r"))
    // day × bucket grid so a bucket seen 3 days ago still reaches
    // today's merge; grid is days·64 rows, model-sized
    val days = daily.select("day").distinct()
    val grid = days.crossJoin(daily.select("bucket").distinct())
      .join(daily, Seq("day", "bucket"), "left")
    val wWin = Window.partitionBy("bucket").orderBy("day")
      .rangeBetween(-(windowDays - 1), 0)
    val merged = grid.withColumn("rw", max("r").over(wWin))
      .filter(col("rw").isNotNull)
    val agg = merged.groupBy("day").agg(
        count(lit(1)).as("n_buckets"),
        sum(expr("shiftleft(1L, cast(55 - rw as int))")).as("s"))
      .withColumn("m0", lit(64L) - col("n_buckets"))
      .withColumn("sum_pow",
        (col("s") + col("m0") * expr("shiftleft(1L, 55)")).cast("double") / lit(math.pow(2, 55)))
    val raw = lit(0.709 * 64 * 64) / col("sum_pow")
    val est = when(raw <= 160.0 && col("m0") > 0, lit(64.0) * log(lit(64.0) / col("m0")))
      .otherwise(raw)
    val du = events.select(expr("unix_micros(ts) div 86400000000").as("uday"),
      col("user_id")).distinct()
    val exact = days.join(du,
        col("uday").between(col("day") - (windowDays - 1), col("day")))
      .groupBy("day").agg(countDistinct("user_id").as("exact_users"))
    agg.join(exact, "day")
      .select(to_date(timestamp_micros(col("day") * 86400000000L)).as("window_end"),
        col("exact_users"), col("n_buckets"), col("m0"),
        round(est, 4).as("hll_est"),
        round((est - col("exact_users")) / col("exact_users"), 4).as("rel_err"))
      .orderBy("window_end")
  }

  /** q309: self-join-size (F₂) estimation from the q107 count-min
    * sketch — the optimizer-support primitive: |R ⋈ₖ R| = Σₖ cnt(k)²
    * is the second frequency moment, and a CMS estimates it WITHOUT
    * materializing the key histogram as minⱼ Σ_b c[j][b]² (the
    * AMS-style inner product of the sketch with itself; collisions
    * only ADD mass, so the estimate is a guaranteed upper bound —
    * exactly what a join planner wants before picking a strategy for
    * a key it has never scanned). Reported against the exact F₂ with
    * the overestimate in ppm, the same calibration-report contract as
    * q106/q113.
    *
    * Scale shape: the sketch is ONE map-side-combined pass → depth×width
    * cells; the exact side (kept as the calibration reference, like
    * q113's exact semi-join) is one keyed count. At 100 TB only the
    * sketch pass runs; the exact pass is the test harness.
    */
  def selfJoinSizeEstimate(li: DataFrame, depth: Int = 4,
                           width: Int = 64): DataFrame = {
    // fanOut: four salted md5 hashes per lineitem row run before the
    // first exchange — single-threaded over a one-row-group scan
    // otherwise (graft.plans.Scans)
    val keys = graft.plans.Scans.fanOut(
      li.select(col("l_partkey").cast("string").as("k")))
    val cells = keys.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), (hash60(s"js$j", col("k")) % width).as("b"))): _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b")).agg(count(lit(1)).as("cnt"))
    val est = cells.groupBy("j").agg(sum(col("cnt") * col("cnt")).as("f2"))
      .agg(min("f2").as("cms_f2"))
    val exact = keys.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_f2"), count(lit(1)).as("n_keys"))
    exact.crossJoin(broadcast(est))
      .select(col("n_keys"), col("exact_f2"), col("cms_f2"),
        expr("(cms_f2 - exact_f2) * 1000000L div exact_f2").as("overest_ppm"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q309_joinsize_cms" -> ((s, d) => selfJoinSizeEstimate(Tables(s, d).lineitem)),
    "q257_rolling_hll" -> ((s, d) => rollingHllUsers(Tables(s, d).events)),
    "q106_hll_distinct" -> ((s, d) => hllDistinct(Tables(s, d).documents)),
    "q222_theta_overlap" -> ((s, d) => thetaOverlap(Tables(s, d).documents)),
    "q107_cms_freq"     -> ((s, d) => cmsFrequencies(Tables(s, d).documents)),
    // fanOut A/B'd NEGATIVE here too (r14, plans/r14/bench/ab113_*): 4
    // alternated pairs, old min-of-2 [2.13, 2.30, 2.30, 1.73] vs fanned
    // [1.71, 2.57, 2.79, 2.85] — the two shingle consumers (ref filter,
    // probe distinct) each shuffle immediately, so the single-task
    // pre-exchange segment is short and the inserted round-robin
    // exchange buys nothing. Same verdict as the r13 17-query sweep.
    "q113_bloom_calibration" -> ((s, d) => bloomCalibration(Tables(s, d).documents)),
    "q127_quantile_sketch" -> ((s, d) => quantileSketchCalibration(Tables(s, d).documents)),
  )

  /** 15-hex-char md5 prefix → 60-bit integer, as a DuckDB fold — the
    * oracle mirror of [[hash60]].
    */
  /** q222: KMV (theta-sketch) SET OPERATIONS — pairwise source-overlap
    * estimated from k-minimum-value document sketches. This is the
    * operation the HLL family can't express: HLL registers union by
    * pointwise max but never intersect; a KMV sample IS a uniform
    * sample of the hashed universe below θ, so A∩B and A∪B estimates
    * fall out of plain array intersection on the two samples cut to
    * the pair's common θ = min(θ_A, θ_B). The ratio estimator
    * |A'∩B'|/|A'∪B'| needs no scaling at all — Jaccard is
    * scale-invariant.
    *
    * Calibration report (the q94/q106/q113 doctrine): the estimate
    * rides next to the exact pairwise Jaccard, so the accuracy claim is
    * itself oracle-checked. Everything before the final two divisions
    * is exact integer arithmetic on 60-bit md5 hashes.
    *
    * Scale shape: the corpus collapses to ≤ k 8-byte hashes per source
    * (row_number ≤ k compiles to WindowGroupLimit — each map task keeps
    * k rows per source before the shuffle); the pairwise frame is
    * #sources², never corpus-sized; sketches persist and MERGE (union
    * two samples, keep the k smallest), so cross-day overlap at 100 TB
    * reads yesterday's 512 B sketch, not yesterday's corpus. The exact
    * column is the affordable-at-oracle-scale reference only.
    */
  def thetaOverlap(documents: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val U = 1152921504606846976L // 16^15: hash60's universe size
    val fps = documents.select(col("source"), hash60("theta", col("text")).as("h")).distinct()
    val exact = fps.groupBy("source").agg(count(lit(1)).as("n_exact"))
    val w = Window.partitionBy("source").orderBy("h")
    val sk = fps.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy("source").agg(
        sort_array(collect_list("h")).as("sample"),
        count(lit(1)).as("cnt"), max("h").as("kth"))
      .withColumn("theta", when(col("cnt") < k, lit(U)).otherwise(col("kth")))
    val pairs = sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.sample").as("sa"), col("b.sample").as("sb"),
        least(col("a.theta"), col("b.theta")).as("th"))
      .withColumn("fa", expr("filter(sa, x -> x < th)"))
      .withColumn("fb", expr("filter(sb, x -> x < th)"))
      .withColumn("ni", size(array_intersect(col("fa"), col("fb"))).cast("long"))
      .withColumn("nu", size(array_union(col("fa"), col("fb"))).cast("long"))
    val inter = fps.as("x").join(fps.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    pairs
      .join(exact.select(col("source").as("source_a"), col("n_exact").as("na")), "source_a")
      .join(exact.select(col("source").as("source_b"), col("n_exact").as("nb")), "source_b")
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("est_jaccard",
        round(expr("case when nu = 0 then 0.0 else cast(ni as double) / nu end"), 4))
      .withColumn("exact_jaccard",
        round(expr("cast(n_inter as double) / (na + nb - n_inter)"), 4))
      .select(col("source_a"), col("source_b"), col("ni").as("sample_common"),
        col("est_jaccard"), col("exact_jaccard"),
        round(expr("abs(est_jaccard - exact_jaccard)"), 4).as("abs_err"))
      .orderBy("source_a", "source_b")
  }

  private def hx(saltedArg: String): String =
    s"list_reduce(list_transform(range(1, 16), i -> strpos('0123456789abcdef', substr(md5($saltedArg), i, 1)) - 1), (a, b) -> a * 16 + b)::UBIGINT"

  override def oracles: Map[String, String] = Map(
    "q309_joinsize_cms" ->
      s"""WITH keys AS (SELECT l_partkey::VARCHAR AS k FROM lineitem),
        |cells AS (SELECT j, ${hx("'js' || j || '|' || k")} % 64 AS b,
        |                 count(*)::BIGINT AS cnt
        |          FROM keys CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
        |          GROUP BY 1, 2),
        |est AS (SELECT min(f2)::BIGINT AS cms_f2
        |        FROM (SELECT j, sum(cnt * cnt) AS f2 FROM cells GROUP BY 1)),
        |ex AS (SELECT sum(c * c)::BIGINT AS exact_f2, count(*)::BIGINT AS n_keys
        |       FROM (SELECT k, count(*)::BIGINT AS c FROM keys GROUP BY 1))
        |SELECT n_keys, exact_f2, cms_f2,
        |       ((cms_f2 - exact_f2) * 1000000 // exact_f2)::BIGINT AS overest_ppm
        |FROM ex, est""".stripMargin,
    "q257_rolling_hll" ->
      s"""WITH h AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |                  ${hx("'rhll|' || user_id::VARCHAR")} AS v
        |           FROM events),
        |daily AS (
        |  SELECT day, v % 64 AS bucket,
        |         max(CASE WHEN v // 64 = 0 THEN 55
        |                  ELSE 55 - length(bin(v // 64)) END)::INTEGER AS r
        |  FROM h GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM daily),
        |grid AS (SELECT d.day, b.bucket, daily.r
        |         FROM days d CROSS JOIN (SELECT DISTINCT bucket FROM daily) b
        |         LEFT JOIN daily ON daily.day = d.day AND daily.bucket = b.bucket),
        |merged AS (
        |  SELECT day, bucket,
        |         max(r) OVER (PARTITION BY bucket ORDER BY day
        |                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rw
        |  FROM grid),
        |agg AS (
        |  SELECT day, count(*)::BIGINT AS n_buckets, (64 - count(*))::BIGINT AS m0,
        |         (sum((1::UBIGINT << (55 - rw))::HUGEINT)
        |          + (64 - count(*))::HUGEINT * (1::UBIGINT << 55)::HUGEINT)::DOUBLE
        |           / 36028797018963968.0 AS sum_pow
        |  FROM merged WHERE rw IS NOT NULL GROUP BY 1),
        |est AS (
        |  SELECT day, n_buckets, m0,
        |         CASE WHEN (0.709 * 64 * 64) / sum_pow <= 160.0 AND m0 > 0
        |              THEN 64.0 * ln(64.0 / m0)
        |              ELSE (0.709 * 64 * 64) / sum_pow END AS e
        |  FROM agg),
        |du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS uday, user_id FROM events),
        |ex AS (SELECT d.day, count(DISTINCT du.user_id)::BIGINT AS exact_users
        |       FROM days d JOIN du ON du.uday BETWEEN d.day - 6 AND d.day
        |       GROUP BY d.day)
        |SELECT epoch_ms(est.day * 86400000)::DATE AS window_end,
        |       ex.exact_users, est.n_buckets, est.m0,
        |       round(est.e, 4) AS hll_est,
        |       round((est.e - ex.exact_users) / ex.exact_users, 4) AS rel_err
        |FROM est JOIN ex ON est.day = ex.day ORDER BY window_end""".stripMargin,
    "q222_theta_overlap" ->
      s"""WITH fps AS (SELECT DISTINCT source, ${hx("'theta|' || text")}::BIGINT AS h FROM documents),
        |ex AS (SELECT source, count(*)::BIGINT AS n_exact FROM fps GROUP BY 1),
        |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk FROM fps),
        |sk AS (SELECT source, array_agg(h ORDER BY h) AS sample, count(*)::BIGINT AS cnt,
        |              max(h) AS kth
        |       FROM rk WHERE rk <= 64 GROUP BY 1),
        |sk2 AS (SELECT source, sample,
        |               CASE WHEN cnt < 64 THEN 1152921504606846976 ELSE kth END AS theta
        |        FROM sk),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |             list_filter(a.sample, x -> x < least(a.theta, b.theta)) AS fa,
        |             list_filter(b.sample, x -> x < least(a.theta, b.theta)) AS fb
        |      FROM sk2 a JOIN sk2 b ON a.source < b.source),
        |c AS (SELECT source_a, source_b,
        |             len(list_intersect(fa, fb))::BIGINT AS ni,
        |             len(list_distinct(list_concat(fa, fb)))::BIGINT AS nu
        |      FROM p),
        |iex AS (SELECT x.source AS source_a, y.source AS source_b, count(*)::BIGINT AS n_inter
        |        FROM fps x JOIN fps y ON x.h = y.h AND x.source < y.source GROUP BY 1, 2),
        |j AS (SELECT c.source_a, c.source_b, ni, nu,
        |             coalesce(iex.n_inter, 0)::BIGINT AS n_inter, ea.n_exact AS na, eb.n_exact AS nb
        |      FROM c
        |      JOIN ex ea ON ea.source = c.source_a
        |      JOIN ex eb ON eb.source = c.source_b
        |      LEFT JOIN iex ON iex.source_a = c.source_a AND iex.source_b = c.source_b),
        |r AS (SELECT source_a, source_b, ni AS sample_common,
        |             round(CASE WHEN nu = 0 THEN 0.0 ELSE ni::DOUBLE / nu END, 4) AS est_jaccard,
        |             round(n_inter::DOUBLE / (na + nb - n_inter), 4) AS exact_jaccard
        |      FROM j)
        |SELECT source_a, source_b, sample_common, est_jaccard, exact_jaccard,
        |       round(abs(est_jaccard - exact_jaccard), 4) AS abs_err
        |FROM r ORDER BY source_a, source_b""".stripMargin,
    // integer bins + cumulative counts; both estimates are closed-form
    // doubles over the integer moments
    "q127_quantile_sketch" ->
      """WITH qs AS (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q),
        |hist AS (
        |  SELECT source, n_chars // 64 AS bin, count(*)::BIGINT AS bc
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, bin, bc,
        |         coalesce(sum(bc) OVER (PARTITION BY source ORDER BY bin
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
        |  FROM hist),
        |tot AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
        |est AS (
        |  SELECT c.source, q, n_docs,
        |         bin * 64 + 64 * (q * n_docs - cum_before) / bc AS sketch_raw
        |  FROM cum c JOIN tot USING (source), qs
        |  WHERE cum_before < q * n_docs AND q * n_docs <= cum_before + bc),
        |ranked AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS rn
        |  FROM documents),
        |ex AS (
        |  SELECT r.source, q,
        |         max(CASE WHEN rn = floor((n_docs - 1) * q) THEN n_chars END)
        |         + (max(CASE WHEN rn = ceil((n_docs - 1) * q) THEN n_chars END)
        |            - max(CASE WHEN rn = floor((n_docs - 1) * q) THEN n_chars END))
        |           * ((n_docs - 1) * q - floor((n_docs - 1) * q)) AS exact_raw
        |  FROM ranked r JOIN tot USING (source), qs
        |  WHERE rn = floor((n_docs - 1) * q) OR rn = ceil((n_docs - 1) * q)
        |  GROUP BY r.source, q, n_docs)
        |SELECT est.source, est.q, n_docs,
        |       round(sketch_raw, 4) AS sketch_est,
        |       round(exact_raw, 4) AS exact_pct,
        |       round(sketch_raw - exact_raw, 4) AS err
        |FROM est JOIN ex ON est.source = ex.source AND est.q = ex.q
        |ORDER BY est.source, est.q""".stripMargin,
    // identical 60-bit hash (md5-prefix fold), identical integer
    // register arithmetic; the single int->double conversion and the
    // ln() in the small-range branch are the only float ops
    "q106_hll_distinct" ->
      s"""WITH toks AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |h AS (SELECT source, ${hx("'hll|' || w")} AS v FROM toks),
        |reg AS (
        |  SELECT source, v % 64 AS bucket,
        |         max(CASE WHEN v // 64 = 0 THEN 55
        |                  ELSE 55 - length(bin(v // 64)) END)::INTEGER AS r
        |  FROM h GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, count(*)::BIGINT AS n_buckets, (64 - count(*))::BIGINT AS m0,
        |         (sum((1::UBIGINT << (55 - r))::HUGEINT)
        |          + (64 - count(*))::HUGEINT * (1::UBIGINT << 55)::HUGEINT)::DOUBLE
        |           / 36028797018963968.0 AS sum_pow
        |  FROM reg GROUP BY 1),
        |est AS (
        |  SELECT source, n_buckets, m0,
        |         CASE WHEN (0.709 * 64 * 64) / sum_pow <= 160.0 AND m0 > 0
        |              THEN 64.0 * ln(64.0 / m0)
        |              ELSE (0.709 * 64 * 64) / sum_pow END AS e
        |  FROM agg),
        |ex AS (SELECT source, count(DISTINCT w)::BIGINT AS vocab_exact FROM toks GROUP BY 1)
        |SELECT est.source, vocab_exact, n_buckets, m0,
        |       round(e, 4) AS hll_est,
        |       round((e - vocab_exact) / vocab_exact, 4) AS rel_err
        |FROM est JOIN ex ON est.source = ex.source ORDER BY est.source""".stripMargin,
    // identical shingle windows (the q91 slice form), identical salted
    // positions, pure integer counts end to end
    "q113_bloom_calibration" ->
      s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ts
        |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        |  SELECT doc_id, source, array_to_string(ts[i:i+2], ' ') AS sh
        |  FROM (SELECT doc_id, source, ts, unnest(range(1, len(ts) - 1)) AS i FROM d)),
        |ref AS (SELECT DISTINCT sh FROM sh0 WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT DISTINCT pos FROM (
        |    SELECT unnest([${(0 until 4).map(j => hx(s"'bf$j|' || sh") + " % 16384").mkString(", ")}]) AS pos
        |    FROM ref)),
        |probe AS (SELECT DISTINCT source, sh FROM sh0),
        |pp AS (
        |  SELECT source, sh,
        |         unnest([${(0 until 4).map(j => hx(s"'bf$j|' || sh") + " % 16384").mkString(", ")}]) AS pos
        |  FROM probe),
        |cl AS (
        |  SELECT source, sh, (count(b.pos) = 4) AS claimed
        |  FROM pp LEFT JOIN bits b ON pp.pos = b.pos GROUP BY 1, 2),
        |mem AS (
        |  SELECT p.source, p.sh, CASE WHEN r.sh IS NULL THEN 0 ELSE 1 END AS is_member
        |  FROM probe p LEFT JOIN ref r ON p.sh = r.sh),
        |stats AS (SELECT (SELECT count(*) FROM ref)::BIGINT AS n_ref,
        |                 (SELECT count(*) FROM bits)::BIGINT AS bits_set),
        |g AS (
        |  SELECT cl.source AS source, count(*)::BIGINT AS n_probe,
        |         sum(is_member)::BIGINT AS n_member,
        |         sum(CASE WHEN claimed THEN 1 ELSE 0 END)::BIGINT AS n_claimed
        |  FROM cl JOIN mem ON cl.source = mem.source AND cl.sh = mem.sh
        |  GROUP BY 1)
        |SELECT source, n_probe, n_member, n_claimed,
        |       (n_claimed - n_member)::BIGINT AS false_pos,
        |       round((n_claimed - n_member) / greatest(n_probe - n_member, 1)::DOUBLE, 4) AS fp_rate,
        |       n_ref, bits_set, round(bits_set / 16384.0, 4) AS fill_frac
        |FROM g, stats ORDER BY source""".stripMargin,
    // pure integer counts end to end
    "q107_cms_freq" ->
      s"""WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |cells AS (
        |  SELECT j, ${hx("'cm' || j || '|' || w")} % 64 AS b, count(*)::BIGINT AS cnt
        |  FROM toks CROSS JOIN (SELECT unnest(range(0, 4)) AS j) GROUP BY 1, 2),
        |probes AS (
        |  SELECT w, count(*)::BIGINT AS exact_cnt FROM toks GROUP BY 1
        |  ORDER BY exact_cnt DESC, w LIMIT 10),
        |pc AS (
        |  SELECT w, exact_cnt, j, ${hx("'cm' || j || '|' || w")} % 64 AS b
        |  FROM probes CROSS JOIN (SELECT unnest(range(0, 4)) AS j))
        |SELECT pc.w AS w, max(exact_cnt)::BIGINT AS exact_cnt,
        |       min(cnt)::BIGINT AS cm_est,
        |       (min(cnt) - max(exact_cnt))::BIGINT AS overest
        |FROM pc JOIN cells ON pc.j = cells.j AND pc.b = cells.b
        |GROUP BY pc.w ORDER BY exact_cnt DESC, w""".stripMargin,
  )
}
