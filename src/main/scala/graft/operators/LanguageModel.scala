package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-bigram language-model perplexity filtering — the CCNet-style
  * quality gate: fit ONE pooled Laplace-smoothed bigram LM on a
  * deterministic corpus split, score every held-out document by its
  * average per-bigram cost, and split each language's scored docs at the
  * median into fluent HEAD and disfluent TAIL halves (CCNet's
  * head/middle/tail collapsed to the two halves a filter actually acts
  * on).
  *
  * This is the unsupervised counterpart of q187's supervised NB langid:
  * same micro-nat quantization doctrine (every per-bigram cost is
  * floor(−ln p · 10⁶) BEFORE summation → per-doc scores are integer sums,
  * order-independent under any partitioning), but the model is a single
  * fluency prior rather than a per-language classifier.
  *
  * Scale:
  *  - training is one exploded-bigram pass collapsing into the bounded
  *    (bg → count) frame; every other statistic derives from that frame;
  *  - the model is alphabet-bounded and explicitly `broadcast` into the
  *    scoring join — the held-out corpus is scored map-side with one
  *    shuffle for the per-doc aggregation;
  *  - the per-language median cutoff is an EXACT order statistic computed
  *    WITHOUT sorting documents: scores are already integers, so we
  *    aggregate to a (lang, score → n_docs) histogram and take the first
  *    score whose running count reaches ⌈n/2⌉ — the window runs over the
  *    distinct-score frame, not the corpus (coarsen the quantization if
  *    a 100 TB corpus ever made distinct scores corpus-sized).
  *
  * Reference provenance: the reference pipeline gates ingest on dataset
  * QA status transitions (src/ingest-pipeline/airflow/dags/status_change
  * .py); this is the corresponding content-level quality gate for a
  * training-data pipeline.
  */
object LanguageModel extends QueryModule {

  /** (doc_id, lang, bg) — one row per character-bigram of lowercased text. */
  private def bigrams(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("lang"),
        explode(expr("sequence(1, char_length(t) - 1)")).as("i"), col("t"))
      .select(col("doc_id"), col("lang"), expr("substring(t, i, 2)").as("bg"))

  /** q230: train on doc_id % 10 < 8, score doc_id % 10 ≥ 8, report per
    * language (n_docs, median cutoff in micro-nats, head/tail counts).
    */
  def perplexityFilter(docs: DataFrame): DataFrame = {
    // fanOut: the per-character bigram explode below multiplies each doc
    // into len(t) rows BEFORE the first exchange — over a one-row-group
    // scan that whole expansion runs on one core (graft.plans.Scans)
    val eligible = graft.plans.Scans.fanOut(docs)
      .select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 2)
    val train = eligible.filter(col("doc_id") % 10 < 8)
    val test  = eligible.filter(col("doc_id") % 10 >= 8)

    val cnt = bigrams(train).groupBy("bg").agg(count(lit(1)).as("c"))
    // v = |vocab| = rows of cnt; tl = total bigram tokens
    val stats = cnt.agg(sum("c").as("tl"), count(lit(1)).as("v"))
    val seenCost = cnt.crossJoin(broadcast(stats)).select(col("bg"),
      expr("cast(floor(-ln((c + 1) / cast(tl + v as double)) * 1000000) as bigint)")
        .as("cost"))
    val unseenCost = stats.select(
      expr("cast(floor(-ln(1.0 / cast(tl + v as double)) * 1000000) as bigint)")
        .as("cost0"))

    val teBg = bigrams(test).groupBy("doc_id", "lang", "bg").agg(count(lit(1)).as("cd"))
    // avg cost floors through integer division so the score stays a
    // bigint on both engines (Spark `div` == DuckDB `//` on positives)
    val scored = teBg.join(broadcast(seenCost), Seq("bg"), "left")
      .crossJoin(broadcast(unseenCost))
      .groupBy("doc_id", "lang")
      .agg(expr("sum(cd * coalesce(cost, cost0)) div sum(cd)").as("avg_cost"))

    val hist = scored.groupBy("lang", "avg_cost").agg(count(lit(1)).as("nc"))
    val wCum = Window.partitionBy("lang").orderBy("avg_cost")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cutoff = hist
      .withColumn("cum", sum("nc").over(wCum))
      .withColumn("n", sum("nc").over(Window.partitionBy("lang")))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("lang").agg(min("avg_cost").as("cutoff_micro"))

    hist.join(broadcast(cutoff), "lang")
      .groupBy("lang").agg(
        sum("nc").as("n_docs"),
        max("cutoff_micro").as("cutoff_micro"),
        sum(when(col("avg_cost") <= col("cutoff_micro"), col("nc")).otherwise(lit(0L)))
          .as("n_head"))
      .withColumn("n_tail", col("n_docs") - col("n_head"))
      .select("lang", "n_docs", "cutoff_micro", "n_head", "n_tail")
      .orderBy("lang")
  }

  /** q292: KNESER–NEY smoothed word-bigram cross-entropy per language —
    * the properly-smoothed rung above q160's raw conditional surprisal
    * and q230's add-one char model: absolute discount D = 3/4 with the
    * CONTINUATION-probability backoff (how many contexts a word
    * completes, not how often it occurs — the Kneser–Ney insight).
    *
    * With D = 3/4 every probability is an exact rational:
    * P = (max(4c−3,0)·T + 3·N1+(w1,·)·N1+(·,w2)) / (4·c(w1)·T), carried
    * in decimal(38,0)/HUGEINT (type-count products pass int64 at corpus
    * scale); only the per-TYPE surprisal quantizes through
    * ⌊ln(den/num)·10⁶⌋ (the q187 micro-nat device), and token-weighted
    * sums ride decimals again. Numerators are ≥ T > 0, so ln is total.
    *
    * Scale: four hash aggregates over the bigram frame, all clustering
    * on (lang, w1|w2) — the model surface is type-bounded, never
    * corpus-bounded; the per-lang totals broadcast.
    */
  def kneserNeyReport(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("lang"), split(lower(col("text")), " ").as("ts"))
    val bg = toks.select(col("lang"), explode(expr(
        """zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("p"))
      .select(col("lang"), col("p.w1"), col("p.w2"))
      .groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c"))
    val cw1 = bg.groupBy("lang", "w1").agg(sum("c").as("cw"), count(lit(1)).as("n1f"))
    val n1b = bg.groupBy("lang", "w2").agg(count(lit(1)).as("n1b"))
    val tt = bg.groupBy("lang").agg(count(lit(1)).as("tt"), sum("c").as("ntok"))
    val j = bg.join(cw1, Seq("lang", "w1")).join(n1b, Seq("lang", "w2"))
      .join(broadcast(tt), "lang")
      .withColumn("num",
        greatest(col("c") * 4 - 3, lit(0L)).cast("decimal(38,0)") * col("tt") +
          lit(3L).cast("decimal(38,0)") * col("n1f") * col("n1b"))
      .withColumn("den", lit(4L).cast("decimal(38,0)") * col("cw") * col("tt"))
      .withColumn("s", floor(log(col("den").cast("double") /
        col("num").cast("double")) * lit(1000000.0)).cast("long"))
    j.groupBy("lang").agg(
        max("ntok").as("n_bigrams"), max("tt").as("n_types"),
        round(sum(col("c").cast("decimal(38,0)") * col("s")).cast("double") /
          max("ntok") / lit(1000000.0), 4).as("xent_nats"),
        max(struct(col("s"), col("w1"), col("w2"))).as("m"))
      .select(col("lang"), col("n_bigrams"), col("n_types"), col("xent_nats"),
        col("m.w1").as("top_surprise_w1"), col("m.w2").as("top_surprise_w2"),
        col("m.s").as("top_surprise_micro"))
      .orderBy("lang")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_lm_perplexity" -> ((s, d) => perplexityFilter(Tables(s, d).documents)),
    "q292_kn_bigram" -> ((s, d) => kneserNeyReport(Tables(s, d).documents)),
  )

  override def oracles: Map[String, String] = Map(
    // exact-rational KN probabilities in HUGEINT; surprisal quantizes
    // per type; argmax of (s, w1, w2) via DESC row_number (q180 device)
    "q292_kn_bigram" ->
      """WITH t AS (SELECT lang, string_split(lower(text), ' ') AS ts FROM documents),
        |bgm AS (SELECT lang, ts[i] AS w1, ts[i + 1] AS w2
        |        FROM (SELECT lang, ts, unnest(range(1, len(ts))) AS i FROM t)),
        |bg AS (SELECT lang, w1, w2, count(*)::BIGINT AS c FROM bgm GROUP BY 1, 2, 3),
        |cw1 AS (SELECT lang, w1, sum(c)::BIGINT AS cw, count(*)::BIGINT AS n1f
        |        FROM bg GROUP BY 1, 2),
        |n1b AS (SELECT lang, w2, count(*)::BIGINT AS n1b FROM bg GROUP BY 1, 2),
        |tt AS (SELECT lang, count(*)::BIGINT AS tt, sum(c)::BIGINT AS ntok
        |       FROM bg GROUP BY 1),
        |j AS (SELECT bg.lang, bg.w1, bg.w2, bg.c, tt.ntok, tt.tt,
        |        (greatest(bg.c * 4 - 3, 0)::HUGEINT * tt.tt
        |         + 3::HUGEINT * cw1.n1f * n1b.n1b) AS num,
        |        (4::HUGEINT * cw1.cw * tt.tt) AS den
        |      FROM bg JOIN cw1 USING (lang, w1) JOIN n1b USING (lang, w2)
        |              JOIN tt USING (lang)),
        |s AS (SELECT lang, w1, w2, c, ntok, tt,
        |        CAST(floor(ln(den::DOUBLE / num::DOUBLE)
        |             * CAST(1000000 AS DOUBLE)) AS BIGINT) AS s
        |      FROM j),
        |top AS (SELECT lang, w1, w2, s,
        |          row_number() OVER (PARTITION BY lang
        |            ORDER BY s DESC, w1 DESC, w2 DESC) AS rn
        |        FROM s),
        |agg AS (SELECT lang, max(ntok) AS n_bigrams, max(tt) AS n_types,
        |          round(sum(c::HUGEINT * s)::DOUBLE / max(ntok)
        |                / CAST(1000000 AS DOUBLE), 4) AS xent_nats
        |        FROM s GROUP BY lang)
        |SELECT a.lang, a.n_bigrams, a.n_types, a.xent_nats,
        |       t2.w1 AS top_surprise_w1, t2.w2 AS top_surprise_w2,
        |       t2.s AS top_surprise_micro
        |FROM agg a JOIN top t2 ON t2.lang = a.lang AND t2.rn = 1
        |ORDER BY a.lang""".stripMargin,
    "q230_lm_perplexity" ->
      """WITH el AS (SELECT doc_id, lang, lower(text) AS t FROM documents
        |            WHERE length(lower(text)) >= 2),
        |train AS (SELECT * FROM el WHERE doc_id % 10 < 8),
        |test AS (SELECT * FROM el WHERE doc_id % 10 >= 8),
        |tr AS (SELECT substr(t, CAST(i AS INT), 2) AS bg
        |       FROM (SELECT t, unnest(range(1, length(t))) AS i FROM train)),
        |cnt AS (SELECT bg, count(*)::BIGINT AS c FROM tr GROUP BY bg),
        |stats AS (SELECT sum(c)::BIGINT AS tl, count(*)::BIGINT AS v FROM cnt),
        |cost AS (SELECT bg, CAST(floor(-ln((c + 1) / CAST(tl + v AS DOUBLE)) * 1000000) AS BIGINT) AS cost
        |         FROM cnt, stats),
        |c0 AS (SELECT CAST(floor(-ln(1.0 / CAST(tl + v AS DOUBLE)) * 1000000) AS BIGINT) AS cost0 FROM stats),
        |tebg AS (SELECT doc_id, lang, bg, count(*)::BIGINT AS cd FROM (
        |           SELECT doc_id, lang, substr(t, CAST(i AS INT), 2) AS bg
        |           FROM (SELECT doc_id, lang, t, unnest(range(1, length(t))) AS i FROM test))
        |         GROUP BY doc_id, lang, bg),
        |scored AS (SELECT doc_id, lang,
        |                  CAST(sum(cd * coalesce(cost, cost0)) // sum(cd) AS BIGINT) AS avg_cost
        |           FROM tebg LEFT JOIN cost USING (bg) CROSS JOIN c0
        |           GROUP BY doc_id, lang),
        |hist AS (SELECT lang, avg_cost, count(*)::BIGINT AS nc FROM scored GROUP BY lang, avg_cost),
        |cum AS (SELECT lang, avg_cost, nc,
        |               sum(nc) OVER (PARTITION BY lang ORDER BY avg_cost) AS cum,
        |               sum(nc) OVER (PARTITION BY lang) AS n FROM hist),
        |cutoff AS (SELECT lang, min(avg_cost) AS cutoff_micro FROM cum
        |           WHERE cum >= (n + 1) // 2 GROUP BY lang)
        |SELECT h.lang, sum(h.nc)::BIGINT AS n_docs,
        |       max(co.cutoff_micro)::BIGINT AS cutoff_micro,
        |       sum(CASE WHEN h.avg_cost <= co.cutoff_micro THEN h.nc ELSE 0 END)::BIGINT AS n_head,
        |       (sum(h.nc) - sum(CASE WHEN h.avg_cost <= co.cutoff_micro THEN h.nc ELSE 0 END))::BIGINT AS n_tail
        |FROM hist h JOIN cutoff co ON co.lang = h.lang
        |GROUP BY h.lang ORDER BY h.lang""".stripMargin,
  )
}
