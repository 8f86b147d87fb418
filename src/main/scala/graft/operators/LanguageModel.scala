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
    val eligible = docs.select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_lm_perplexity" -> ((s, d) => perplexityFilter(Tables(s, d).documents)),
  )

  override def oracles: Map[String, String] = Map(
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
