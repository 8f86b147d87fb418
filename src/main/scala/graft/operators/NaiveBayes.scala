package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained multinomial Naive Bayes language identification — the
  * model-training rung above q23's heuristic langid: fit per-language
  * Laplace-smoothed character-bigram likelihoods on a deterministic
  * doc_id split, score the held-out fold, and report the confusion
  * matrix.
  *
  * Determinism: every per-(lang, bigram) log-likelihood is quantized to
  * integer micro-nats (floor(−ln(p)·10⁶), the q168/BPE convention from
  * Modeling.scala) BEFORE any summation, so per-document scores are
  * integer sums — order-independent under any partitioning — and the
  * argmin prediction ties break on language name.
  *
  * Scale: the model is (langs × seen-bigrams), bounded by the alphabet
  * — it is explicitly `broadcast` into the scoring join, so the test
  * corpus is scored map-side with one shuffle for the per-(doc, lang)
  * score aggregation. Training is one groupBy over exploded bigrams
  * with map-side partial counts.
  *
  * Reference provenance: the reference validates dataset language
  * metadata against directory conventions
  * (src/ingest-pipeline/airflow/dags/validation_utils.py); this learns
  * the mapping from content instead.
  */
object NaiveBayes extends QueryModule {

  /** (doc_id, lang, bg) — one row per character-bigram occurrence of
    * the lowercased text.
    */
  def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(expr("sequence(1, char_length(t) - 1)")).as("i"), col("t"))
      .select(col("doc_id"), col("lang"), expr("substring(t, i, 2)").as("bg"))

  /** q187: fit on doc_id % 5 ≠ 0, score doc_id % 5 = 0, return the
    * (true_lang, pred_lang, n_docs) confusion matrix.
    *
    * On the synthetic corpus the `lang` column is drawn independently of
    * the shared English-like vocabulary, so the achievable diagonal is
    * only modestly above chance — the oracle checks the exact decision
    * procedure, and NaiveBayesSpec proves separable inputs classify
    * perfectly.
    */
  def nbLangidConfusion(docs: DataFrame): DataFrame = {
    // Docs too short to yield a bigram are excluded from BOTH splits so the
    // priors / n_train denominators count exactly the docs the model can see
    // (the oracle's train/test CTEs apply the same length >= 2 filter).
    // fanOut: per-character bigram explodes on both splits run before
    // any exchange — single-threaded over a one-row-group scan otherwise
    val eligible = graft.plans.Scans.fanOut(docs)
      .filter(length(col("text")) >= 2)
    val train = eligible.filter(col("doc_id") % 5 =!= 0)
    val test  = eligible.filter(col("doc_id") % 5 === 0)

    // ONE corpus-sized pass: the exploded bigram stream collapses into
    // the (lang, bg) count frame, and every other training statistic
    // derives from that bounded frame (token totals = Σc per lang,
    // vocab = distinct bg) instead of re-exploding the corpus
    val cnt = bigrams(train).groupBy("lang", "bg").agg(count(lit(1)).as("c"))
    val perLang = cnt.groupBy("lang").agg(sum("c").as("tl"))
    val vocab = cnt.agg(countDistinct("bg").as("v"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val priors = train.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(nTrain))
      .select(col("lang"),
        expr("cast(floor(-ln(n_docs / cast(n_train as double)) * 1000000) as bigint)")
          .as("prior_cost"))
    // per-language smoothing denominator + unseen-bigram cost
    val langModel = perLang.crossJoin(broadcast(vocab))
      .join(priors, "lang")
      .select(col("lang").as("cand"), col("prior_cost"),
        expr("cast(floor(-ln(1.0 / cast(tl + v as double)) * 1000000) as bigint)")
          .as("cost0"), col("tl"), col("v"))
    val seenCost = cnt.join(perLang, "lang").crossJoin(broadcast(vocab))
      .select(col("lang").as("cand"), col("bg"),
        expr("cast(floor(-ln((c + 1) / cast(tl + v as double)) * 1000000) as bigint)")
          .as("cost"))

    val teBg = bigrams(test).groupBy(col("doc_id"), col("lang").as("true_lang"), col("bg"))
      .agg(count(lit(1)).as("cd"))
    val scored = teBg
      .crossJoin(broadcast(langModel.select("cand", "prior_cost", "cost0")))
      .join(broadcast(seenCost), Seq("cand", "bg"), "left")
      .groupBy("doc_id", "true_lang", "cand")
      .agg((first("prior_cost") +
        sum(col("cd") * coalesce(col("cost"), col("cost0")))).as("score"))
    val pred = scored.groupBy("doc_id", "true_lang")
      .agg(min(struct(col("score"), col("cand"))).as("m"))
      .select(col("true_lang"), col("m.cand").as("pred_lang"))
    pred.groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("true_lang", "pred_lang")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q187_nb_langid" -> ((s, d) => nbLangidConfusion(Tables(s, d).documents)),
  )

  override def oracles: Map[String, String] = Map(
    "q187_nb_langid" ->
      """WITH train AS (SELECT doc_id, lang, lower(text) AS t FROM documents
        |               WHERE doc_id % 5 <> 0 AND length(lower(text)) >= 2),
        |test AS (SELECT doc_id, lang, lower(text) AS t FROM documents
        |         WHERE doc_id % 5 = 0 AND length(lower(text)) >= 2),
        |tr_bg AS (SELECT lang, substr(t, CAST(i AS INT), 2) AS bg
        |          FROM (SELECT lang, t, unnest(range(1, length(t))) AS i FROM train)),
        |cnt AS (SELECT lang, bg, count(*)::BIGINT AS c FROM tr_bg GROUP BY lang, bg),
        |per_lang AS (SELECT lang, count(*)::BIGINT AS tl FROM tr_bg GROUP BY lang),
        |vocab AS (SELECT count(DISTINCT bg)::BIGINT AS v FROM tr_bg),
        |ntr AS (SELECT count(*)::BIGINT AS n_train FROM train),
        |priors AS (SELECT lang,
        |                  CAST(floor(-ln(count(*) / CAST(any_value(ntr.n_train) AS DOUBLE)) * 1000000) AS BIGINT) AS prior_cost
        |           FROM train CROSS JOIN ntr GROUP BY lang),
        |lang_model AS (SELECT p.lang AS cand, pr.prior_cost,
        |                      CAST(floor(-ln(1.0 / CAST(p.tl + v.v AS DOUBLE)) * 1000000) AS BIGINT) AS cost0
        |               FROM per_lang p CROSS JOIN vocab v JOIN priors pr ON pr.lang = p.lang),
        |seen_cost AS (SELECT c.lang AS cand, c.bg,
        |                     CAST(floor(-ln((c.c + 1) / CAST(p.tl + v.v AS DOUBLE)) * 1000000) AS BIGINT) AS cost
        |              FROM cnt c JOIN per_lang p ON c.lang = p.lang CROSS JOIN vocab v),
        |te_bg AS (SELECT doc_id, true_lang, bg, count(*)::BIGINT AS cd FROM (
        |            SELECT doc_id, lang AS true_lang, substr(t, CAST(i AS INT), 2) AS bg
        |            FROM (SELECT doc_id, lang, t, unnest(range(1, length(t))) AS i FROM test))
        |          GROUP BY doc_id, true_lang, bg),
        |scored AS (SELECT tb.doc_id, tb.true_lang, lm.cand,
        |                  any_value(lm.prior_cost)
        |                  + sum(tb.cd * coalesce(sc.cost, lm.cost0)) AS score
        |           FROM te_bg tb CROSS JOIN lang_model lm
        |           LEFT JOIN seen_cost sc ON sc.cand = lm.cand AND sc.bg = tb.bg
        |           GROUP BY tb.doc_id, tb.true_lang, lm.cand),
        |pred AS (SELECT true_lang, cand AS pred_lang FROM (
        |           SELECT true_lang, cand, row_number() OVER (
        |             PARTITION BY doc_id ORDER BY score, cand) AS rn
        |           FROM scored) WHERE rn = 1)
        |SELECT true_lang, pred_lang, count(*)::BIGINT AS n_docs
        |FROM pred GROUP BY true_lang, pred_lang
        |ORDER BY true_lang, pred_lang""".stripMargin,
  )
}
