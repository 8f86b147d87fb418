package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval / scoring operators over the documents corpus —
  * the index-building side of a training-data pipeline (dedup and
  * decontamination both lean on posting lists and term statistics, and
  * retrieval evals need a scoring baseline).
  *
  * All three operators share the same scale anatomy: one token explode,
  * map-side-combined groupBys, a vocabulary-sized dimension table that
  * BROADCASTS back onto the term-keyed fact (vocabulary ≪ corpus — the
  * classic small-dim join), and per-key windows whose limits Spark cuts
  * map-side (WindowGroupLimit). No driver-side state, no all-pairs.
  *
  * Determinism contract with the DuckDB oracle: ranks order by the
  * ROUNDED score with a term tie-break (the q70 pattern — raw doubles
  * may differ in the last ulp across engines, rounded ones don't);
  * every per-document sum is either integer-exact or a fixed-order sum
  * of per-term columns.
  */
object Ranking extends QueryModule {

  private def termsOf(textCol: String): org.apache.spark.sql.Column =
    explode(split(lower(col(textCol)), " "))

  /** Per-document term frequencies — the shared first stage. */
  private def termFreq(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), termsOf("text").as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** q77: top-k terms per document by tf·idf (idf = ln(N/df)). The df
    * table is vocabulary-sized, so it broadcasts; the per-doc top-k is
    * a rank window over the rounded score.
    */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val tf = termFreq(documents)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  /** q78: Okapi BM25 of a fixed query against every document
    * (idf = ln(1 + (N - df + ½)/(df + ½)), k1 = 1.2, b = 0.75).
    * The corpus stats (N, avgdl) are one broadcast scalar row; scoring
    * is a narrow projection over the term-filtered tf table. The final
    * score adds the per-term sums in FIXED query-term order — each sum
    * has at most one row per document, so the addition order (the only
    * float-order hazard in the query) is pinned on both engines.
    */
  def bm25Scores(documents: DataFrame,
                 queryTerms: Seq[String] = Seq("spark", "join", "window")): DataFrame = {
    val stats = documents.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(split(lower(col("text")), " "))).as("avgdl"))
    // dl rides the tf shuffle as a group-constant (max of a constant) —
    // cheaper than a second documents-sized join keyed on doc_id
    val tf = documents.select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("dl"),
        termsOf("text").as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib =
      log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      (col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
    val perTerm = queryTerms.map(t =>
      coalesce(sum(when(col("term") === t, col("c"))), lit(0.0)))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), contrib.as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"), round(perTerm.reduce(_ + _), 4).as("bm25"))
      .orderBy("doc_id")
  }

  /** q80: inverted-index build — per term: document frequency, total
    * occurrences, and the head of the doc_id-sorted posting list as a
    * bounded CSV string. The head cut is a rank window per term, so
    * WindowGroupLimit keeps only k rows per term per map task — the
    * full posting list never materializes in one place (the unbounded
    * `collect_list` per hot term is exactly what this avoids at 100 TB).
    */
  def invertedIndex(documents: DataFrame, headK: Int = 8): DataFrame = {
    val tf = termFreq(documents)
    val stats = tf.groupBy("term").agg(
      count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
    val w = Window.partitionBy("term").orderBy("doc_id")
    val heads = tf.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= headK)
      .groupBy("term")
      .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
        x => x.cast("string")), ",").as("postings_head"))
    stats.join(heads, "term")
      .select(col("term"), col("df"), col("total_tf"), col("postings_head"))
      .orderBy("term")
  }

  /** q86: pointwise mutual information of adjacent word pairs — the
    * collocation / multi-word-expression miner. One bigram explode
    * (zip_with over shifted slices — no self-join), map-side-combined
    * counts, unigram stats broadcast back onto the bigram table (vocab
    * ≪ corpus), top-k by TakeOrderedAndProject on the integer count
    * with a lexical tie-break. PMI arithmetic is pinned left-to-right
    * so both engines evaluate identical double sequences.
    */
  def pmiBigrams(documents: DataFrame, k: Int = 20): DataFrame = {
    val ts = split(lower(col("text")), " ")
    val pairs = documents.select(explode(zip_with(
      slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val bigramCounts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val unigrams = documents.select(explode(ts).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = documents.agg(
      sum(size(ts)).cast("double").as("n_uni"),
      sum(greatest(size(ts) - 1, lit(0))).cast("double").as("n_bi"))
    val pmi = round(log(
      (col("c_xy").cast("double") * col("n_uni") * col("n_uni")) /
      (col("n_bi") * col("c_x") * col("c_y"))), 4)
    bigramCounts
      .join(broadcast(unigrams.select(col("w").as("w1"), col("c").as("c_x"))), "w1")
      .join(broadcast(unigrams.select(col("w").as("w2"), col("c").as("c_y"))), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_xy"), pmi.as("pmi"))
      .orderBy(col("c_xy").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** q87: unigram cross-entropy per token — the CCNet-shaped
    * language-model quality filter (documents whose tokens are
    * improbable under the corpus distribution are noise; a real
    * deployment swaps the unigram table for KenLM scores, same plan).
    * Per-token -ln p(w) comes from a broadcast vocabulary join; the
    * per-document mean folds over the SORTED logprob list (one bounded
    * collect per doc), because a shuffled-order double sum is the one
    * nondeterminism a grouped mean would smuggle in.
    */
  def unigramCrossEntropy(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), termsOf("text").as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).cast("double").as("n_total"))
    toks
      .join(broadcast(vocab), "w")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), (-log(col("c") / col("n_total"))).as("nlp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(aggregate(array_sort(collect_list(col("nlp"))), lit(0.0),
          (acc, x) => acc + x) / count(lit(1)), 4).as("xent_per_token"))
      .orderBy("doc_id")
  }

  /** q90: DSIR-style data-selection importance weights (Xie et al.
    * 2023): score every document by the log-likelihood ratio of its
    * tokens under a TARGET distribution (here: the `lang = targetLang`
    * slice — in production, a trusted high-quality corpus) vs the RAW
    * corpus distribution, both unigram models with add-1 smoothing over
    * the shared vocabulary. High scores = looks like the target;
    * selection then keeps the top fraction (or hash-samples
    * proportionally — [[CorpusOps.hashSampled]] composes downstream).
    *
    * Scale shape: one token explode feeds BOTH unigram models
    * (map-side-combined counts); the merged vocabulary (raw count +
    * target count, vocab ≪ corpus) broadcasts back onto the token
    * stream, and the per-document sum folds over the SORTED per-token
    * ratios (the q87 contract — grouped double sums are otherwise
    * order-unpinned).
    */
  def dsirWeights(documents: DataFrame, targetLang: String = "en"): DataFrame = {
    val toks = documents.select(col("doc_id"), col("lang"), termsOf("text").as("w"))
    val raw = toks.groupBy("w").agg(count(lit(1)).as("c_raw"))
    val tgt = toks.filter(col("lang") === targetLang)
      .groupBy("w").agg(count(lit(1)).as("c_tgt"))
    val vocab = raw.join(tgt, Seq("w"), "left")
      .select(col("w"), col("c_raw"), coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
    val totals = vocab.agg(
      sum(col("c_raw")).cast("double").as("n_raw"),
      sum(col("c_tgt")).cast("double").as("n_tgt"),
      count(lit(1)).cast("double").as("v"))
    toks
      .join(broadcast(vocab), "w")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (log((col("c_tgt") + lit(1.0)) / (col("n_tgt") + col("v"))) -
         log((col("c_raw") + lit(1.0)) / (col("n_raw") + col("v")))).as("lr"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        // + 0.0 canonicalizes a -0.0 fold result (engines' summation
        // algorithms may differ in zero sign; q81 convention)
        (round(aggregate(array_sort(collect_list(col("lr"))), lit(0.0),
          (acc, x) => acc + x), 4) + lit(0.0)).as("dsir_logratio"))
      .orderBy("doc_id")
  }

  /** q95: corpus-drift monitor — per-source KL(P_source ‖ P_corpus)
    * over unigram distributions, restricted to the corpus's top-K
    * vocabulary and add-1 smoothed within it. This is the dashboard
    * query behind "did the crawl mix shift": a source whose token
    * distribution diverges from the blend shows up as a KL spike.
    *
    * Restricting to top-K (the standard practical drift monitor) is
    * what makes the query BOTH scale-safe and deterministic: the
    * source × vocab grid is |sources|·K rows (tiny), the top-K table
    * broadcasts everywhere, and the per-source sum folds over ≤ K
    * sorted doubles (the q87 order-pinning contract) instead of a
    * vocabulary-sized collect. Top-K itself is a
    * TakeOrderedAndProject over the vocab counts — no global sort.
    * Ties at the cut are pinned by (count DESC, term).
    */
  def sourceKlDrift(documents: DataFrame, topK: Int = 50): DataFrame = {
    val toks = documents.select(col("source"), termsOf("text").as("w"))
    // cache: K rows, but each recompute is a full-vocab aggregation
    // over the token stream — and `top` feeds three consumers inside the
    // RETURNED plan (no in-scope unpersist point → pin-registered, drained
    // by Checkpoints.release after the caller consumes the result)
    val top = graft.plans.Checkpoints.pin(
      toks.groupBy("w").agg(count(lit(1)).as("c_c"))
        .orderBy(col("c_c").desc, col("w")).limit(topK))
    val tot = top.agg(sum(col("c_c")).cast("double").as("n_c"),
      count(lit(1)).cast("double").as("v"))
    val sc = toks.join(broadcast(top.select("w")), "w")
      .groupBy("source", "w").agg(count(lit(1)).as("c_s"))
    val srcs = sc.groupBy("source").agg(sum(col("c_s")).cast("double").as("n_s"))
    val ps = (col("c_s") + lit(1.0)) / (col("n_s") + col("v"))
    val pc = (col("c_c") + lit(1.0)) / (col("n_c") + col("v"))
    srcs.crossJoin(broadcast(top))
      .join(sc, Seq("source", "w"), "left")
      .withColumn("c_s", coalesce(col("c_s"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("source"), (ps * log(ps / pc)).as("kc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        // + 0.0 canonicalizes a -0.0 fold result (q81 convention)
        (round(aggregate(array_sort(collect_list(col("kc"))), lit(0.0),
          (acc, x) => acc + x), 4) + lit(0.0)).as("kl_to_corpus"))
      .orderBy("source")
  }

  /** q330: pairwise JENSEN–SHANNON divergence matrix between source
    * unigram distributions — the symmetric, bounded (≤ ln 2), always-
    * finite companion to q95's KL-to-corpus: KL says how far each
    * source drifted from the mix, JSD says which sources are
    * INTERCHANGEABLE with each other — the distance that drives source
    * clustering, mixture design (q82), and "drop the redundant feed"
    * calls (its √ is a metric, unlike KL). Same smoothing, vocabulary
    * cut, and determinism devices as q95: Laplace +1 over the shared
    * top-K vocabulary, and the per-pair double sum folds in SORTED
    * order on both engines, so float summation has one canonical order.
    *
    * Scale: the corpus collapses once to the (source × top-K) grid
    * (bounded, broadcastable); the pairwise stage joins the grid to
    * itself on the term key — |sources|²·K rows of model-sized work,
    * never corpus-sized.
    */
  def sourceJsdMatrix(documents: DataFrame, topK: Int = 50): DataFrame = {
    val toks = documents.select(col("source"), termsOf("text").as("w"))
    val top = graft.plans.Checkpoints.pin(
      toks.groupBy("w").agg(count(lit(1)).as("c_c"))
        .orderBy(col("c_c").desc, col("w")).limit(topK))
    val v = top.agg(count(lit(1)).cast("double").as("v"))
    val sc = toks.join(broadcast(top.select("w")), "w")
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val srcs = sc.groupBy("source").agg(sum("c").cast("double").as("n"))
    val grid = srcs.crossJoin(broadcast(top.select("w")))
      .join(sc, Seq("source", "w"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(v))
      .select(col("source"), col("w"),
        ((col("c") + lit(1.0)) / (col("n") + col("v"))).as("p"))
    val pairs = grid.alias("a").join(grid.alias("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        (col("a.p") * log(col("a.p") * 2.0 / (col("a.p") + col("b.p"))) / 2.0 +
         col("b.p") * log(col("b.p") * 2.0 / (col("a.p") + col("b.p"))) / 2.0).as("t"))
    pairs.groupBy("src_a", "src_b")
      .agg((round(aggregate(array_sort(collect_list(col("t"))), lit(0.0),
        (acc, x) => acc + x), 6) + lit(0.0)).as("jsd"))
      .orderBy("src_a", "src_b")
  }

  /** q100: per-source vocabulary health — token count, vocabulary size,
    * type-token ratio, and hapax-legomena fraction (terms occurring
    * once). The classic corpus diagnostics: a source whose TTR
    * collapses is template spam; one whose hapax fraction explodes is
    * OCR noise or encoding damage.
    *
    * Scale shape: ONE groupBy over (source, term) with map-side partial
    * agg, then a source-count-sized rollup; every output is integer
    * counts divided once.
    */
  def vocabularyStats(documents: DataFrame): DataFrame =
    documents.select(col("source"), termsOf("text").as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        coalesce(sum(when(col("cnt") === 1, 1L)), lit(0L)).as("hapax"))
      .withColumn("ttr", round(col("vocab") / col("n_tokens").cast("double"), 4))
      .withColumn("hapax_frac", round(col("hapax") / col("vocab").cast("double"), 4))
      .orderBy("source")

  /** q120: token burstiness — variance-to-mean ratio of per-document
    * counts for the corpus's top-K tokens (zeros included). Function
    * words sit near VMR ≈ 1 (Poisson); content words are bursty
    * (VMR ≫ 1); a "content" token with VMR ≈ 1 is template spam. The
    * classic Church–Gale corpus statistic, and a cheap spam signal the
    * quality gates (q79/q91) don't capture.
    *
    * Determinism: every moment is an INTEGER sum (Σc, Σc² over per-doc
    * counts; absent docs contribute zero via N from the corpus count),
    * so the doubles are two divisions at the end. Top-K cut pinned by
    * (count DESC, term) via TakeOrderedAndProject.
    */
  def tokenBurstiness(documents: DataFrame, topK: Int = 20): DataFrame = {
    val tf = termFreq(documents)
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val top = tf.groupBy("term").agg(sum(col("tf")).as("total_tf"))
      .orderBy(col("total_tf").desc, col("term")).limit(topK)
    tf.join(broadcast(top.select("term")), "term")
      .groupBy("term")
      .agg(count(lit(1)).as("n_docs_with"),
        sum(col("tf")).as("sum_c"),
        sum(col("tf") * col("tf")).as("sum_c2"))
      .crossJoin(broadcast(n))
      .withColumn("mean_c", col("sum_c") / col("n_docs").cast("double"))
      .withColumn("vmr", round(
        (col("sum_c2") / col("n_docs").cast("double") - col("mean_c") * col("mean_c")) /
          col("mean_c"), 4))
      .select(col("term"), col("n_docs_with"), col("sum_c"),
        round(col("mean_c"), 4).as("mean_c"), col("vmr"))
      .orderBy(col("sum_c").desc, col("term"))
  }

  /** q129: TextRank keyword salience (Mihalcea & Tarau 2004) — weighted
    * PageRank over the adjacency co-occurrence graph of the corpus's
    * top-K terms: rᵥ = (1−d) + d·Σᵤ rᵤ·w(u,v)/W(u), d = 0.85, run a
    * fixed number of iterations. The corpus-level keyword extractor —
    * high-rank terms are the hubs of the co-occurrence graph, a
    * different (graphier) salience signal than raw tf or tf-idf.
    *
    * Determinism: the iteration runs in FIXED-POINT INTEGER arithmetic
    * (ranks scaled ×10⁶; every contribution is floor(r·w / W) and the
    * damping step is 150000 + (85·s) div 100) — integer sums are
    * order-independent, so there is no float-convergence hazard to pin.
    * (Contribution products r·w stay < 2⁶³ while Σw per node < ~10¹².)
    *
    * Scale shape: TWO corpus passes total — the adjacency-pair count
    * (q86's bigram anatomy) and the term-frequency rollup; both reduce
    * map-side. The graph itself is ≤ K² edges, COLLECTED ONCE (the Ann
    * centroid convention: a bounded model-sized object), so the
    * 10-iteration loop runs on local tables and never re-touches the
    * corpus; the final rank table re-joins tf as the broadcast side.
    */
  def textRank(documents: DataFrame, topK: Int = 30, iterations: Int = 10,
               dampNum: Long = 85L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val ts = split(lower(col("text")), " ")
    val pairs = documents.select(explode(zip_with(
      slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1"), col("bg.w2")).filter(col("w1") =!= col("w2"))
    val tf = documents.select(explode(ts).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val nodes = tf.orderBy(col("c").desc, col("term")).limit(topK).select("term")
    val sym = pairs.select(col("w1").as("src"), col("w2").as("dst"))
      .union(pairs.select(col("w2").as("src"), col("w1").as("dst")))
    val edges = sym
      .join(broadcast(nodes.select(col("term").as("src"))), "src")
      .join(broadcast(nodes.select(col("term").as("dst"))), "dst")
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val ew = edges
      .join(edges.groupBy("src").agg(sum(col("w")).as("wsrc")), "src")
      .select("src", "dst", "w", "wsrc")
      .as[(String, String, Long, Long)].collect()          // ≤ K² rows
    val terms = nodes.as[String].collect()                 // ≤ K rows
    var rank: Map[String, Long] = terms.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val s = ew.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w, wsrc) => rank(src) * w / wsrc }.sum
      }
      rank = terms.map(t => t -> (150000L + dampNum * s.getOrElse(t, 0L) / 100L)).toMap
    }
    val ranks = rank.toSeq.toDF("term", "rank_scaled")
    tf.join(broadcast(ranks), "term")
      .select(col("term"), col("c").as("term_count"), col("rank_scaled"),
        round(col("rank_scaled") / 1e6, 6).as("rank"))
      .orderBy(col("rank_scaled").desc, col("term"))
  }

  /** q136: vocabulary churn between two corpus snapshots (the release-
    * over-release "what changed in the data" report): per-term smoothed
    * log-ratio of frequencies, top movers by |drift|. A term surging
    * between releases is a crawl change, a spam outbreak, or a news
    * event; this is the triage list. Snapshots here are the doc-id
    * parity split (the q75/q99 convention for synthesizing two
    * releases from one table).
    *
    * Determinism: counts are integers; drift is ONE ln over an exact
    * integer rational ((c_b+1)(n_a+1)) / ((c_a+1)(n_b+1)), rounded 4.
    * Top-|drift| cut pinned by (|drift| desc, term) TakeOrdered.
    */
  def vocabChurn(documents: DataFrame, topK: Int = 20): DataFrame = {
    val toks = documents.select((col("doc_id") % 2 === 0).as("snap_a"),
      termsOf("text").as("term"))
    val counts = toks.groupBy("term").agg(
      sum(when(col("snap_a"), 1L).otherwise(0L)).as("c_a"),
      sum(when(!col("snap_a"), 1L).otherwise(0L)).as("c_b"))
    val totals = counts.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    counts.crossJoin(broadcast(totals))
      .withColumn("drift", round(log(
        ((col("c_b") + 1) * (col("n_a") + 1)).cast("double") /
        ((col("c_a") + 1) * (col("n_b") + 1)).cast("double")), 4))
      .withColumn("direction",
        when(col("drift") > 0, lit("rising"))
          .when(col("drift") < 0, lit("falling")).otherwise(lit("stable")))
      .select(col("term"), col("c_a"), col("c_b"), col("drift"), col("direction"))
      .orderBy(abs(col("drift")).desc, col("term"))
      .limit(topK)
  }

  /** q105: Zipf rank-frequency fit — least-squares slope of
    * log(count) vs log(rank) over the top-K vocabulary. Natural text
    * sits near slope −1; templated/spam corpora flatten, encoding
    * damage steepens — a one-row corpus fingerprint cheap enough to
    * track per ingest batch.
    *
    * Scale shape: the only corpus work is the vocab count (map-side
    * combined); the fit runs over K rank-ordered points collected into
    * ONE bounded list, folded in rank order on both engines — the
    * regression sums are deterministic because the fold order is
    * pinned, and K is a constant (the q87 contract, n=1 group).
    */
  def zipfFit(documents: DataFrame, topK: Int = 100): DataFrame = {
    val top = documents.select(termsOf("text").as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topK)
    val pts = top
      .withColumn("rank", row_number().over(Window.orderBy(col("c").desc, col("w"))))
      .select(struct(col("rank"), log(col("rank")).as("x"), log(col("c")).as("y")).as("p"))
    // one bounded group: fold Σx, Σy, Σxy, Σx² in rank order
    val folded = pts.agg(array_sort(collect_list(col("p"))).as("ps"))
      .select(size(col("ps")).cast("long").as("n_terms"),
        aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x")).as("sx"),
        aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("y")).as("sy"),
        aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x") * p.getField("y")).as("sxy"),
        aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x") * p.getField("x")).as("sxx"))
    val n = col("n_terms").cast("double")
    val slope = (col("sxy") - col("sx") * col("sy") / n) /
      (col("sxx") - col("sx") * col("sx") / n)
    folded.select(col("n_terms"),
      round(slope, 4).as("zipf_slope"),
      round((col("sy") - slope * col("sx")) / n, 4).as("intercept"))
  }

  /** q275: RECIPROCAL RANK FUSION of two retrieval rankings (Cormack et
    * al. 2009 — the standard zero-training way to merge rankers, used
    * everywhere hybrid BM25+vector search exists): each part is ranked
    * by total traded quantity and, independently, by total revenue;
    * RRF(d) = Σ_lists 1/(K + rank_d). Scores are exact integers in
    * nano-units (10⁹ div (K+rank) — integer division, identical on any
    * engine), so the fused order needs no float comparison anywhere.
    * Ties break by part key.
    *
    * Scale: both rankings come from ONE map-side-combined aggregate of
    * the fact table (two measures, one shuffle); ranks are windows over
    * the part-sized frame, and the fusion is a part-keyed self-join of
    * two narrow rank columns. Top-k exits via TakeOrderedAndProject.
    */
  def rrfFusion(li: DataFrame, k: Int = 60, topN: Int = 20): DataFrame = {
    val agg = li.groupBy("l_partkey")
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("qty"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("rev_cents"))
    val byQty = Window.orderBy(col("qty").desc, col("l_partkey"))
    val byRev = Window.orderBy(col("rev_cents").desc, col("l_partkey"))
    agg
      .withColumn("rank_qty", row_number().over(byQty).cast("long"))
      .withColumn("rank_rev", row_number().over(byRev).cast("long"))
      .withColumn("rrf_nano",
        expr(s"(1000000000 div ($k + rank_qty)) + (1000000000 div ($k + rank_rev))"))
      .orderBy(col("rrf_nano").desc, col("l_partkey"))
      .limit(topN)
      .select(col("l_partkey").as("p_partkey"), col("rank_qty"),
        col("rank_rev"), col("rrf_nano"))
  }

  /** q284: rank sources by the WILSON LOWER BOUND of their quality pass
    * rate (pass = n_chars ≥ 300) — the small-sample-honest ordering:
    * a 3/3 source must NOT outrank a 96/100 source the way raw rates
    * would. z = 1.96 enters as the embedded constants z² = 3.8416,
    * z²/2 = 1.9208, z²/4 = 0.9604 (no runtime z lookup).
    *
    * Determinism without integers: every step here — literal parse,
    * +, −, ×, ÷, √ — is correctly rounded under IEEE-754, so two
    * engines evaluating the SAME expression tree over the same exact
    * integer inputs produce bit-identical doubles. The Spark expr and
    * the oracle SQL are therefore written with identical association
    * and explicit DOUBLE literals (a bare 1.9208 parses as DECIMAL in
    * both engines, which would change the arithmetic).
    *
    * Scale: one pass over the corpus → one row per source; the rank
    * window runs on the source-count-bounded frame.
    */
  def wilsonSourceRanking(documents: DataFrame, minChars: Int = 300): DataFrame = {
    val agg = documents.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") >= minChars, 1L).otherwise(0L)).as("n_pass"))
    val lb = "(phat + cast(1.9208 as double) / nd - cast(1.96 as double) * " +
      "sqrt((phat * (cast(1.0 as double) - phat) + cast(0.9604 as double) / nd) / nd)) " +
      "/ (cast(1.0 as double) + cast(3.8416 as double) / nd)"
    agg
      .withColumn("nd", col("n_docs").cast("double"))
      .withColumn("phat", col("n_pass").cast("double") / col("nd"))
      .withColumn("wilson_lb", round(expr(lb), 6))
      .withColumn("pass_rate", round(col("phat"), 6))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("wilson_lb").desc, col("source"))).cast("long"))
      .select("source", "n_docs", "n_pass", "pass_rate", "wilson_lb", "rk")
      .orderBy("rk")
  }

  /** Exact (9ᵈ, 10ᵈ) pairs for p = 0.9 rank-biased-overlap weights —
    * computed once in Scala and embedded identically in the Spark plan
    * and the oracle SQL (the q286 band-planner convention), so both
    * engines aggregate identical integers and pᵈ never goes through
    * engine libm. */
  private[operators] def rboConstants: Seq[(Int, Long, Long)] =
    (1 to 10).map(d => (d, BigInt(9).pow(d).toLong, BigInt(10).pow(d).toLong))

  private[operators] def rboConstantsSql: String =
    rboConstants.map { case (d, n9, n10) => s"($d, ${n9}, ${n10})" }.mkString(", ")

  /** q303: rank-biased overlap (Webber, Moffat & Zobel 2010, TOIS)
    * between two rankers of each source's documents — by raw length
    * vs by token count. RBO is THE ranker-agreement metric for
    * indefinite rankings: top-weighted (p = 0.9 ⇒ ~86% of the mass in
    * the top 10) where Kendall/Spearman (q269) weight all positions
    * equally — the regression gate run before swapping a retrieval
    * scorer.
    *
    * Truncated-RBO form: (1−p)/p · Σ_{d=1..10} (|A∩B|@d / d)·pᵈ, with
    * pᵈ as EXACT rational 9ᵈ/10ᵈ pairs (embedded constants, not libm
    * pow) and each term floor-quantized to ppb BEFORE the sum —
    * order-independent integers, one closing division by 9·10⁹.
    *
    * Scale: ranking windows partition by source; only ranks ≤ 10
    * survive to the depth join (≤ 20 rows/source × 10 depths, bounded
    * by the report shape, not the corpus).
    */
  def rboAgreement(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    val cdf = broadcast(rboConstants.toDF("d", "p_num", "p_den"))
    val base = documents.select(col("source"), col("doc_id"), col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val wa = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    val wb = Window.partitionBy("source").orderBy(col("n_tok").desc, col("doc_id"))
    val ranked = base
      .withColumn("ra", row_number().over(wa))
      .withColumn("rb", row_number().over(wb))
      .filter(col("ra") <= 10 || col("rb") <= 10)
    val xd = ranked.join(cdf, col("ra") <= col("d") && col("rb") <= col("d"))
      .groupBy("source", "d", "p_num", "p_den").agg(count(lit(1)).as("x"))
    val terms = xd.withColumn("term",
      expr("cast(x as decimal(38,0)) * p_num * 1000000000L div (d * p_den)"))
    val agg = terms.groupBy("source")
      .agg(sum("term").as("rbo_num"),
        max(when(col("d") === 10, col("x"))).as("x10"))
    documents.select("source").distinct()
      .join(agg, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("x10"), lit(0L)).as("overlap_at_10"),
        round(coalesce(col("rbo_num"), lit(0L)).cast("double") / 9e9, 6).as("rbo"))
      .orderBy("source")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q303_rbo_agreement" -> ((s, d) => rboAgreement(Tables(s, d).documents)),
    "q284_wilson_ranking" -> ((s, d) => wilsonSourceRanking(Tables(s, d).documents)),
    "q275_rrf_fusion"    -> ((s, d) => rrfFusion(Tables(s, d).lineitem)),
    "q90_dsir_weights"   -> ((s, d) => dsirWeights(Tables(s, d).documents)),
    "q105_zipf_fit"      -> ((s, d) => zipfFit(Tables(s, d).documents)),
    "q95_source_kl"      -> ((s, d) => sourceKlDrift(Tables(s, d).documents)),
    "q330_source_jsd"    -> ((s, d) => sourceJsdMatrix(Tables(s, d).documents)),
    "q100_vocab_stats"   -> ((s, d) => vocabularyStats(Tables(s, d).documents)),
    "q77_tfidf_topterms" -> ((s, d) => tfidfTopTerms(Tables(s, d).documents)),
    "q86_pmi_bigrams"    -> ((s, d) => pmiBigrams(Tables(s, d).documents)),
    "q87_unigram_xent"   -> ((s, d) => unigramCrossEntropy(Tables(s, d).documents)),
    "q78_bm25"           -> ((s, d) => bm25Scores(Tables(s, d).documents)),
    "q80_inverted_index" -> ((s, d) => invertedIndex(Tables(s, d).documents)),
    "q120_burstiness"    -> ((s, d) => tokenBurstiness(Tables(s, d).documents)),
    "q129_textrank"      -> ((s, d) => textRank(Tables(s, d).documents)),
    "q136_vocab_churn"   -> ((s, d) => vocabChurn(Tables(s, d).documents)),
  )

  /** q129 oracle: the fixed-point iteration unrolled into chained CTEs
    * (identical integer arithmetic, `//` = `div` on positives).
    */
  private def textRankSql(topK: Int, iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT n.term, 150000 + (85 * coalesce(s.s, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS term, sum((p.r * e.w) // e.wsrc)::BIGINT AS s
         |    FROM e2 e JOIN $prev p ON e.src = p.term GROUP BY 1) s USING (term))""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
       |pairs AS (
       |  SELECT ts[i] AS w1, ts[i + 1] AS w2
       |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM d)
       |  WHERE ts[i] <> ts[i + 1]),
       |tf AS (SELECT w AS term, count(*)::BIGINT AS c
       |       FROM (SELECT unnest(ts) AS w FROM d) GROUP BY 1),
       |nodes AS (SELECT term FROM tf ORDER BY c DESC, term LIMIT $topK),
       |sym AS (SELECT w1 AS src, w2 AS dst FROM pairs
       |        UNION ALL SELECT w2, w1 FROM pairs),
       |edges AS (
       |  SELECT src, dst, count(*)::BIGINT AS w
       |  FROM sym JOIN nodes a ON sym.src = a.term
       |           JOIN nodes b ON sym.dst = b.term
       |  GROUP BY 1, 2),
       |e2 AS (SELECT e.src, e.dst, e.w, t.wsrc
       |       FROM edges e JOIN (SELECT src, sum(w)::BIGINT AS wsrc
       |                          FROM edges GROUP BY 1) t USING (src)),
       |r0 AS (SELECT term, 1000000::BIGINT AS r FROM nodes),
       |$iters
       |SELECT f.term, tf.c AS term_count, f.r AS rank_scaled,
       |       round(f.r / 1000000.0, 6) AS rank
       |FROM r$iterations f JOIN tf USING (term)
       |ORDER BY rank_scaled DESC, term""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q303_rbo_agreement" ->
      s"""WITH base AS (
         |  SELECT source, doc_id, n_chars,
         |         len(string_split(text, ' '))::BIGINT AS n_tok
         |  FROM documents),
         |ranked AS (
         |  SELECT source,
         |         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS ra,
         |         row_number() OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id) AS rb
         |  FROM base),
         |consts(d, p_num, p_den) AS (VALUES ${rboConstantsSql}),
         |xd AS (SELECT source, d, p_num, p_den, count(*)::BIGINT AS x
         |       FROM ranked, consts WHERE ra <= d AND rb <= d GROUP BY 1, 2, 3, 4),
         |terms AS (SELECT source, d, x,
         |                 (x::HUGEINT * p_num * 1000000000) // (d * p_den) AS term
         |          FROM xd),
         |agg AS (SELECT source, sum(term) AS rbo_num,
         |               max(CASE WHEN d = 10 THEN x END) AS x10
         |        FROM terms GROUP BY 1)
         |SELECT s.source, coalesce(a.x10, 0)::BIGINT AS overlap_at_10,
         |       round(coalesce(a.rbo_num, 0)::DOUBLE / 9e9, 6) AS rbo
         |FROM (SELECT DISTINCT source FROM documents) s
         |LEFT JOIN agg a USING (source)
         |ORDER BY s.source""".stripMargin,
    // identical expression tree to the Spark side: IEEE-correctly-rounded
    // ops over identical doubles are engine-exact (see wilsonSourceRanking)
    "q284_wilson_ranking" ->
      """WITH agg AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |         sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)::BIGINT AS n_pass
        |  FROM documents GROUP BY source),
        |x AS (
        |  SELECT source, n_docs, n_pass,
        |         n_docs::DOUBLE AS nd,
        |         n_pass::DOUBLE / (n_docs::DOUBLE) AS phat
        |  FROM agg),
        |y AS (
        |  SELECT source, n_docs, n_pass,
        |         round(phat, 6) AS pass_rate,
        |         round((phat + CAST(1.9208 AS DOUBLE) / nd - CAST(1.96 AS DOUBLE) *
        |                sqrt((phat * (CAST(1.0 AS DOUBLE) - phat) + CAST(0.9604 AS DOUBLE) / nd) / nd))
        |               / (CAST(1.0 AS DOUBLE) + CAST(3.8416 AS DOUBLE) / nd), 6) AS wilson_lb
        |  FROM x)
        |SELECT source, n_docs, n_pass, pass_rate, wilson_lb,
        |       row_number() OVER (ORDER BY wilson_lb DESC, source) AS rk
        |FROM y ORDER BY rk""".stripMargin,
    "q275_rrf_fusion" ->
      """WITH agg AS (
        |  SELECT l_partkey,
        |         sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qty,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_cents
        |  FROM lineitem GROUP BY l_partkey),
        |r AS (
        |  SELECT l_partkey,
        |         row_number() OVER (ORDER BY qty DESC, l_partkey) AS rank_qty,
        |         row_number() OVER (ORDER BY rev_cents DESC, l_partkey) AS rank_rev
        |  FROM agg)
        |SELECT l_partkey AS p_partkey, rank_qty, rank_rev,
        |       (1000000000 // (60 + rank_qty))
        |       + (1000000000 // (60 + rank_rev)) AS rrf_nano
        |FROM r
        |ORDER BY rrf_nano DESC, l_partkey
        |LIMIT 20""".stripMargin,
    // regression sums fold over the rank-sorted bounded point list on
    // both engines (q87 order-pinning, n=1 group); the fit arithmetic
    // is identical double expressions over those sums
    "q105_zipf_fit" ->
      """WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |cc AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY 1),
        |top AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank
        |        FROM cc ORDER BY c DESC, w LIMIT 100),
        |l AS (SELECT list_sort(list({'r': rank, 'x': ln(rank), 'y': ln(c)})) AS ps FROM top),
        |f AS (SELECT len(ps)::BIGINT AS n_terms, len(ps)::DOUBLE AS n,
        |             list_sum(list_transform(ps, p -> p.x)) AS sx,
        |             list_sum(list_transform(ps, p -> p.y)) AS sy,
        |             list_sum(list_transform(ps, p -> p.x * p.y)) AS sxy,
        |             list_sum(list_transform(ps, p -> p.x * p.x)) AS sxx
        |      FROM l)
        |SELECT n_terms,
        |       round((sxy - sx * sy / n) / (sxx - sx * sx / n), 4) AS zipf_slope,
        |       round((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n, 4) AS intercept
        |FROM f""".stripMargin,
    "q129_textrank" -> textRankSql(topK = 30, iterations = 10),
    // integer counts; drift is one ln over an exact integer rational
    "q136_vocab_churn" ->
      """WITH toks AS (
        |  SELECT doc_id % 2 = 0 AS snap_a, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |c AS (
        |  SELECT term,
        |         coalesce(sum(CASE WHEN snap_a THEN 1 END), 0)::BIGINT AS c_a,
        |         coalesce(sum(CASE WHEN NOT snap_a THEN 1 END), 0)::BIGINT AS c_b
        |  FROM toks GROUP BY 1),
        |t AS (SELECT sum(c_a)::BIGINT AS n_a, sum(c_b)::BIGINT AS n_b FROM c),
        |d AS (
        |  SELECT term, c_a, c_b,
        |         round(ln(((c_b + 1) * (n_a + 1))::DOUBLE / ((c_a + 1) * (n_b + 1))::DOUBLE), 4) AS drift
        |  FROM c, t)
        |SELECT term, c_a, c_b, drift,
        |       CASE WHEN drift > 0 THEN 'rising'
        |            WHEN drift < 0 THEN 'falling' ELSE 'stable' END AS direction
        |FROM d ORDER BY abs(drift) DESC, term LIMIT 20""".stripMargin,
    // integer moment sums; VMR = two divisions at the end
    "q120_burstiness" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |top AS (SELECT term, sum(tf)::BIGINT AS total_tf FROM tf GROUP BY 1
        |        ORDER BY total_tf DESC, term LIMIT 20),
        |m AS (
        |  SELECT tf.term, count(*)::BIGINT AS n_docs_with,
        |         sum(tf)::BIGINT AS sum_c, sum(tf * tf)::BIGINT AS sum_c2
        |  FROM tf JOIN top ON tf.term = top.term GROUP BY 1)
        |SELECT term, n_docs_with, sum_c,
        |       round(sum_c / n_docs::DOUBLE, 4) AS mean_c,
        |       round((sum_c2 / n_docs::DOUBLE - (sum_c / n_docs::DOUBLE) * (sum_c / n_docs::DOUBLE))
        |             / (sum_c / n_docs::DOUBLE), 4) AS vmr
        |FROM m, n ORDER BY sum_c DESC, term""".stripMargin,
    "q100_vocab_stats" ->
      """WITH tc AS (
        |  SELECT source, w, count(*)::BIGINT AS cnt
        |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |  GROUP BY 1, 2)
        |SELECT source,
        |       sum(cnt)::BIGINT AS n_tokens,
        |       count(*)::BIGINT AS vocab,
        |       coalesce(sum(CASE WHEN cnt = 1 THEN 1 END), 0)::BIGINT AS hapax,
        |       round(count(*) / sum(cnt)::DOUBLE, 4) AS ttr,
        |       round(coalesce(sum(CASE WHEN cnt = 1 THEN 1 END), 0) / count(*)::DOUBLE, 4) AS hapax_frac
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    // contributions are pure functions of integer counts (identical
    // doubles both engines); per-source sum folds over the ≤K sorted
    // contributions; top-K cut pinned by (count DESC, term)
    // q95's grid + the symmetric JSD terms; same sorted-fold double sum
    "q330_source_jsd" ->
      """WITH toks AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |cc AS (SELECT w, count(*)::BIGINT AS c_c FROM toks GROUP BY w),
        |top AS (SELECT w, c_c FROM cc ORDER BY c_c DESC, w LIMIT 50),
        |vv AS (SELECT count(*)::DOUBLE AS v FROM top),
        |sc AS (SELECT source, toks.w AS w, count(*)::BIGINT AS c
        |       FROM toks JOIN top ON toks.w = top.w GROUP BY 1, 2),
        |srcs AS (SELECT source, sum(c)::DOUBLE AS n FROM sc GROUP BY 1),
        |grid AS (
        |  SELECT s.source, t.w,
        |         (coalesce(sc.c, 0) + 1.0) / (s.n + vv.v) AS p
        |  FROM srcs s CROSS JOIN top t
        |  LEFT JOIN sc ON sc.source = s.source AND sc.w = t.w, vv),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |         a.p * ln(a.p * 2.0 / (a.p + b.p)) / 2.0
        |         + b.p * ln(b.p * 2.0 / (a.p + b.p)) / 2.0 AS t
        |  FROM grid a JOIN grid b ON a.w = b.w AND a.source < b.source)
        |SELECT src_a, src_b,
        |       round(list_sum(list_sort(list(t))), 6) + 0.0 AS jsd
        |FROM pairs GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,
    "q95_source_kl" ->
      """WITH toks AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |cc AS (SELECT w, count(*)::BIGINT AS c_c FROM toks GROUP BY w),
        |top AS (SELECT w, c_c FROM cc ORDER BY c_c DESC, w LIMIT 50),
        |tot AS (SELECT sum(c_c)::DOUBLE AS n_c, count(*)::DOUBLE AS v FROM top),
        |sc AS (SELECT source, toks.w AS w, count(*)::BIGINT AS c_s
        |       FROM toks JOIN top ON toks.w = top.w GROUP BY 1, 2),
        |srcs AS (SELECT source, sum(c_s)::DOUBLE AS n_s FROM sc GROUP BY 1),
        |grid AS (
        |  SELECT s.source, t.w, t.c_c, coalesce(sc.c_s, 0)::BIGINT AS c_s, s.n_s
        |  FROM srcs s CROSS JOIN top t
        |  LEFT JOIN sc ON sc.source = s.source AND sc.w = t.w),
        |contrib AS (
        |  SELECT source,
        |         ((c_s + 1.0) / (n_s + v)) *
        |           ln(((c_s + 1.0) / (n_s + v)) / ((c_c + 1.0) / (n_c + v))) AS kc
        |  FROM grid, tot)
        |SELECT source, count(*)::BIGINT AS n_terms,
        |       round(list_sum(list_sort(list(kc))), 4) + 0.0 AS kl_to_corpus
        |FROM contrib GROUP BY source ORDER BY source""".stripMargin,
    // per-token ratios are pure functions of integer counts (identical
    // doubles on both engines); the per-doc sum folds over the sorted
    // ratio list — the q87 order-pinning contract
    "q90_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |raw AS (SELECT w, count(*)::BIGINT AS c_raw FROM toks GROUP BY 1),
        |tgt AS (SELECT w, count(*)::BIGINT AS c_tgt FROM toks WHERE lang = 'en' GROUP BY 1),
        |vocab AS (
        |  SELECT raw.w, c_raw, coalesce(c_tgt, 0)::BIGINT AS c_tgt
        |  FROM raw LEFT JOIN tgt ON raw.w = tgt.w),
        |tot AS (
        |  SELECT sum(c_raw)::DOUBLE AS n_raw, sum(c_tgt)::DOUBLE AS n_tgt,
        |         count(*)::DOUBLE AS v
        |  FROM vocab),
        |lr AS (
        |  SELECT doc_id,
        |         ln((c_tgt + 1.0) / (n_tgt + v)) - ln((c_raw + 1.0) / (n_raw + v)) AS lr
        |  FROM toks JOIN vocab ON toks.w = vocab.w, tot)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |       round(list_sum(list_sort(list(lr))), 4) + 0.0 AS dsir_logratio
        |FROM lr GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the per-doc mean folds over the sorted logprob list on both
    // engines — the grouped double sum is otherwise order-unpinned
    "q87_unigram_xent" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |vocab AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY 1),
        |tot AS (SELECT count(*)::DOUBLE AS n_total FROM toks),
        |nl AS (SELECT doc_id, -ln(c / n_total) AS nlp FROM toks JOIN vocab USING (w), tot)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |       round(list_sum(list_sort(list(nlp))) / count(*), 4) AS xent_per_token
        |FROM nl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q86_pmi_bigrams" ->
      """WITH d AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
        |pairs AS (
        |  SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM d)),
        |bg AS (SELECT w1, w2, count(*)::BIGINT AS c_xy FROM pairs GROUP BY 1, 2),
        |uni AS (SELECT w, count(*)::BIGINT AS c
        |        FROM (SELECT unnest(ts) AS w FROM d) GROUP BY 1),
        |tot AS (SELECT sum(len(ts))::DOUBLE AS n_uni,
        |               sum(greatest(len(ts) - 1, 0))::DOUBLE AS n_bi FROM d)
        |SELECT w1, w2, c_xy,
        |       round(ln((c_xy::DOUBLE * n_uni * n_uni) / (n_bi * ux.c * uy.c)), 4) AS pmi
        |FROM bg JOIN uni ux ON bg.w1 = ux.w JOIN uni uy ON bg.w2 = uy.w, tot
        |ORDER BY c_xy DESC, w1, w2 LIMIT 20""".stripMargin,
    "q77_tfidf_topterms" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.term, tf, df, round(tf * ln(n_docs / df), 4) AS score
        |  FROM tf JOIN df USING (term), n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tf, df, score, rank::BIGINT AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q78_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
        |dl AS (SELECT doc_id, len(ts)::BIGINT AS dl FROM d),
        |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(ts)) AS avgdl FROM d),
        |toks AS (SELECT doc_id, unnest(ts) AS term FROM d),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |       WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
        |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT doc_id, term,
        |         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |         (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS c
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats)
        |SELECT doc_id, count(*)::BIGINT AS n_matched,
        |       round(coalesce(sum(c) FILTER (term = 'spark'), 0.0)
        |           + coalesce(sum(c) FILTER (term = 'join'), 0.0)
        |           + coalesce(sum(c) FILTER (term = 'window'), 0.0), 4) AS bm25
        |FROM contrib GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q80_inverted_index" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |stats AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf FROM tf GROUP BY 1),
        |ranked AS (
        |  SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM tf),
        |heads AS (
        |  SELECT term, string_agg(doc_id, ',' ORDER BY doc_id) AS postings_head
        |  FROM ranked WHERE rn <= 8 GROUP BY term)
        |SELECT term, df, total_tf, postings_head
        |FROM stats JOIN heads USING (term) ORDER BY term""".stripMargin,
  )
}
