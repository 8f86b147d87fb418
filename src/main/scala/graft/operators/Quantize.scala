package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding quantization (training-data-pipeline storage path): scalar
  * int8 quantization with a per-vector scale — 4× smaller embedding
  * tables for the ANN candidate stage, exact vectors kept only for
  * re-ranking. All arithmetic is builtin transform/aggregate (codegen'd
  * for the quantize path; dequantized similarity reuses FloatVecDot
  * after a cast).
  */
object Quantize extends QueryModule {

  /** Per-vector max-abs scale: q = round(x * 127 / scale) clamped to
    * [-127, 127], stored with the scale for dequantization.
    */
  def quantize(embeddings: DataFrame,
               vecCol: String = "embedding"): DataFrame = {
    val scale = greatest(array_max(transform(col(vecCol), x => abs(x))), lit(1e-12f))
    embeddings
      .withColumn("q_scale", scale.cast("float"))
      .withColumn("q_vec",
        transform(col(vecCol), x =>
          greatest(lit(-127),
            least(lit(127), round(x.cast("double") * 127.0 / col("q_scale")).cast("int")))
            .cast("tinyint")))
  }

  /** Dequantize back to float vectors: x ≈ q * scale / 127. */
  def dequantized(qVec: Column, qScale: Column): Column =
    transform(qVec, q => (q.cast("double") * qScale / 127.0).cast("float"))

  /** Approximate cosine on quantized vectors (candidate scoring). */
  def quantizedCosine(aVec: Column, aScale: Column, bVec: Column, bScale: Column): Column = {
    val a = dequantized(aVec, aScale)
    val b = dequantized(bVec, bScale)
    graft.functions.VecOps.vecDot(a, b) /
      (sqrt(graft.functions.VecOps.vecDot(a, a)) * sqrt(graft.functions.VecOps.vecDot(b, b)))
  }

  /** Per-vector int8 quantization stats — the oracle surface for the
    * quantize kernel. Every value is exact: the scale is float32 math
    * (abs/max are exact ops, the float→double widening is exact, so no
    * rounding is needed for the hash compare), the rest is int8
    * arithmetic. Max-abs scaling guarantees n_saturated ≥ 1.
    */
  def quantizeStats(embeddings: DataFrame): DataFrame =
    quantize(embeddings)
      .select(
        col("vec_id"),
        col("q_scale").cast("double").as("q_scale"),
        aggregate(col("q_vec"), lit(0L), (acc, q) => acc + q.cast("long")).as("q_sum"),
        array_min(col("q_vec")).cast("long").as("q_min"),
        array_max(col("q_vec")).cast("long").as("q_max"),
        size(filter(col("q_vec"), q => abs(q) === 127)).cast("long").as("n_saturated"))
      .orderBy("vec_id")

  /** q96: embedding standardization — the feature-scaling pass before
    * clustering / ANN training (k-means and IVF are distance-based, so
    * an unscaled dimension dominates every centroid): per-dimension
    * z-score over the corpus, then per-vector stats of the standardized
    * vector (L2 norm, extremes).
    *
    * Scale shape: the classic two-pass broadcast normalization —
    * pass 1 aggregates per-dimension (n, Σx, Σx²) via posexplode with
    * map-side partial agg (the stats table is dim-count rows, i.e.
    * tiny); pass 2 broadcasts it back onto the exploded stream and
    * rolls up per vector. No global sort, no driver collect. The
    * per-vector z² sum folds over the dim-SORTED struct list — dims
    * per vector are bounded (64 here), so the order-pinning collect is
    * O(width), not O(corpus) (the q87 contract). σ uses the explicit
    * E[x²]−E[x]² form so the oracle can reproduce it verbatim rather
    * than matching an engine's Welford variant.
    */
  def standardizedStats(embeddings: DataFrame): DataFrame = {
    val ex = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("x").cast("double").as("x"))
    val mu = col("s") / col("n")
    val stats = ex.groupBy("dim").agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
      .select(col("dim"), mu.as("mu"),
        sqrt(col("ss") / col("n") - mu * mu).as("sigma"))
    ex.join(broadcast(stats), "dim")
      // a corpus-constant dimension (zeroed/padded dims are common in
      // truncated embedding dumps) has σ = 0 — define its z as 0
      // instead of NaN-poisoning every vector's rollup
      .withColumn("z",
        when(col("sigma") === 0d, lit(0d))
          .otherwise((col("x") - col("mu")) / col("sigma")))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_dims"),
        round(sqrt(aggregate(
          array_sort(collect_list(struct(col("dim"), col("z")))), lit(0.0),
          (acc, s) => acc + s.getField("z") * s.getField("z"))), 4).as("z_l2"),
        round(max(col("z")), 4).as("max_z"),
        round(min(col("z")), 4).as("min_z"))
      .orderBy("vec_id")
  }

  /** q157: per-DIMENSION embedding health — the column-wise transpose
    * of q96's per-vector view: for every coordinate, exact-integer
    * mean/variance (values floor-scaled to micro-units first, so the
    * moments are order-independent integer sums — the q122 convention
    * applied to floats), min/max, and the dead-rate (exact-zero
    * fraction). Dead or near-constant dimensions mean the encoder
    * collapsed; variance drift between snapshots means the embedding
    * space moved and ANN indexes (q59) need retraining.
    *
    * Scale shape: posexplode is a dim× row multiplier that collapses
    * immediately into a dims-sized hash aggregate with map-side
    * partials — the shuffle carries (dim, moments) rows, never the
    * exploded stream. Moment SUMS go through decimal(38,0) (HUGEINT in
    * the oracle): a BIGINT suu wraps past ~10^6 vectors × |v|≈1 — the
    * sf1 scale sweep hit exactly that. The square itself is taken AFTER
    * widening (decimal × long), so a |v| > ~3037 element is exact too —
    * an int64 u*u would wrap silently per-element while the HUGEINT
    * oracle stayed exact, an asymmetric corruption just past the
    * envelope.
    */
  def embeddingDimHealth(embeddings: DataFrame,
                         vecCol: String = "embedding"): DataFrame = {
    val e = embeddings
      .select(posexplode(col(vecCol)))
      .select(col("pos").as("dim"),
        expr("CAST(floor(CAST(col AS DOUBLE) * 1000000) AS BIGINT)").as("u"))
    e.groupBy("dim").agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(u AS DECIMAL(38,0))")).as("su"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * u")).as("suu"),
        min("u").as("minu"), max("u").as("maxu"),
        sum(when(col("u") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select(col("dim"), col("n"),
        round(col("su").cast("double") / col("n") / lit(1000000.0), 6).as("mean"),
        round((col("suu").cast("double") / col("n")
          - (col("su").cast("double") / col("n")) * (col("su").cast("double") / col("n")))
          / lit(1000000.0) / lit(1000000.0), 6).as("variance"),
        round(col("minu") / lit(1000000.0), 6).as("vmin"),
        round(col("maxu") / lit(1000000.0), 6).as("vmax"),
        round(col("n_zero") / col("n").cast("double"), 4).as("dead_rate"))
      .orderBy("dim")
  }

  /** q161: embedding covariance matrix (upper triangle) in ONE scan
    * with NO self-join — the input to PCA/whitening/eigen-health
    * checks. The trick is a homogeneous coordinate: each vector is
    * floor-scaled to integer ten-thousandths and AUGMENTED with a
    * constant slot (the scaled 1.0), so a single per-row pair
    * expansion i≤j yields, in the same aggregate, the second moments
    * S_ij, the linear sums S_i (pairs against the constant slot), and
    * n (the constant-constant cell) — cov then needs no extra pass.
    *
    * Scale shape: the pair expansion is row-local (transform/flatten,
    * no join) and collapses into a dims²-bounded hash aggregate with
    * map-side partials; the shuffle carries (i,j,moment) rows only.
    * The tiny linear/count cells are broadcast back onto the dims²
    * frame. Integer moments are order-independent → bit-identical
    * cross-engine. (~10^9 rows × scale 10^8 products approach int64
    * range — widen to decimal there, the q122 note.)
    */
  def embeddingCovariance(embeddings: DataFrame,
                          vecCol: String = "embedding"): DataFrame = {
    // two chained primitive explodes instead of building a struct-array
    // per row: Generate(explode) stays in codegen and the projection is
    // long arithmetic, ~3x faster than a nested-lambda flatten
    val pairs = embeddings
      .select(expr(
        s"""concat(transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
           |       array(CAST(10000 AS BIGINT)))""".stripMargin).as("ua"))
      .select(col("ua"), posexplode(col("ua")).as(Seq("di", "ui")))
      .select(col("di"), col("ui"),
        posexplode(expr("slice(ua, di + 1, size(ua) - di)")).as(Seq("pj", "uj")))
      .select(col("di"), (col("di") + col("pj")).as("dj"), (col("ui") * col("uj")).as("p"))
    val g = pairs.groupBy("di", "dj").agg(sum("p").as("sp"))
    val dMax = g.agg(max("dj").as("dd"))
    val nRow = g.join(broadcast(dMax), col("di") === col("dd") && col("dj") === col("dd"))
      .select(expr("sp div 100000000").as("n"))
    val lin = g.join(broadcast(dMax), col("dj") === col("dd") && col("di") < col("dd"))
      .select(col("di").as("d"), col("sp").as("sl"))
    g.join(broadcast(dMax), col("dj") < col("dd"))
      .join(broadcast(lin.select(col("d").as("di"), col("sl").as("sli"))), "di")
      .join(broadcast(lin.select(col("d").as("dj"), col("sl").as("slj"))), "dj")
      .crossJoin(broadcast(nRow))
      .select(col("di"), col("dj"), col("n"),
        (round(expr("CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0)"), 6) + lit(0.0)).as("m2"),
        (round(expr(
          """CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0)
            | - (CAST(sli AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0))
            | * (CAST(slj AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0))""".stripMargin), 6) + lit(0.0)).as("cov"))
      .orderBy("di", "dj")
  }

  /** Driver-side top eigenpair of the q161 covariance matrix by power
    * iteration — the collect is bounded by dims² (a 64-dim space is
    * ~2k rows regardless of corpus size), which is the legitimate
    * collect shape: model-sized, never data-sized. Deterministic:
    * fixed all-ones start, fixed iteration count. Returns
    * (eigenvalue, explainedVarianceRatio, eigenvector).
    */
  def topEigenpair(cov: DataFrame, iters: Int = 50): (Double, Double, Array[Double]) = {
    val rows = cov.select("di", "dj", "cov").collect()
    val d = rows.iterator.map(_.getInt(1)).max + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i)(j) = v; m(j)(i) = v
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm > 0) { v = w.map(_ / norm); lambda = norm }
    }
    val trace = (0 until d).map(i => m(i)(i)).sum
    (lambda, if (trace > 0) lambda / trace else 0.0, v)
  }

  /** The ±1 Johnson–Lindenstrauss sign matrix as a pure function of
    * (dim, proj) through the md5-uniform convention: sign = +1 iff the
    * first hex digit of md5("jl|d|p") < '8'. Derived independently on
    * the JVM here and in SQL by the oracle — no shipped state.
    */
  private[operators] def jlSign(d: Int, p: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h0 = md.digest(s"jl|$d|$p".getBytes("UTF-8"))(0) & 0xff
    if (h0 < 0x80) 1L else -1L
  }

  /** q279: JOHNSON–LINDENSTRAUSS projection distortion audit — project
    * the 64-dim embeddings onto `dProj` ±1 random hyperplanes (the
    * Achlioptas 2001 database-friendly JL construction, signs from the
    * md5 convention so any engine regenerates the same matrix) and
    * report how well consecutive-pair distances survive:
    * ratio = ‖R(x−y)‖² / (dProj·‖x−y‖²), ≈ 1 in expectation. This is
    * the go/no-go gate before swapping full vectors for projections in
    * the ANN candidate stage (16/64 dims = 4× less shuffle weight).
    *
    * Exactness: vectors micro-quantize BEFORE any arithmetic, so
    * projections, squared norms and the per-pair ppm ratio are integers
    * end-to-end (numerator rides decimal(38,0) ↔ HUGEINT); the pair
    * sample is id-consecutive (a LINEAR join, never quadratic), and
    * mean/min/max over integer ppm are order-independent.
    */
  def jlDistortion(embeddings: DataFrame, dims: Int = 64,
                   dProj: Int = 16): DataFrame = {
    val signs = org.apache.spark.sql.functions.typedLit(
      Seq.tabulate(dProj)(p => Seq.tabulate(dims)(d => jlSign(d, p))))
    val q = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000) as bigint))")
        .as("xq"))
    val pairs = q.alias("a")
      .join(q.alias("b"), expr("b.vec_id = a.vec_id + 1"))
      .select(col("a.vec_id").as("id_a"),
        expr("zip_with(a.xq, b.xq, (x, y) -> x - y)").as("dv"))
      .withColumn("signs", signs)
    val ratios = pairs
      .withColumn("proj_sq", expr(
        """aggregate(
          |  transform(signs, srow ->
          |    aggregate(zip_with(srow, dv, (s, x) -> s * x), 0L, (a, v) -> a + v)),
          |  cast(0 as decimal(38,0)),
          |  (a, pv) -> cast(a + cast(pv as decimal(38,0)) * pv as decimal(38,0)))
          |""".stripMargin))
      .withColumn("orig_sq", expr("aggregate(dv, 0L, (a, x) -> a + x * x)"))
      .filter(col("orig_sq") > 0)
      .withColumn("ratio_ppm",
        expr(s"cast(proj_sq * 1000000 div ($dProj * orig_sq) as bigint)"))
    ratios.agg(count(lit(1)).as("n_pairs"),
      min("ratio_ppm").as("min_ratio_ppm"),
      max("ratio_ppm").as("max_ratio_ppm"),
      expr("sum(ratio_ppm) div count(1)").as("mean_ratio_ppm"),
      sum(when(col("ratio_ppm").between(700000, 1300000), 1L).otherwise(0L))
        .as("n_within_30pct"))
  }

  /** q300: kernel MMD² drift between every label pair — the
    * embedding-space companion to q133/q299's length drift: two
    * populations can share every marginal histogram yet sit in
    * different regions of embedding space, and maximum mean
    * discrepancy (Gretton et al. 2012, JMLR) is the standard
    * two-sample alarm there. Reported for two kernels: linear
    * k(x,y)=x·y, where MMD² = ‖μ_a − μ_b‖², and quadratic
    * k(x,y)=(x·y)², whose feature map is vec(xxᵀ), so
    * MMD² = Σᵢⱼ(M_a − M_b)²ᵢⱼ over the D×D second-moment matrices —
    * it sees covariance-shape drift the linear kernel is blind to.
    *
    * The 100 TB point is the FACTORIZATION: the naive estimator is a
    * quadratic-in-rows pairwise kernel sum; routing it through the
    * per-group mean vector (D values) and second-moment matrix
    * (D(D+1)/2 values) makes it ONE corpus pass + arithmetic on a
    * groups×D² table that never grows with the corpus. No pair is
    * ever enumerated.
    *
    * Exactness: vectors micro-quantize (×10⁴) before any arithmetic
    * (the q161 homogeneous-Gram pass is reused verbatim); the moment
    * gaps cross-multiply by the opposite group count, square in
    * decimal(38,0) ↔ HUGEINT, and divide once at the end — the biased
    * V-statistic form, exact and order-independent under any
    * partitioning.
    */
  def mmdDrift(embeddings: DataFrame): DataFrame = {
    val pairs = embeddings
      .select(col("label"), expr(
        """concat(transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
          |       array(CAST(10000 AS BIGINT)))""".stripMargin).as("ua"))
      .select(col("label"), col("ua"), posexplode(col("ua")).as(Seq("di", "ui")))
      .select(col("label"), col("di"), col("ui"),
        posexplode(expr("slice(ua, di + 1, size(ua) - di)")).as(Seq("pj", "uj")))
      .select(col("label"), col("di"), (col("di") + col("pj")).as("dj"),
        (col("ui") * col("uj")).as("p"))
    val g = pairs.groupBy("label", "di", "dj").agg(sum("p").as("sp"))
    val dMax = g.agg(max("dj").as("dd"))
    val nPer = g.join(broadcast(dMax), col("di") === col("dd") && col("dj") === col("dd"))
      .select(col("label"), expr("sp div 100000000").as("n"))
    val lab = nPer.alias("la")
      .join(broadcast(nPer.alias("lb")), col("la.label") < col("lb.label"))
      .select(col("la.label").as("label_a"), col("lb.label").as("label_b"),
        col("la.n").as("n_a"), col("lb.n").as("n_b"))
    // linear sums in quantized units: sp = 10⁴·Σ xq_d (exact division)
    val lin = g.join(broadcast(dMax), col("dj") === col("dd") && col("di") < col("dd"))
      .select(col("label"), col("di").as("d"), expr("sp div 10000").as("s"))
    // moment frames are model-bounded (labels × D) — broadcast explicitly
    // so the pairwise arithmetic never shuffles, at any corpus size
    val linNum = lin.alias("a")
      .join(broadcast(lin.alias("b")),
        col("a.d") === col("b.d") && col("a.label") < col("b.label"))
      .join(broadcast(lab),
        col("a.label") === col("label_a") && col("b.label") === col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum(expr(
        """(cast(a.s as decimal(38,0)) * n_b - cast(b.s as decimal(38,0)) * n_a)
          | * (cast(a.s as decimal(38,0)) * n_b - cast(b.s as decimal(38,0)) * n_a)""".stripMargin))
        .as("lin_num"))
    val quad = g.join(broadcast(dMax), col("dj") < col("dd"))
      .select(col("label"), col("di"), col("dj"), col("sp"),
        when(col("di") === col("dj"), lit(1L)).otherwise(lit(2L)).as("w"))
    val quadNum = quad.alias("a")
      .join(broadcast(quad.alias("b")),
        col("a.di") === col("b.di") && col("a.dj") === col("b.dj")
          && col("a.label") < col("b.label"))
      .join(broadcast(lab),
        col("a.label") === col("label_a") && col("b.label") === col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum(expr(
        """a.w * (cast(a.sp as decimal(38,0)) * n_b - cast(b.sp as decimal(38,0)) * n_a)
          |    * (cast(a.sp as decimal(38,0)) * n_b - cast(b.sp as decimal(38,0)) * n_a)""".stripMargin))
        .as("quad_num"))
    lab.join(linNum, Seq("label_a", "label_b"))
      .join(quadNum, Seq("label_a", "label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(expr(
          "cast(lin_num as double) / (cast(n_a as double) * n_a * n_b * n_b) / 1e8"), 6)
          .as("mmd2_linear"),
        round(expr(
          "cast(quad_num as double) / (cast(n_a as double) * n_a * n_b * n_b) / 1e16"), 6)
          .as("mmd2_quadratic"))
      .orderBy("label_a", "label_b")
  }

  /** q310: sliced Wasserstein-1 distance between every label pair
    * (Rabin et al. 2011; Bonneel et al. 2015) — the transport-based
    * drift metric completing the panel: q300's MMD sees moment shifts,
    * sliced-W1 sees MASS TRANSPORT (how far probability actually has
    * to move), and on 1-D projections the optimal transport is exact
    * CDF arithmetic — no Sinkhorn, no pairing.
    *
    * Each of `slices` md5-sign directions (the q279 Achlioptas
    * convention, salt 'sw') projects the quantized vectors to
    * integers; projections bin into `bins` equal-width buckets over
    * the slice's global range, and the per-pair W1 in bin units is the
    * exact integer Σ|cumA·nB − cumB·nA| summed over slices — ONE
    * closing division by slices·nA·nB. Binning is the documented
    * approximation that keeps the CDF grid bounded at corpus scale.
    *
    * Scale shape: one corpus pass projects (slices narrow columns);
    * everything after runs on the slices × labels × bins grid —
    * bounded by configuration, not the corpus. Range and label dims
    * broadcast.
    */
  def slicedWasserstein(embeddings: DataFrame, slices: Int = 8,
                        bins: Int = 64, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    val signs = typedLit(Seq.tabulate(slices)(s => Seq.tabulate(dims)(d => swSign(d, s))))
    val proj = embeddings.select(col("label"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000) as bigint))")
        .as("xq"))
      .withColumn("signs", signs)
      .select(col("label"), posexplode(expr(
        """transform(signs, srow ->
          |  aggregate(zip_with(srow, xq, (s, x) -> s * x), 0L, (a, v) -> a + v))"""
          .stripMargin)).as(Seq("s", "p")))
    val rng = proj.groupBy("s").agg(min("p").as("lo"), max("p").as("hi"))
    val binned = proj.join(broadcast(rng), "s")
      .select(col("s"), col("label"),
        expr(s"(p - lo) * $bins div (hi - lo + 1)").as("bin"))
      .groupBy("s", "label", "bin").agg(count(lit(1)).as("c"))
    val labels = embeddings.groupBy("label").agg(count(lit(1)).as("n"))
    val dense = labels
      .crossJoin(broadcast(spark.range(bins).select(col("id").as("bin"))))
      .crossJoin(broadcast(rng.select("s")))
      .join(binned, Seq("s", "label", "bin"), "left").na.fill(0L, Seq("c"))
    val w = Window.partitionBy("s", "label").orderBy("bin")
    val cum = dense.withColumn("cum", sum("c").over(w))
    cum.alias("a")
      .join(broadcast(cum.alias("b")),
        col("a.s") === col("b.s") && col("a.bin") === col("b.bin")
          && col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        abs(col("a.cum") * col("b.n") - col("b.cum") * col("a.n")).as("gap"))
      .groupBy("label_a", "label_b")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"), sum("gap").as("gap_sum"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(col("gap_sum").cast("double") /
          (lit(slices.toLong) * col("n_a") * col("n_b")).cast("double"), 6).as("sw1_bins"))
      .orderBy("label_a", "label_b")
  }

  /** md5-sign for the q310 slice directions (q279's jlSign, salt 'sw'). */
  private[operators] def swSign(d: Int, s: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h0 = md.digest(s"sw|$d|$s".getBytes("UTF-8"))(0) & 0xff
    if (h0 < 0x80) 1L else -1L
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q310_sliced_w1" -> ((s, d) => slicedWasserstein(Tables(s, d).embeddings)),
    "q300_mmd_drift" -> ((s, d) => mmdDrift(Tables(s, d).embeddings)),
    "q279_jl_distortion" -> ((s, d) => jlDistortion(Tables(s, d).embeddings)),
    "q55_quantize_stats" -> ((s, d) => quantizeStats(Tables(s, d).embeddings)),
    "q96_standardize_stats" -> ((s, d) => standardizedStats(Tables(s, d).embeddings)),
    "q157_dim_health" -> ((s, d) => embeddingDimHealth(Tables(s, d).embeddings)),
    "q161_embedding_cov" -> ((s, d) => embeddingCovariance(Tables(s, d).embeddings)),
  )

  override def oracles: Map[String, String] = Map(
    // regenerates the same ±1 sign matrix from md5('jl|d|p') first hex
    // digit; all arithmetic integer (HUGEINT mirror of decimal(38,0))
    "q279_jl_distortion" ->
      """WITH signs AS (
        |  SELECT d.d, p.p,
        |         CASE WHEN substr(md5('jl|' || d.d || '|' || p.p), 1, 1) < '8'
        |              THEN 1 ELSE -1 END AS s
        |  FROM generate_series(0, 63) d(d), generate_series(0, 15) p(p)),
        |q AS (SELECT vec_id, list_transform(embedding,
        |        x -> CAST(floor(x::DOUBLE * 1000000) AS BIGINT)) AS xq
        |      FROM embeddings),
        |pr AS (SELECT a.vec_id AS id_a,
        |              list_transform(range(len(a.xq)), i -> a.xq[i+1] - b.xq[i+1]) AS dv
        |       FROM q a JOIN q b ON b.vec_id = a.vec_id + 1),
        |comp AS (SELECT id_a, t.d, dv[t.d + 1] AS x
        |         FROM pr, generate_series(0, 63) t(d)),
        |proj AS (SELECT id_a, p, sum(s * x)::BIGINT AS pv
        |         FROM comp JOIN signs ON comp.d = signs.d GROUP BY id_a, p),
        |ps AS (SELECT id_a, sum(pv::HUGEINT * pv) AS proj_sq FROM proj GROUP BY id_a),
        |os AS (SELECT id_a, sum(x::HUGEINT * x) AS orig_sq FROM comp GROUP BY id_a),
        |r AS (SELECT id_a, (proj_sq * 1000000 // (16 * orig_sq))::BIGINT AS ratio_ppm
        |      FROM ps JOIN os USING (id_a) WHERE orig_sq > 0)
        |SELECT count(*)::BIGINT AS n_pairs,
        |       min(ratio_ppm) AS min_ratio_ppm,
        |       max(ratio_ppm) AS max_ratio_ppm,
        |       (sum(ratio_ppm) // count(*))::BIGINT AS mean_ratio_ppm,
        |       sum(CASE WHEN ratio_ppm BETWEEN 700000 AND 1300000
        |                THEN 1 ELSE 0 END)::BIGINT AS n_within_30pct
        |FROM r""".stripMargin,
    "q157_dim_health" ->
      """WITH e AS (SELECT unnest(range(len(embedding))) AS dim,
        |                  unnest(embedding) AS v
        |           FROM embeddings),
        |u AS (SELECT dim, CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS u FROM e),
        |m AS (SELECT dim, count(*)::BIGINT AS n, sum(u)::HUGEINT AS su,
        |             sum(u::HUGEINT * u) AS suu, min(u) AS minu, max(u) AS maxu,
        |             sum(CASE WHEN u = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero
        |      FROM u GROUP BY dim)
        |SELECT CAST(dim AS INT) AS dim, n,
        |       round(CAST(su AS DOUBLE) / n / 1000000.0, 6) AS mean,
        |       round((CAST(suu AS DOUBLE) / n - (CAST(su AS DOUBLE) / n) * (CAST(su AS DOUBLE) / n)) / 1000000.0 / 1000000.0, 6) AS variance,
        |       round(minu / 1000000.0, 6) AS vmin,
        |       round(maxu / 1000000.0, 6) AS vmax,
        |       round(n_zero / CAST(n AS DOUBLE), 4) AS dead_rate
        |FROM m ORDER BY dim""".stripMargin,
    "q55_quantize_stats" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    greatest(list_max(list_transform(embedding, x -> abs(x))), 1e-12::FLOAT) AS scale_f,
        |    list_transform(embedding, x ->
        |      greatest(-127, least(127, round(
        |        x::DOUBLE * 127.0 / greatest(list_max(list_transform(embedding, y -> abs(y))), 1e-12::FLOAT)::DOUBLE
        |      )::INTEGER))) AS qv
        |  FROM embeddings
        |)
        |SELECT vec_id, scale_f::DOUBLE AS q_scale,
        |       list_sum(qv)::BIGINT AS q_sum,
        |       list_min(qv)::BIGINT AS q_min,
        |       list_max(qv)::BIGINT AS q_max,
        |       len(list_filter(qv, v -> abs(v) = 127))::BIGINT AS n_saturated
        |FROM q ORDER BY vec_id""".stripMargin,
    // per-dim sums accumulate float→double widenings in engine-specific
    // order (ulp drift absorbed by the round(4)); the per-vector z² sum
    // folds in dim order on both engines
    "q96_standardize_stats" ->
      """WITH ex AS (
        |  SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS x
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
        |stats AS (
        |  SELECT dim, sum(x) / count(*) AS mu,
        |         sqrt(sum(x * x) / count(*) - (sum(x) / count(*)) * (sum(x) / count(*))) AS sigma
        |  FROM ex GROUP BY dim),
        |z AS (
        |  SELECT vec_id, ex.dim,
        |         CASE WHEN sigma = 0 THEN 0 ELSE (x - mu) / sigma END AS z
        |  FROM ex JOIN stats ON ex.dim = stats.dim)
        |SELECT vec_id, count(*)::BIGINT AS n_dims,
        |       round(sqrt(list_sum(list_transform(
        |         list_sort(list({'d': dim, 'z': z})), s -> s.z * s.z))), 4) AS z_l2,
        |       round(max(z), 4) AS max_z,
        |       round(min(z), 4) AS min_z
        |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // regenerates the ±1 slice matrix from md5('sw|d|s'); exact integer
    // CDF-gap sums over the dense slices×labels×bins grid
    "q310_sliced_w1" ->
      """WITH signs AS (SELECT d.d, s.s,
        |                      CASE WHEN substr(md5('sw|' || d.d || '|' || s.s), 1, 1) < '8'
        |                           THEN 1 ELSE -1 END AS sg
        |               FROM generate_series(0, 63) d(d), generate_series(0, 7) s(s)),
        |q AS (SELECT vec_id, label, list_transform(embedding,
        |        x -> CAST(floor(x::DOUBLE * 10000) AS BIGINT)) AS xq
        |      FROM embeddings),
        |comp AS (SELECT vec_id, label, t.d, xq[t.d + 1] AS x
        |         FROM q, generate_series(0, 63) t(d)),
        |proj AS (SELECT vec_id, label, s, sum(sg * x)::BIGINT AS p
        |         FROM comp JOIN signs ON signs.d = comp.d GROUP BY 1, 2, 3),
        |rng AS (SELECT s, min(p) AS lo, max(p) AS hi FROM proj GROUP BY 1),
        |binned AS (SELECT pr.s, label, (p - lo) * 64 // (hi - lo + 1) AS bin,
        |                  count(*)::BIGINT AS c
        |           FROM proj pr JOIN rng ON rng.s = pr.s GROUP BY 1, 2, 3),
        |labels AS (SELECT label, count(*)::BIGINT AS n FROM embeddings GROUP BY 1),
        |dense AS (SELECT r.s, l.label, l.n, b.bin, coalesce(bb.c, 0)::BIGINT AS c
        |          FROM (SELECT DISTINCT s FROM rng) r
        |          CROSS JOIN labels l CROSS JOIN generate_series(0, 63) b(bin)
        |          LEFT JOIN binned bb ON bb.s = r.s AND bb.label = l.label
        |                             AND bb.bin = b.bin),
        |cum AS (SELECT s, label, n, bin,
        |               sum(c) OVER (PARTITION BY s, label ORDER BY bin)::BIGINT AS cum
        |        FROM dense)
        |SELECT a.label AS label_a, b.label AS label_b, a.n AS n_a, b.n AS n_b,
        |       round(sum(abs(a.cum * b.n - b.cum * a.n))::DOUBLE
        |             / (8 * a.n * b.n)::DOUBLE, 6) AS sw1_bins
        |FROM cum a JOIN cum b ON a.s = b.s AND a.bin = b.bin AND a.label < b.label
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,
    // per-label homogeneous Gram (q161's pass grouped by label), then
    // moment-gap cross-multiplication in HUGEINT (decimal(38,0) mirror)
    "q300_mmd_drift" ->
      """WITH base AS (
        |  SELECT label, list_append(list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
        |         10000::BIGINT) AS ua
        |  FROM embeddings),
        |e1 AS (SELECT label, ua, unnest(range(len(ua))) AS i FROM base),
        |e2 AS (SELECT label, ua, i, unnest(range(i, len(ua))) AS j FROM e1),
        |g AS (SELECT label, i AS di, j AS dj,
        |             sum(ua[i + 1] * ua[j + 1])::BIGINT AS sp
        |      FROM e2 GROUP BY 1, 2, 3),
        |dm AS (SELECT max(dj) AS dd FROM g),
        |np AS (SELECT label, sp // 100000000 AS n FROM g, dm WHERE di = dd AND dj = dd),
        |lab AS (SELECT a.label AS label_a, b.label AS label_b, a.n AS n_a, b.n AS n_b
        |        FROM np a JOIN np b ON a.label < b.label),
        |lin AS (SELECT label, di AS d, sp // 10000 AS s FROM g, dm WHERE dj = dd AND di < dd),
        |ln2 AS (SELECT l.label_a, l.label_b,
        |               sum((a.s::HUGEINT * l.n_b - b.s::HUGEINT * l.n_a)
        |                   * (a.s::HUGEINT * l.n_b - b.s::HUGEINT * l.n_a)) AS lin_num
        |        FROM lin a JOIN lin b ON a.d = b.d AND a.label < b.label
        |        JOIN lab l ON a.label = l.label_a AND b.label = l.label_b
        |        GROUP BY 1, 2),
        |qd AS (SELECT label, di, dj, sp, CASE WHEN di = dj THEN 1 ELSE 2 END AS w
        |       FROM g, dm WHERE dj < dd),
        |qn AS (SELECT l.label_a, l.label_b,
        |              sum(a.w * (a.sp::HUGEINT * l.n_b - b.sp::HUGEINT * l.n_a)
        |                      * (a.sp::HUGEINT * l.n_b - b.sp::HUGEINT * l.n_a)) AS quad_num
        |       FROM qd a JOIN qd b ON a.di = b.di AND a.dj = b.dj AND a.label < b.label
        |       JOIN lab l ON a.label = l.label_a AND b.label = l.label_b
        |       GROUP BY 1, 2)
        |SELECT l.label_a, l.label_b, l.n_a, l.n_b,
        |       round(lin_num::DOUBLE / (l.n_a::DOUBLE * l.n_a * l.n_b * l.n_b) / 1e8, 6)
        |         AS mmd2_linear,
        |       round(quad_num::DOUBLE / (l.n_a::DOUBLE * l.n_a * l.n_b * l.n_b) / 1e16, 6)
        |         AS mmd2_quadratic
        |FROM lab l
        |JOIN ln2 ON ln2.label_a = l.label_a AND ln2.label_b = l.label_b
        |JOIN qn ON qn.label_a = l.label_a AND qn.label_b = l.label_b
        |ORDER BY l.label_a, l.label_b""".stripMargin,
    // homogeneous-coordinate Gram: DuckDB lists are 1-based (ua[i+1]);
    // the augmented constant slot carries the linear sums and n
    "q161_embedding_cov" ->
      """WITH base AS (
        |  SELECT list_append(list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
        |         10000::BIGINT) AS ua
        |  FROM embeddings),
        |e1 AS (SELECT ua, unnest(range(len(ua))) AS i FROM base),
        |e2 AS (SELECT ua, i, unnest(range(i, len(ua))) AS j FROM e1),
        |p AS (SELECT i AS di, j AS dj, ua[i + 1] * ua[j + 1] AS p FROM e2),
        |g AS (SELECT di, dj, sum(p)::BIGINT AS sp FROM p GROUP BY 1, 2),
        |dm AS (SELECT max(dj) AS dd FROM g),
        |nn AS (SELECT sp // 100000000 AS n FROM g, dm WHERE di = dd AND dj = dd),
        |lin AS (SELECT di AS d, sp AS sl FROM g, dm WHERE dj = dd AND di < dd)
        |SELECT CAST(g.di AS INT) AS di, CAST(g.dj AS INT) AS dj, n,
        |       round(CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0), 6) + 0.0 AS m2,
        |       round(CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0)
        |             - (CAST(li.sl AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0))
        |             * (CAST(lj.sl AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0)), 6) + 0.0 AS cov
        |FROM g, dm, nn, lin li, lin lj
        |WHERE g.dj < dd AND g.di = li.d AND g.dj = lj.d
        |ORDER BY di, dj""".stripMargin,
  )
}
