package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property and fixture tests for the round-8 additions q297–q305. */
class Round8NewOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, String, Long)]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- q297 Fleiss' kappa -------------------------------------------------

  test("fleissKappa: perfect rater agreement with both categories present gives kappa 1") {
    // five rows all three raters call 'en', one row all three call not-en
    // (an all-'en' corpus makes P_e = 1 and kappa correctly undefined)
    val d = docs(Seq.tabulate(5)(i =>
      (i.toLong, "the thee and a sentence here everyone agrees", "en", "s", 45L)) :+
      (9L, "zzz yyy xxx www", "de", "s", 15L))
    val r = TextAnalysis.fleissKappa(d).collect()(0)
    assert(r.getAs[Double]("p_bar") == 1.0)
    assert(r.getAs[Double]("fleiss_kappa") == 1.0)
  }

  test("fleissKappa: bounded by 1 and defined on the corpus fixture") {
    val d = spark.read.parquet(s"${sf("")}/documents.parquet")
    val r = TextAnalysis.fleissKappa(d).collect()(0)
    val k = r.getAs[Double]("fleiss_kappa")
    assert(k <= 1.0 && k >= -1.0)
    assert(r.getAs[Long]("n_items") > 0)
  }

  // ---- q298 randomized response -------------------------------------------

  test("rrFrequency: reported counts conserve mass and the estimator inverts exactly at p=3/4") {
    val d = spark.read.parquet(s"${sf("")}/documents.parquet")
    val rows = CorpusOps.rrFrequency(d).collect()
    val n = rows.map(_.getAs[Long]("n_true")).sum
    assert(rows.map(_.getAs[Long]("n_reported")).sum == n)
    // unbiased-inverse identity: sum of estimates equals n exactly up to
    // the per-row rounding (k rows, each rounded to 2dp)
    val estSum = rows.map(_.getAs[Double]("est_true")).sum
    assert(math.abs(estSum - n) <= rows.length * 0.01 + 1e-6)
  }

  // ---- q299 Wasserstein-1 -------------------------------------------------

  test("lengthDriftW1: agrees with q133 on ks_d and a uniform +delta shift scores W1 = delta") {
    val d = spark.read.parquet(s"${sf("")}/documents.parquet")
    val w1 = CorpusOps.lengthDriftW1(d).select("source", "ks_d").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ks = CorpusOps.lengthDriftKs(d).select("source", "ks_d").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w1 == ks)
    // two sources, b = a shifted by exactly 100 chars: corpus is the
    // 50/50 mixture, so each source's W1 vs corpus is delta/2
    val shifted = docs((0L until 40L).map(i => (i, "x", "en", "a", 200L + i)) ++
      (40L until 80L).map(i => (i, "x", "en", "b", 300L + (i - 40))))
    val res = CorpusOps.lengthDriftW1(shifted).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("w1_chars")).toMap
    assert(res("a") == 50.0 && res("b") == 50.0)
  }

  // ---- q300 MMD -----------------------------------------------------------

  test("mmdDrift: identically distributed labels score 0; a mean-shifted label scores ||shift||^2") {
    val mk = (label: Int, base: Float, n: Int) =>
      (0 until n).map(i => (label.toLong * 100 + i, Array.fill(4)(base), label))
    val emb = (mk(0, 0.1f, 5) ++ mk(1, 0.1f, 7) ++ mk(2, 0.3f, 6))
      .toDF("vec_id", "embedding", "label")
    val rows = Quantize.mmdDrift(emb).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b"),
        r.getAs[Double]("mmd2_linear"))).toSeq
    val m = rows.map { case (a, b, v) => (a, b) -> v }.toMap
    assert(m(0, 1) == 0.0)
    // shift of 0.2 in each of 4 dims: ||shift||^2 = 4 * 0.04 = 0.16
    assert(math.abs(m(0, 2) - 0.16) < 1e-4)
    assert(math.abs(m(1, 2) - 0.16) < 1e-4)
  }

  test("mmdDrift: non-negative on the corpus and quadratic kernel sees what it should") {
    val emb = spark.read.parquet(s"${sf("")}/embeddings.parquet")
    val rows = Quantize.mmdDrift(emb).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mmd2_linear") >= 0.0)
      assert(r.getAs[Double]("mmd2_quadratic") >= 0.0)
    }
  }

  // ---- q301 Bradley-Terry -------------------------------------------------

  test("bradleyTerry: a source that wins every duel gets the top strength; masses renormalize") {
    // alternating a/b docs; a always longer -> a wins every a-vs-b duel
    val d = docs((0L until 40L).map { i =>
      if (i % 2 == 0) (i, "x", "en", "alpha", 500L) else (i, "x", "en", "beta", 100L)
    })
    val rows = Modeling.bradleyTerry(d).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("bt_strength")).toMap
    assert(rows("alpha") > rows("beta"))
    assert(rows("beta") == 0.0) // zero wins pins the MM fixed point at 0
    // renormalization: sum of strengths = k (up to the floor per row)
    assert(rows.values.sum <= 2.0 + 1e-9 && rows.values.sum > 2.0 - 2e-6)
  }

  // ---- q302 shared passages -----------------------------------------------

  test("sharedPassages: recovers an inserted passage exactly (positions and length)") {
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val fillerA = (1 to 10).map(i => s"a$i").mkString(" ")
    val fillerB = (1 to 15).map(i => s"b$i").mkString(" ")
    val d = docs(Seq(
      (1L, s"$fillerA $passage", "en", "s", 0L),        // passage at token 10
      (2L, s"$fillerB $passage extra tail", "en", "s", 0L), // at token 15
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10", "en", "s", 0L)))
    val rows = Dedup.sharedPassages(d).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("ida") == 1L && r.getAs[Long]("idb") == 2L)
    assert(r.getAs[Long]("start_a") == 10L && r.getAs[Long]("start_b") == 15L)
    assert(r.getAs[Long]("span_tokens") == 20L)
  }

  test("sharedPassages: a mid-passage edit splits the run into two maximal spans") {
    val left = (1 to 12).map(i => s"w$i").mkString(" ")
    val right = (13 to 24).map(i => s"w$i").mkString(" ")
    val d = docs(Seq(
      (1L, s"$left MID $right", "en", "s", 0L),
      (2L, s"$left XXX $right", "en", "s", 0L)))
    val spans = Dedup.sharedPassages(d).collect().map(_.getAs[Long]("span_tokens")).sorted
    assert(spans.toSeq == Seq(12L, 12L))
  }

  // ---- q303 RBO -----------------------------------------------------------

  test("rboAgreement: identical rankings score the truncated-RBO ceiling, reversed ones score less") {
    // n_chars equals token count -> both rankers identical
    val agree = docs((0L until 15L).map(i =>
      (i, (1 to (i + 1).toInt).map(_ => "w").mkString(" "), "en", "same", i + 1)))
    val r1 = Ranking.rboAgreement(agree).collect()(0)
    // ceiling of the truncated integer form: sum_d floor(9^d*1e9/10^d)/9e9
    val ceiling = (1 to 10).map(d =>
      BigInt(9).pow(d).toLong * 1000000000L / BigInt(10).pow(d).toLong).sum / 9e9
    assert(r1.getAs[Long]("overlap_at_10") == 10L)
    assert(math.abs(r1.getAs[Double]("rbo") - math.rint(ceiling * 1e6) / 1e6) < 1e-6)
    // n_chars inverted vs token count -> rankers disagree
    val disagree = docs((0L until 15L).map(i =>
      (i, (1 to (i + 1).toInt).map(_ => "w").mkString(" "), "en", "rev", 100 - i)))
    val r2 = Ranking.rboAgreement(disagree).collect()(0)
    assert(r2.getAs[Double]("rbo") < r1.getAs[Double]("rbo"))
  }

  // ---- q304 ZCR -----------------------------------------------------------

  test("audioZeroCrossings: matches an independent recomputation of the synthetic PCM") {
    val d = docs(Seq((7L, "x", "en", "s", 1L), (160L, "x", "en", "s", 1L)))
    val got = NonSqlOps.audioZeroCrossings(d).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("crossings"), r.getAs[Long]("zcr_ppm")))
    val want = Seq(7L, 160L).flatMap { id =>
      val n = (800 + id % 800).toInt
      val pcm = Array.tabulate(n)(i => ((i * 7 + id) % 256).toInt)
      pcm.grouped(160).zipWithIndex.filter(_._1.length >= 2).map { case (f, idx) =>
        val cr = f.sliding(2).count(w => (w(0) < 128) != (w(1) < 128)).toLong
        (id, idx.toLong, (f.length - 1).toLong, cr, cr * 1000000L / (f.length - 1))
      }
    }
    assert(got.sortBy(t => (t._1, t._2)).toSeq == want.sortBy(t => (t._1, t._2)))
  }

  // ---- q306 Hopkins -------------------------------------------------------

  test("hopkinsStatistic: tightly clustered data scores far above scattered data") {
    def emb(rows: Seq[(Long, Array[Float], Int)]) = rows.toDF("vec_id", "embedding", "label")
    // two tight clumps in a wide box (the corners anchor the bounding box)
    val clustered = emb((0L until 20L).map(i =>
      (i, Array(if (i < 10) 0.01f else 0.99f, if (i < 10) 0.01f else 0.99f,
        0f, 0f) ++ Array.fill(4)(0f), 0)))
    // a regular lattice over the same box
    val spread = emb((0L until 20L).map { i =>
      val g = i % 5; val h = i / 5
      (i, Array(g * 0.25f, h * 0.33f, 0f, 0f) ++ Array.fill(4)(0f), 0)
    })
    val hc = Clustering.hopkinsStatistic(clustered, m = 30).collect()(0).getAs[Double]("hopkins")
    val hs = Clustering.hopkinsStatistic(spread, m = 30).collect()(0).getAs[Double]("hopkins")
    assert(hc > hs, s"clustered $hc should exceed spread $hs")
    assert(hc > 0.8)
  }

  // ---- q308 silhouette ----------------------------------------------------

  test("silhouetteReport: perfectly separated clumps score s near 1, one smeared cloud scores low") {
    def emb(rows: Seq[(Long, Array[Float], Int)]) = rows.toDF("vec_id", "embedding", "label")
    // k=2 seeds are vec_id 0 and 1 — place them in different clumps
    val separated = emb((0L until 20L).map { i =>
      val c = (i % 2).toFloat
      (i, Array(c, c, 0f, 0f), 0)
    })
    val rows = Clustering.silhouetteReport(separated, k = 2).collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getAs[Long]("mean_s_ppm") > 900000L,
      s"separated clumps should have s close to 1: $r"))
  }

  // ---- q309 CMS join size -------------------------------------------------

  test("selfJoinSizeEstimate: CMS estimate upper-bounds the exact F2 and is tight on few keys") {
    val li = (0L until 300L).map(i => (i % 7)).toDF("l_partkey")
    val r = Sketches.selfJoinSizeEstimate(li).collect()(0)
    val exact = r.getAs[Long]("exact_f2")
    val est = r.getAs[Long]("cms_f2")
    val byKey = (0L until 300L).groupBy(_ % 7).map(_._2.size.toLong)
    assert(exact == byKey.map(c => c * c).sum)
    assert(est >= exact, "CMS inner product must never underestimate")
    // 7 keys in 64 buckets: collisions unlikely across 4 rows -> tight
    assert(est == exact, s"expected a collision-free sketch on 7 keys, got $est vs $exact")
  }

  // ---- q310 sliced W1 -----------------------------------------------------

  test("slicedWasserstein: identical label distributions score 0; a shifted label scores more") {
    def emb(rows: Seq[(Long, Array[Float], Int)]) = rows.toDF("vec_id", "embedding", "label")
    val base = (0 until 16).map(i => Array.tabulate(8)(d => (i % 4) * 0.1f + d * 0.01f))
    val rows = emb(
      base.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) } ++
      base.zipWithIndex.map { case (v, i) => (100L + i, v, 1) } ++
      // shift a single dimension so every ±1 slice sees the transport
      base.zipWithIndex.map { case (v, i) =>
        (200L + i, v.updated(0, v(0) + 0.4f), 2) })
    val m = Quantize.slicedWasserstein(rows, dims = 8).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) -> r.getAs[Double]("sw1_bins"))
      .toMap
    assert(m(0, 1) == 0.0)
    assert(m(0, 2) > 0.0 && m(1, 2) > 0.0)
  }

  // ---- q311 image histogram -----------------------------------------------

  test("grayHistogram: real decode reproduces the closed-form raster histogram") {
    val w = 12; val h = 9; val seed = 5L
    val png = MediaCodec.encodePng(w, h,
      (x, y) => ((x * 31 + y * 17 + seed * 7) % 256).toInt)
    val (np, hist) = MediaCodec.grayHistogram(png, 8)
    assert(np == w.toLong * h)
    val want = new Array[Long](8)
    for (y <- 0 until h; x <- 0 until w)
      want(((x * 31 + y * 17 + seed * 7) % 256).toInt / 32) += 1L
    assert(hist.toSeq == want.toSeq)
  }

  test("imageHistSimilarity: all 29x28/2 class pairs present, sims in [0, 1e6]") {
    val d = docs((0L until 60L).map(i => (i, "x", "en", "s", 1L)))
    val rows = NonSqlOps.imageHistSimilarity(d).collect()
    assert(rows.length == 29 * 28 / 2)
    rows.foreach { r =>
      val s = r.getAs[Long]("sim_ppm")
      assert(s >= 0L && s <= 1000000L)
    }
  }

  // ---- q312 ORC round-trip ------------------------------------------------

  test("orcRoundTrip: aggregates through ORC equal the same aggregates straight off the frame") {
    val d = spark.read.parquet(s"${sf("")}/documents.parquet")
    val viaOrc = Validation.orcRoundTrip(d, "target/test_orc_roundtrip").collect().toSeq
    val direct = d.groupBy("source").agg(
        count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        sum(conv(substring(md5(concat(lit("orc|"), col("text"))), 1, 15), 16, 10)
          .cast("long") % 1000000000L).as("text_sig"))
      .orderBy("source").collect().toSeq
    assert(viaOrc == direct)
  }

  // ---- q313 apportionment -------------------------------------------------

  test("hamiltonApportionment: allocations sum exactly to the budget; remainder order breaks the tie") {
    // three equal sources: 100 = 34 + 33 + 33, the +1 going to the
    // lexicographically first source (equal remainders)
    val d = docs(Seq(
      (1L, "a b c", "en", "s1", 5L),
      (2L, "a b c", "en", "s2", 5L),
      (3L, "a b c", "en", "s3", 5L)))
    val r = CorpusOps.hamiltonApportionment(d, budget = 100L).collect()
    assert(r.map(_.getAs[Long]("alloc")).sum == 100L)
    val byS = r.map(x => x.getString(0) -> x.getAs[Long]("alloc")).toMap
    assert(byS("s1") == 34L && byS("s2") == 33L && byS("s3") == 33L)
    // corpus invariant: Σ alloc == budget exactly
    val corpus = spark.read.parquet(s"${sf("")}/documents.parquet")
    val tot = CorpusOps.hamiltonApportionment(corpus).collect().map(_.getAs[Long]("alloc")).sum
    assert(tot == 100000L)
  }

  // ---- q305 margin mining -------------------------------------------------

  test("marginMining: hub pairs rank below exclusive pairs with the same raw similarity") {
    // label 0: q1 aligns only with t1; q2 is similar to a hub t2 that is
    // also similar to q3/q4 -> the exclusive pair must out-margin the hub
    def v(x: Float, y: Float) = Array(x, y, 0f, 0f)
    val emb = Seq(
      (1L, v(1f, 0f), 0), (2L, v(0.8f, 0.6f), 0), (3L, v(0.75f, 0.65f), 0),
      (4L, v(0.7f, 0.7f), 0),
      (10L, v(1f, 0f), 1),       // exclusive partner of q1
      (20L, v(0.75f, 0.66f), 1)  // hub: close to q2, q3, q4
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.marginMining(emb, k = 2, topN = 10).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("margin_ppm"))
      .toMap
    assert(rows((1L, 10L)) > rows((2L, 20L)))
    assert(rows((1L, 10L)) > rows((3L, 20L)))
  }
}
