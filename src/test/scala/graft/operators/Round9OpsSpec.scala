package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture and property tests for the round-9 additions q333–q337:
  * Poisson bootstrap, Dawid–Skene, confident learning, embedding
  * isotropy, McNemar.
  *
  * Text gadgets used to steer the q329 classifier pair (A = stopword
  * argmax, B = e-rate ≥ 7.5%):
  *   "the a and"            → A=1, B=1  (e/len = 1/9)
  *   "the a and xxxxxxxxxx" → A=1, B=0  (e/len = 1/20)
  *   "zz yy xx"             → A=0, B=0
  *   "zz ee ee"             → A=0, B=1  (e/len = 4/8)
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, text, lang) => (id, text, lang, "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- q333 Poisson bootstrap ----------------------------------------------

  test("poissonBootstrap: constant-length source collapses the CI to the mean") {
    val d = docs((1L to 50L).map(i => (i, "t", "en")))
      .withColumn("n_chars", lit(100L))
    val r = RoundNineOps.poissonBootstrap(d).collect()(0)
    assert(r.getAs[Long]("mean_micro") == 100000000L)
    assert(r.getAs[Long]("lo_micro") == 100000000L)
    assert(r.getAs[Long]("hi_micro") == 100000000L)
    assert(r.getAs[Long]("n_reps") == 32L)
  }

  test("poissonBootstrap: corpus CI brackets are ordered and weights behave") {
    val d = spark.read.parquet(s"${sf("")}/documents.parquet")
    val rows = RoundNineOps.poissonBootstrap(d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, m) = (r.getAs[Long]("lo_micro"), r.getAs[Long]("hi_micro"),
        r.getAs[Long]("mean_micro"))
      assert(lo <= hi)
      // Poisson(1) replicate means concentrate near the point estimate:
      // a 2nd-of-32 rank bound more than 50% off means broken weights
      assert(math.abs(m - lo) < m / 2 && math.abs(hi - m) < m / 2)
    }
  }

  // ---- q334 Dawid-Skene ----------------------------------------------------

  test("dawidSkene: perfect raters earn se = sp = 1 and the true prevalence") {
    val d = docs((1L to 10L).map(i => (i, "the a and", "en")) ++
      (11L to 20L).map(i => (i, "zz yy xx", "de")))
    val out = RoundNineOps.dawidSkene(d).collect()
      .map(r => r.getAs[String]("rater") -> r).toMap
    Seq("a_label", "b_stopword", "c_erate").foreach { r =>
      assert(out(r).getAs[Long]("se_micro") == 1000000L, s"$r sensitivity")
      assert(out(r).getAs[Long]("sp_micro") == 1000000L, s"$r specificity")
    }
    assert(out("a_label").getAs[Long]("pi_micro") == 500000L)
    assert(out("a_label").getAs[Long]("n_docs") == 20L)
  }

  test("dawidSkene: a rater that misses half the positives scores lower se") {
    // e-rate rater fires on only half the en docs; label+stopword perfect
    val d = docs((1L to 10L).map(i => (i, "the a and", "en")) ++
      (11L to 20L).map(i => (i, "the a and xxxxxxxxxx", "en")) ++
      (21L to 40L).map(i => (i, "zz yy xx", "de")))
    val out = RoundNineOps.dawidSkene(d).collect()
      .map(r => r.getAs[String]("rater") -> r).toMap
    assert(out("a_label").getAs[Long]("se_micro") == 1000000L)
    assert(out("b_stopword").getAs[Long]("se_micro") == 1000000L)
    val seC = out("c_erate").getAs[Long]("se_micro")
    assert(seC < 600000L && seC > 300000L, s"half-blind rater se: $seC")
    assert(out("c_erate").getAs[Long]("sp_micro") == 1000000L)
  }

  // ---- q335 confident learning ---------------------------------------------

  test("confidentLearning: clean labels read ~zero noise, one flip reads > 0") {
    val clean = docs((1L to 10L).map(i => (i, "zz ee ee", "en")) ++
      (11L to 20L).map(i => (i, "zz yy xx", "de")))
    val r0 = RoundNineOps.confidentLearning(clean).collect()(0)
    assert(r0.getAs[Long]("c10") == 0L && r0.getAs[Long]("c01") == 0L)
    assert(r0.getAs[Long]("noise_ppm") == 0L)
    // flip one high-e doc's label to de: it clears the en threshold
    val flipped = docs((1L to 10L).map(i => (i, "zz ee ee", "en")) ++
      Seq((99L, "zz ee ee", "de")) ++
      (11L to 20L).map(i => (i, "zz yy xx", "de")))
    val r1 = RoundNineOps.confidentLearning(flipped).collect()(0)
    assert(r1.getAs[Long]("c01") >= 1L, "the flipped doc lands off-diagonal")
    assert(r1.getAs[Long]("noise_ppm") > 0L)
  }

  // ---- q336 embedding isotropy ---------------------------------------------

  private def vecs(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("embeddingIsotropy: identical vectors ratio 1, orthogonal vectors ratio 0") {
    val d = vecs(Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0),          // collapsed
      (3L, Seq(1f, 0f), 1), (4L, Seq(0f, 1f), 1)))          // orthogonal
    val out = RoundNineOps.embeddingIsotropy(d).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(out(0).getAs[Double]("isotropy_ratio") == 1.0)
    assert(out(0).getAs[Double]("avg_pair_dot") == out(0).getAs[Double]("avg_self_dot"))
    assert(out(1).getAs[Double]("isotropy_ratio") == 0.0)
    assert(out(1).getAs[Double]("avg_pair_dot") == 0.0)
    assert(out(1).getAs[Double]("avg_self_dot") == 1.0)
  }

  // ---- q337 McNemar --------------------------------------------------------

  test("mcnemarTest: hand-counted discordant pairs and the corrected statistic") {
    // en docs: 3 where A right / B wrong, 1 where A wrong / B right
    val d = docs(Seq(
      (1L, "the a and xxxxxxxxxx", "en"), (2L, "the a and xxxxxxxxxx", "en"),
      (3L, "the a and xxxxxxxxxx", "en"), (4L, "zz ee ee", "en")))
    val row = Modeling.mcnemarTest(d).collect()(0)
    assert(row.getAs[Long]("b") == 3L)
    assert(row.getAs[Long]("c") == 1L)
    assert(row.getAs[Double]("mcnemar_chi2") == 0.25)
  }
}
