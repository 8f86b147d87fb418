package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantize bounds values to int8 and preserves scale") {
    val emb = graft.Tables(spark, sf("")).embeddings.limit(100)
    val q = Quantize.quantize(emb)
    val bad = q.select(explode(col("q_vec")).as("v")).filter(abs(col("v")) > 127).count()
    assert(bad == 0)
    assert(q.filter(col("q_scale") <= 0).count() == 0)
  }

  test("dequantized cosine approximates exact cosine within 2%") {
    val emb = graft.Tables(spark, sf("")).embeddings.limit(50)
    val q = Quantize.quantize(emb)
    val a = q.as("a")
    val b = q.as("b")
    val pairs = a.join(b, col("a.vec_id") + 1 === col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("exact"),
        Quantize.quantizedCosine(col("a.q_vec"), col("a.q_scale"),
                                 col("b.q_vec"), col("b.q_scale")).as("approx"))
    val maxErr = pairs.select(max(abs(col("exact") - col("approx")))).head().getDouble(0)
    assert(maxErr < 0.02, s"max quantization error $maxErr")
  }

  test("standardizedStats: z-scores recenter every dimension; sigma=0 dims yield z=0") {
    // after z-scoring, each dim has mean ~0 and variance ~1, so the
    // MEAN of per-vector z_l2^2 values equals n_dims exactly (the sum
    // over dims of per-dim variances)
    val emb = graft.Tables(spark, sf("")).embeddings
    val stats = Quantize.standardizedStats(emb)
    val n = emb.count().toDouble
    val dims = stats.select(max("n_dims")).head().getLong(0)
    val meanSq = stats.select(avg(pow(col("z_l2"), 2))).head().getDouble(0)
    assert(math.abs(meanSq - dims) < 0.05 * dims, s"mean z_l2^2 = $meanSq, dims = $dims")
    // constant dimension: every vector's z for that dim is 0, not NaN
    val const = Seq(
      (1L, Array(1.0f, 5.0f)), (2L, Array(2.0f, 5.0f)), (3L, Array(3.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val r = Quantize.standardizedStats(const)
      .select("vec_id", "z_l2", "max_z", "min_z")
      .as[(Long, Double, Double, Double)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    r.values.foreach { case (zl2, mx, mn) =>
      assert(!zl2.isNaN && !mx.isNaN && !mn.isNaN)
    }
    // dim-2 contributes nothing: vector 2 sits at dim-1's mean, so its
    // entire z-vector is 0
    assert(Quantize.standardizedStats(const)
      .filter(col("vec_id") === 2).select("z_l2").as[Double].head() == 0.0)
  }
  test("embeddingDimHealth: hand-computed per-dimension moments and dead rate") {
    // dim0: values 1.0, 3.0 -> mean 2, var 1, never zero
    // dim1: values 0.0, 0.0 -> dead
    // dim2: values -0.5, 0.5 -> mean 0 (floor: -500000 + 500000), var 0.25
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f, -0.5f)),
      (2L, Seq(3.0f, 0.0f, 0.5f))).toDF("vec_id", "embedding")
    val got = Quantize.embeddingDimHealth(rows)
      .as[(Int, Long, Double, Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0, 2L, 2.0, 1.0, 1.0, 3.0, 0.0),
      (1, 2L, 0.0, 0.0, 0.0, 0.0, 1.0),
      (2, 2L, 0.0, 0.25, -0.5, 0.5, 0.0)))
  }

  test("embeddingCovariance matches a hand-computed 2-dim case") {
    // vectors (1,0) and (0,1): mean (.5,.5), var .25 each,
    // cov(0,1) = E[xy] - mx*my = 0 - 0.25 = -0.25
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Quantize.embeddingCovariance(emb).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r((0, 0)) == ((2L, 0.5, 0.25)))
    assert(r((1, 1)) == ((2L, 0.5, 0.25)))
    assert(r((0, 1)) == ((2L, 0.0, -0.25)))
    assert(r.size == 3)
  }

  test("topEigenpair power iteration finds the dominant eigenpair") {
    // cov [[2,1],[1,2]] -> eigenvalues 3 and 1; top vector (1,1)/sqrt(2)
    val cov = Seq((0, 0, 2.0), (0, 1, 1.0), (1, 1, 2.0)).toDF("di", "dj", "cov")
    val (lambda, ratio, v) = Quantize.topEigenpair(cov)
    assert(math.abs(lambda - 3.0) < 1e-9, s"lambda=$lambda")
    assert(math.abs(ratio - 0.75) < 1e-9, s"ratio=$ratio") // 3 / trace(4)
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(v(0) - v(1)) < 1e-9, "eigenvector should be symmetric")
  }

  test("embeddingCovariance diagonal agrees with q157 dim-health variance") {
    val emb = graft.Tables(spark, sf("")).embeddings
    val covDiag = Quantize.embeddingCovariance(emb)
      .filter(col("di") === col("dj")).filter(col("di") < 3)
      .collect().map(x => x.getInt(0) -> x.getDouble(4)).toMap
    val health = Quantize.embeddingDimHealth(emb)
      .filter(col("dim") < 3)
      .collect().map(x => x.getInt(0) -> x.getDouble(3)).toMap
    // different integer scalings (1e4 vs 1e6) -> compare loosely
    covDiag.foreach { case (d, c) =>
      assert(math.abs(c - health(d)) < 1e-3, s"dim $d: cov=$c health=${health(d)}")
    }
  }

  test("jlDistortion matches an independent JVM derivation on crafted vectors") {
    import spark.implicits._
    // three consecutive vectors → two pairs; values exact in micro-units
    val vecs = Seq(
      (1L, Seq.tabulate(64)(d => (d % 7 - 3) * 0.01f), 0),
      (2L, Seq.tabulate(64)(d => (d % 5 - 2) * 0.02f), 0),
      (3L, Seq.tabulate(64)(d => (d % 3 - 1) * 0.03f), 0),
    )
    val df = vecs.toDF("vec_id", "embedding", "label")
    // JVM mirror of the operator's integer pipeline
    def q(x: Float): Long = math.floor(x.toDouble * 1000000).toLong
    val expected = vecs.sliding(2).map { case Seq((_, a, _), (_, b, _)) =>
      val dv = a.zip(b).map { case (x, y) => q(x) - q(y) }
      val projSq = BigInt(0) + (0 until 16).map { p =>
        val pv = dv.indices.map(d => Quantize.jlSign(d, p) * dv(d)).sum
        BigInt(pv) * pv
      }.sum
      val origSq = dv.map(x => x * x).sum
      (projSq * 1000000 / (16 * BigInt(origSq))).toLong
    }.toSeq
    val r = Quantize.jlDistortion(df).collect()(0)
    assert(r.getAs[Long]("n_pairs") == 2)
    assert(r.getAs[Long]("min_ratio_ppm") == expected.min)
    assert(r.getAs[Long]("max_ratio_ppm") == expected.max)
    assert(r.getAs[Long]("mean_ratio_ppm") == expected.sum / 2)
  }

  test("jlDistortion on the corpus: ratios concentrate around 1") {
    val emb = spark.read.parquet(sf("") + "/embeddings.parquet")
    val r = Quantize.jlDistortion(emb).collect()(0)
    assert(r.getAs[Long]("n_pairs") > 100)
    val mean = r.getAs[Long]("mean_ratio_ppm")
    assert(mean > 600000 && mean < 1500000, s"mean ratio $mean ppm off the JL expectation")
    assert(r.getAs[Long]("n_within_30pct") * 2 > r.getAs[Long]("n_pairs"),
      "fewer than half the pairs within ±30%")
  }
}
