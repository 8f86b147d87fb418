package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f), "same"),
      (Seq(1f, 0f), Seq(0f, 1f), "orth"),
      (Seq(1f, 0f), Seq(-1f, 0f), "opp"),
    ).toDF("a", "b", "label")
    val got = df.select(col("label"), Similarity.cosine(col("a"), col("b")).as("c"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("same") - 1.0) < 1e-12)
    assert(math.abs(got("orth")) < 1e-12)
    assert(math.abs(got("opp") + 1.0) < 1e-12)
  }

  test("cosineTopK ranks the most similar vectors first and excludes the query") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f), 0),
      (1L, Seq(1f, 0.1f, 0f), 0),   // closest
      (2L, Seq(0f, 1f, 0f), 0),
      (3L, Seq(0.9f, 0.5f, 0f), 0), // second
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.cosineTopK(emb, 0L, 2).select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L))
  }

  test("knnJoin returns each query's top-k, matching per-query cosineTopK") {
    val emb = graft.Tables(spark, sf("")).embeddings
    val queries = emb.filter(col("vec_id").isin(0L, 7L, 13L))
    val got = Similarity.knnJoin(queries, emb, k = 4)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._2).map(_._3).toSeq }
    Seq(0L, 7L, 13L).foreach { q =>
      val single = Similarity.cosineTopK(emb, queryId = q, k = 4)
        .select("vec_id").as[Long].collect().toSeq
      assert(got(q) == single, s"query $q")
    }
    // every query contributes exactly k rows
    assert(got.values.forall(_.length == 4))
  }

  test("knnJoin with a separate query table keeps id-colliding corpus rows") {
    val emb = graft.Tables(spark, sf("")).embeddings
    // external queries with their own id space that collides with corpus ids
    val external = emb.filter(col("vec_id") === 42L)
      .select(lit(7L).as("vec_id"), col("embedding"))
    val withExclusion = Similarity.knnJoin(external, emb, k = 3)
      .select("vec_id").as[Long].collect().toSet
    val noExclusion = Similarity.knnJoin(external, emb, k = 3, excludeSelfId = false)
      .select("vec_id").as[Long].collect().toSet
    // vec 42 is its own nearest neighbor; id-7 exclusion must not apply
    assert(noExclusion.contains(42L))
    assert(!withExclusion.contains(7L)) // the documented same-corpus semantics
  }

  test("blockedSimilarPairs only compares within the same label block") {
    val emb = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(1f, 0.01f), 0),
      (3L, Seq(1f, 0f), 1), // same direction but different block → never paired
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.blockedSimilarPairs(emb, 0.9)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("SrpBandKeys matches the composed vecDot-sign formulation") {
    val planes = graft.functions.SrpBandKeys.planes(16, 64)
    val emb = graft.Tables(spark, sf("")).embeddings
    val kernel = emb.select(col("vec_id"),
      graft.functions.SrpBandKeys.srpBandKeys(col("embedding"), planes, 4).as("keys"))
    // reference: one vecDot per plane, bits packed 4 per band
    val bandCols = (0 until 4).map { band =>
      (0 until 4).map { jj =>
        val j = band * 4 + jj
        when(graft.functions.VecOps.vecDot(col("embedding"),
          typedlit(planes(j).toSeq)) >= 0d, lit(1L << jj)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val composed = emb.select(col("vec_id"), array(bandCols: _*).as("keys"))
    assert(kernel.as[(Long, Seq[Long])].collect().toMap ==
      composed.as[(Long, Seq[Long])].collect().toMap)
  }

  test("srp planes are deterministic ±1 and plan size is independent of band count") {
    val p1 = graft.functions.SrpBandKeys.planes(8, 16)
    val p2 = graft.functions.SrpBandKeys.planes(8, 16)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(v => v == 1.0f || v == -1.0f))
    val emb = graft.Tables(spark, sf("")).embeddings
    def planLen(bands: Int): Int = emb.select(
      graft.functions.SrpBandKeys.srpBandKeys(col("embedding"),
        graft.functions.SrpBandKeys.planes(bands * 8, 64), 8).as("k"))
      .queryExecution.optimizedPlan.toString.length
    // the plane matrix rides a reference object, not the expression tree
    assert(math.abs(planLen(32) - planLen(2)) < 64)
  }

  test("srpNearDupClusterReport merges double-planted vectors into 3-member clusters") {
    val emb = graft.Tables(spark, sf("")).embeddings
    val got = Similarity.srpNearDupClusterReport(emb)
      .as[(Long, Long, String)].collect()
    val nVecs = emb.count()
    // every 20th vector carries two plants -> 3-member component (the
    // copies connect through the base vector); other 10th vectors pair
    assert(got.length == (nVecs / 10).toInt)
    got.foreach { case (cid, n, members) =>
      val expected =
        if (cid % 20 == 0) Seq(cid, cid + 10000000L, cid + 20000000L)
        else Seq(cid, cid + 10000000L)
      assert(n == expected.length && members == expected.mkString(","), s"cluster $cid")
    }
  }

  test("srpNearDupPairs recovers planted near-duplicates and nothing else") {
    val emb = graft.Tables(spark, sf("")).embeddings
    val planted = emb.select((col("vec_id") + 10000000L).as("vec_id"),
      transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.1f)).otherwise(x))
        .as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(planted)
    val got = Similarity.srpNearDupPairs(corpus)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val nVecs = emb.count()
    val expected = (0L until nVecs).map(i => (i, i + 10000000L)).toSet
    // every planted pair is a candidate in SOME band at cos≈0.995 and
    // survives the exact verify; random pairs (cos ≤ ~0.55) never pass
    assert(got == expected)
  }

  test("hardNegatives mines only label-mismatched neighbors, matching a brute-force filter") {
    val emb = graft.Tables(spark, sf("")).embeddings
    val got = Similarity.hardNegativeReport(emb)
      .select("query_id", "query_label", "vec_id", "neg_label", "rank")
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, ql, _, nl, _) => assert(ql != nl) }
    // per query: exactly the label-filtered head of the full knn ranking
    val queries = emb.filter(col("vec_id") % 97 === 0 && col("vec_id") <= 9700)
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val full = Similarity.knnJoin(queries, emb, k = Int.MaxValue, excludeSelfId = false)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    val expected = full.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.map(_._2).filter(v => labels(v) != labels(qid)).take(5).map(qid -> _)
    }.toSet
    assert(got.map(r => (r._1, r._3)).toSet == expected)
  }

  test("knnLabelPurity counts integer hits consistent with hardNegatives' complement") {
    val emb = graft.Tables(spark, sf("")).embeddings
    val purity = Similarity.knnLabelPurity(emb)
      .select("label", "n_probes", "n_hits", "purity")
      .as[(Int, Long, Long, Double)].collect()
    assert(purity.nonEmpty)
    purity.foreach { case (_, nProbes, hits, p) =>
      assert(hits >= 0 && hits <= nProbes * 5)
      // p is round(·, 4) in the query
      assert(math.abs(p - hits.toDouble / (nProbes * 5)) < 1e-4)
    }
    // cross-check per-probe hits against the full knn ranking
    val probes = emb.filter(col("vec_id") % 97 === 0 && col("vec_id") <= 9700)
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val knn = Similarity.knnJoin(probes, emb, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    val expectedHits = knn.groupBy(r => labels(r._1))
      .view.mapValues(_.count(r => labels(r._2) == labels(r._1)).toLong).toMap
    purity.foreach { case (label, _, hits, _) =>
      assert(hits == expectedHits.getOrElse(label, 0L), s"label $label")
    }
  }

  test("labelCentroidConfusion matches a driver-side brute-force centroid cosine") {
    val emb = graft.Tables(spark, sf("")).embeddings
    val vecs = emb.select("label", "embedding").as[(Int, Array[Float])].collect()
    val cents = vecs.groupBy(_._1).map { case (l, vs) =>
      val dim = vs.head._2.length
      val mu = Array.tabulate(dim)(d => vs.map(_._2(d).toDouble).sum / vs.length)
      l -> mu
    }
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = Similarity.labelCentroidConfusion(emb)
      .select("label_a", "label_b", "centroid_cos")
      .as[(Int, Int, Double)].collect()
    assert(got.length == cents.size * (cents.size - 1) / 2)
    got.foreach { case (a, b, c) =>
      assert(a < b)
      assert(math.abs(c - cos(cents(a), cents(b))) < 1e-4, s"pair ($a,$b)")
    }
  }

  test("densityOutliers: planted lonely vector ranks first with the lowest mean kNN cosine") {
    // probes are vec_id % 7 == 0: ids 0 and 7. id 0 points AWAY from the
    // cluster every other vector sits in.
    val emb = (Seq((0L, Seq(-1f, 0f), 9)) ++
      (1L to 7L).map(i => (i, Seq(1f, i.toFloat / 100), 0))
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.densityOutliers(emb, k = 5, bottomN = 20)
      .as[(Long, Int, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 7L)) // loneliest first
    assert(got(0)._2 == 9 && got(0)._3 < 0.0)  // anti-aligned neighborhood
    assert(got(1)._3 > 0.99)                   // dense cluster member
    // a probe with fewer than k possible neighbors is dropped, not mis-averaged
    val tiny = (0L to 3L).map(i => (i, Seq(1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    assert(Similarity.densityOutliers(tiny, k = 5).count() == 0)
  }

  test("classBalance: hand-computed shares and entropy; degenerate single class is 0.0") {
    val emb = Seq((0L, Seq(1f), 0), (1L, Seq(1f), 1), (2L, Seq(1f), 2), (3L, Seq(1f), 2))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.classBalance(emb)
      .as[(Long, Long, Double, Double, Double, Double, Double)].collect().head
    // counts (1,1,2): H = 2·0.25·ln4 + 0.5·ln2 = 1.0397; H/ln3 = 0.9464
    assert(r == ((4L, 3L, 0.5, 0.25, 2.0, 1.0397, 0.9464)))
    val mono = Seq((0L, Seq(1f), 7), (1L, Seq(1f), 7)).toDF("vec_id", "embedding", "label")
    val m = Similarity.classBalance(mono)
      .as[(Long, Long, Double, Double, Double, Double, Double)].collect().head
    // entropy must be +0.0, not -0.0, and the k=1 norm guard must hold
    assert(m == ((2L, 1L, 1.0, 1.0, 1.0, 0.0, 0.0)))
    assert(1.0 / m._6 > 0, "entropy folded to -0.0")
  }

  test("clusterLabelAgreement: perfect sign-separated clustering scores ari=nmi=1") {
    val emb = (0 until 8).map { i =>
      val lbl = i % 2
      (i.toLong, Seq(if (lbl == 0) -1f else 1f, 0.5f, -0.5f, 0.1f), lbl)
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.clusterLabelAgreement(emb, signBits = 1).collect().head
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.0, s"ari=${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"nmi=${r.getDouble(4)}")
  }

  test("clusterLabelAgreement: label-blind buckets score far below perfect") {
    // bucket (sign of dim 0) independent of label: each (bucket,label)
    // cell gets exactly 2 of the 8 vectors
    val emb = (0 until 8).map { i =>
      (i.toLong, Seq(if (i < 4) -1f else 1f, 0f, 0f, 0f), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.clusterLabelAgreement(emb, signBits = 1).collect().head
    assert(r.getDouble(3) < 0.5, s"ari should be near zero: ${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.0, s"nmi of independent split is 0: ${r.getDouble(4)}")
  }

  test("mmrRerank diversifies: pick 3 jumps clusters instead of taking a duplicate") {
    // query dir [1,0,0,0]; cluster A = {1, 2} (identical), cluster B = {3};
    // both clusters at cos 0.8 from the query, cross-cluster cos 0.28.
    // Plain top-k order would be 0,1,2(dup),3 — MMR(λ=0.7) picks 0,1,3.
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.8f, 0.6f, 0f, 0f), 1),
      (2L, Seq(0.8f, 0.6f, 0f, 0f), 1),
      (3L, Seq(0.8f, -0.6f, 0f, 0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.mmrRerank(emb, poolK = 4, picks = 3)
      .select("pick", "vec_id", "rel_micro", "max_sim_micro", "mmr_score_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 1000000L, 0L, 7000000L),
      (2L, 1L, 800000L, 800000L, 3200000L),  // near-tie with 3 broken by rel
      // -0.6f widens to -0.60000002… → floor quantizes id 3 one micro-unit
      // low (799999); the dup (id 2) scores 7·800000 − 3·10⁶ = 2600000
      (3L, 3L, 799999L, 799999L, 3199996L)))
  }

  test("mmrRerank first pick is the pure-relevance argmax") {
    val emb = Seq(
      (0L, Seq(1f, 0f), 0),
      (5L, Seq(0.6f, 0.8f), 1),
      (9L, Seq(0.9435f, 0.33f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.mmrRerank(emb, poolK = 3, picks = 2)
      .select("pick", "vec_id").as[(Long, Long)].collect().toSeq
    assert(got.head == (1L, 0L)) // the query-direction vector itself
  }
}
