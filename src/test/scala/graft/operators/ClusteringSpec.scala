package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny 1-d corpus with hand-checkable geometry: two obvious balls
    * around 0.0 and 0.1, seeded with k=2 from vec_ids 0 and 1.
    */
  private def toy = Seq(
    (0L, Array(0.00f), 0),  // seed c0
    (1L, Array(0.10f), 1),  // seed c1
    (2L, Array(0.01f), 0),
    (3L, Array(0.09f), 1),
    (4L, Array(0.02f), 1),  // geometric c0, label says 1 → impure
    (5L, Array(0.11f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("quantized is a non-negative fixed-point embedding") {
    val u = Clustering.quantized(toy).orderBy("vec_id")
      .select("u").as[Seq[Long]].collect()
    assert(u(0) == Seq(1000000L))            // floor(0.0·1e6)+1e6
    assert(u(1) == Seq(1100000L) || u(1) == Seq(1099999L)) // float32 0.1 is ~0.1±ulp
    assert(u.flatten.forall(_ >= 0L))
  }

  test("kmeansAssign separates the two balls and tie-breaks by centroid id") {
    val a = Clustering.kmeansAssign(toy, k = 2, iters = 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(Set(a(0L), a(2L), a(4L)) == Set(0L))
    assert(Set(a(1L), a(3L), a(5L)) == Set(1L))
  }

  test("kmeansReport: sizes, integer inertia, majority label with asc tie-break") {
    val r = Clustering.kmeansReport(toy, k = 2).collect()
    val byCluster = r.map(row => row.getLong(0) -> row).toMap
    assert(byCluster(0L).getLong(1) == 3)               // n_points
    // cluster 0 labels: {0,0,1} → majority 0, purity 2/3
    assert(byCluster(0L).getInt(3) == 0)
    assert(byCluster(0L).getDouble(4) == 0.6667)
    // cluster 1 labels: {1,1,1} → purity 1
    assert(byCluster(1L).getInt(3) == 1)
    assert(byCluster(1L).getDouble(4) == 1.0)
    // inertia is exact: recompute from the assignment. Reported in WHOLE
    // squared units (micro-units² div 10¹² — the round-10 int64-headroom
    // re-unit; ScaleHeadroomSpec pins the decimal sum path itself)
    val a = Clustering.kmeansAssign(toy, 2, 2)
    val inertia = a.groupBy("cid").agg(sum("dist")).as[(Long, Long)].collect().toMap
    assert(byCluster(0L).getLong(2) == inertia(0L) / 1000000000000L)
  }

  test("semDedupReport drops the higher id of every in-threshold pair") {
    // distances in quantized units²: (0,2): 10000² = 1e8 ≤ threshold →
    // vec 2 dropped; every cross-ball pair is assigned apart. Within
    // cluster 0, (0,4) is 20000²=4e8 ≤ 1.35e12 → 4 dropped too; within
    // cluster 1 all pairwise ≤ 20000² → 3 and 5 dropped (1 kept).
    val r = Clustering.semDedupReport(toy, k = 2).collect()
      .map(row => row.getLong(0) -> (row.getLong(2), row.getLong(3))).toMap
    assert(r(0L) == (2L, 1L)) // dropped 2 and 4, kept seed 0
    assert(r(1L) == (2L, 1L)) // dropped 3 and 5, kept seed 1
  }

  test("plan contract: assignment broadcasts the centroids, not the corpus") {
    // assert on the assignment subplan — the report checkpoints it, so
    // the report's own executed plan starts from the materialized RDD
    val emb = spark.read.parquet(sf("") + "/embeddings.parquet")
    val plan = Clustering.kmeansAssign(emb).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast assignment join in:\n$plan")
  }

  test("empty clusters vanish consistently (k larger than distinct balls)") {
    // k=4 seeds from ids 0..3; after one update, assignment still only
    // lands on surviving centroids — no nulls, no phantom clusters
    val a = Clustering.kmeansAssign(toy, k = 4, iters = 2)
    assert(a.count() == 6)
    assert(a.select("cid").distinct().count() <= 4)
  }

  /** q240: exact duplicates of the query encode to the query's own
    * nearest codeword in every subspace, so their ADC score is the
    * GLOBAL minimum Σⱼ minᵢ td(j,i) — they must lead the ranking (tied,
    * vec_id ascending) with exact_dist 0.
    */
  test("pqTopK ranks exact duplicates of the query first with exact_dist 0") {
    val dim = 8
    def v(base: Float) = Array.tabulate(dim)(i => base + i * 0.01f)
    val emb = Seq(
      (0L, v(0.0f), 0),  // query (min vec_id)
      (1L, v(0.0f), 0),  // duplicate of query
      (2L, v(0.0f), 0),  // duplicate of query
      (3L, v(0.5f), 1),
      (4L, v(0.52f), 1),
      (5L, v(0.9f), 2),
      (6L, v(0.88f), 2),
      (7L, v(0.3f), 1),
    ).toDF("vec_id", "embedding", "label")
    val res = Clustering.pqTopK(emb, m = 4, k = 4, topN = 7).collect()
    assert(res.length == 7 && !res.map(_.getLong(0)).contains(0L))
    assert(res(0).getLong(0) == 1L && res(1).getLong(0) == 2L, res.mkString(","))
    assert(res(0).getLong(2) == 0L && res(1).getLong(2) == 0L)
    assert(res(0).getLong(1) == res(1).getLong(1)) // tied ADC scores
  }

  // two well-separated groups in 4-D: even ids near the origin, odd ids
  // near (10, 10+, …) — coarse seeds 0/1 land one per group
  private def twoClusters = (0 until 8).map { i =>
    val base = if (i % 2 == 0) 0.0f else 10.0f
    (i.toLong, Array(base + i * 0.01f, base + i * 0.02f,
      base - i * 0.01f, base + 0.03f * i), i % 2)
  }.toDF("vec_id", "embedding", "label")

  test("ivfPqRecall is EXACT when codebook size = corpus (identity codes, residual cancels)") {
    // kpq = n → every vector its own code, ADC distance = |r_v − r_q|²
    // = |v − q|² inside a shared cell; nprobe = kc probes everything
    val r = Clustering.ivfPqRecall(twoClusters, kc = 2, m = 2, kpq = 8,
      topK = 3, nprobe = 2, nQueries = 3).collect()
    assert(r.length == 3)
    assert(r.forall(_.getAs[Double]("recall") == 1.0), r.mkString(","))
  }

  test("dbscanReport: two blobs, one border, one noise — classic semantics") {
    // blob A (ids 0-4) all-core; id 5 reaches exactly one A point → border;
    // blob B (ids 6-10) all-core; id 11 isolated → noise. eps=9000 (0.009).
    val pts = Seq(
      (0L, Array(0.000f, 0.000f)), (1L, Array(0.002f, 0.000f)),
      (2L, Array(0.000f, 0.002f)), (3L, Array(0.002f, 0.002f)),
      (4L, Array(0.004f, 0.000f)), (5L, Array(0.012f, 0.000f)),
      (6L, Array(0.500f, 0.500f)), (7L, Array(0.502f, 0.500f)),
      (8L, Array(0.500f, 0.502f)), (9L, Array(0.502f, 0.502f)),
      (10L, Array(0.504f, 0.500f)), (11L, Array(-0.500f, -0.500f)))
      .map { case (i, e) => (i, e, 0) }.toDF("vec_id", "embedding", "label")
    val r = Clustering.dbscanReport(pts).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((-1L, 0L, 0L, 1L), (0L, 5L, 1L, 6L), (6L, 5L, 0L, 5L)), r.mkString(","))
  }

  test("ivfPqRecall with nprobe=1 prunes the other cell and still finds in-cell hits") {
    val r = Clustering.ivfPqRecall(twoClusters, kc = 2, m = 2, kpq = 4,
      topK = 3, nprobe = 1, nQueries = 2).collect()
      .map(x => x.getAs[Long]("query_id") ->
        (x.getAs[Long]("n_cand"), x.getAs[Double]("recall"))).toMap
    // each query's cell holds its 3 groupmates — exactly the candidate set
    // and exactly the brute top-3 (groups are far apart) → recall 1.0
    assert(r(0L) == (3L, 1.0) && r(1L) == (3L, 1.0), r.toString)
  }
}
