package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation: Lloyd's k-means over
  * fixed-point quantized vectors, and the SemDeDup-style semantic
  * deduplication pass that prunes near-identical vectors inside each
  * cluster (Abbas et al. 2023 — cluster first so the pairwise stage is
  * bounded by cluster size, never corpus size).
  *
  * Determinism design (the whole module is hash-compared to a DuckDB
  * oracle): embeddings are quantized to BIGINT fixed-point
  * (floor(x·10⁶)+10⁶ — the +10⁶ shift keeps every value non-negative so
  * Spark's `div` and DuckDB's `//`, both truncating, agree with floor
  * semantics on centroid means). Distances are exact integer squared-L2
  * sums (the shift cancels in differences), so argmin assignment,
  * inertia, and the near-dup threshold are bit-identical under any
  * partitioning or summation order — no float drift anywhere.
  *
  * Scale design:
  *  - k centroids are a k-row DataFrame, explicitly `broadcast` into the
  *    assignment cross-join: the corpus never shuffles to assign.
  *  - The centroid update is one posexplode + hash-aggregate on
  *    (cluster, dim) — shuffle rows = k·D after partial aggregation,
  *    not n·D (map-side combine collapses each partition first).
  *  - The dedup self-join is equi-keyed on the cluster id, so Spark
  *    plans a shuffled hash join where each task sees one cluster's
  *    vectors — the all-pairs cost is Σ nᵢ², the SemDeDup bound, and
  *    skewed clusters are AQE-splittable.
  *
  * Reference provenance: the reference has no vector ops; the closest
  * analogue is its per-dataset grouping validation
  * (src/ingest-pipeline/airflow/dags/validation_utils.py) — clustering
  * here generalizes "group, then check within group" to embedding space.
  */
object Clustering extends QueryModule {

  val Scale = 1000000L
  /** Squared-L2 threshold (in quantized units²) under which two vectors
    * in the same cluster are semantic duplicates: ~p0.4 of the pairwise
    * distance distribution of the synthetic embeddings table.
    */
  val DupThreshold = 1350000000000L

  /** (vec_id, label, u: Array[Long]) — fixed-point non-negative vectors. */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"), col("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * Scale).cast("long") + Scale).as("u"))

  /** Integer squared-L2 via the codegen'd [[graft.functions.LongVecSqDist]]
    * kernel — bit-identical to the HOF
    * `aggregate(zip_with(a, b, (x,y) -> (x-y)²), 0L, +)` (spec-pinned)
    * but stays inside WholeStageCodegen instead of interpreted lambda
    * dispatch k·D times per vector in the assignment cross-join.
    */
  private def sqDist(a: Column, b: Column): Column =
    graft.functions.LongVecSqDist.sqDist(a, b)

  /** One assignment pass: nearest centroid by integer squared-L2,
    * ties broken by smaller centroid id (struct-min ordering — (dist,
    * cid) is unique per vector, so the min is total and deterministic).
    */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), struct(
        sqDist(col("u"), col("cu")).as("dist"),
        col("cid"), col("label"), col("u")).as("cand"))
      .groupBy("vec_id").agg(min(col("cand")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"),
        col("m.label").as("label"), col("m.u").as("u"))

  /** Recompute centroids as per-dimension floor-mean of members. */
  def updateCentroids(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("u")).as(Seq("dim", "v")))
      .groupBy("cid", "dim")
      .agg(expr("sum(v) div count(*)").as("cm"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cm")))),
        s => s.getField("cm")).as("cu"))

  /** `iters` assignment passes over `k` clusters seeded from the first k
    * vec_ids, with a centroid update between passes (Lloyd's). Returns
    * the final assignment with per-vector distance and quantized vector.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val vecs = quantized(embeddings)
    var centroids = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("u").as("cu"))
    var assigned = assign(vecs, centroids)
    for (_ <- 2 to iters) {
      centroids = updateCentroids(assigned)
      assigned = assign(vecs, centroids)
    }
    assigned
  }

  /** q176: k-means cluster report — size, exact-integer inertia, and
    * label purity (majority label over member class labels, count-desc /
    * label-asc tie-break) per cluster. The purity column is the
    * SemDeDup-era sanity check that geometric clusters track semantic
    * classes before trusting within-cluster dedup.
    */
  def kmeansReport(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
                   checkpointDir: Option[String] = None): DataFrame = {
    // sizes and majority-label both read the assignment — cut once
    val a = graft.plans.Checkpoints.cut(
      kmeansAssign(embeddings, k, iters), checkpointDir)
    val sizes = a.groupBy("cid").agg(
      count(lit(1)).as("n_points"), sum(col("dist")).as("inertia"))
    val maj = a.groupBy("cid", "label").agg(count(lit(1)).as("cnt"))
      .groupBy("cid").agg(max(struct(col("cnt"), (-col("label")).as("nl"),
        col("label"))).as("m"))
      .select(col("cid"), col("m.label").as("majority_label"), col("m.cnt").as("maj_cnt"))
    sizes.join(maj, "cid")
      .select(col("cid").as("cluster"), col("n_points"), col("inertia"),
        col("majority_label"),
        round(col("maj_cnt") / col("n_points").cast("double"), 4).as("purity"))
      .orderBy("cluster")
  }

  /** q177: SemDeDup pass — inside each final cluster, a vector is
    * dropped when ANY lower-id cluster-mate sits within [[DupThreshold]]
    * squared-L2 (keep-first-by-id, the deterministic variant of "keep
    * one per duplicate ball"). Reports kept/dropped per cluster.
    */
  def semDedupReport(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
                     checkpointDir: Option[String] = None): DataFrame = {
    // cut the lineage once: the self-join below reads the assignment
    // TWICE, and without the cut each side replays the full Lloyd
    // iteration (two assignment passes + centroid update) from the scan
    val a = graft.plans.Checkpoints.cut(
      kmeansAssign(embeddings, k, iters).select("vec_id", "cid", "u"), checkpointDir)
    val dropped = a.as("a").join(a.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id") &&
        sqDist(col("a.u"), col("b.u")) <= DupThreshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    a.join(dropped.withColumn("is_dup", lit(1)), Seq("vec_id"), "left")
      .groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_points"),
        sum(coalesce(col("is_dup"), lit(0))).as("n_dropped"),
        (count(lit(1)) - sum(coalesce(col("is_dup"), lit(0)))).as("n_kept"))
      .orderBy("cluster")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_kmeans"   -> ((s, d) => kmeansReport(Tables(s, d).embeddings)),
    "q177_semdedup" -> ((s, d) => semDedupReport(Tables(s, d).embeddings)),
  )

  /** Shared oracle prelude: quantize, seed centroids, one Lloyd update,
    * final assignment — the SQL unrolling of kmeansAssign(k=8, iters=2).
    */
  private val assignSql =
    """WITH e AS (SELECT vec_id, label,
      |                 list_transform(embedding,
      |                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) + 1000000) AS u
      |          FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, u AS cu FROM e WHERE vec_id < 8),
      |d1 AS (SELECT e.vec_id, e.label, e.u, c.cid,
      |              list_sum(list_transform(range(len(e.u)),
      |                k -> (e.u[k+1] - c.cu[k+1]) * (e.u[k+1] - c.cu[k+1]))) AS dist
      |       FROM e CROSS JOIN c0 c),
      |a1 AS (SELECT * FROM (SELECT vec_id, label, u, cid, dist,
      |                             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |                      FROM d1) WHERE rn = 1),
      |c1 AS (SELECT cid, list(cm ORDER BY dim) AS cu FROM (
      |         SELECT cid, dim, sum(v) // count(*) AS cm FROM (
      |           SELECT cid, unnest(range(len(u))) AS dim, unnest(u) AS v FROM a1)
      |         GROUP BY cid, dim) GROUP BY cid),
      |d2 AS (SELECT e.vec_id, e.label, e.u, c.cid,
      |              list_sum(list_transform(range(len(e.u)),
      |                k -> (e.u[k+1] - c.cu[k+1]) * (e.u[k+1] - c.cu[k+1]))) AS dist
      |       FROM e CROSS JOIN c1 c),
      |a2 AS (SELECT * FROM (SELECT vec_id, label, u, cid, dist,
      |                             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |                      FROM d2) WHERE rn = 1)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q176_kmeans" -> (assignSql +
      """,
        |lab AS (SELECT cid, label, count(*) AS cnt FROM a2 GROUP BY cid, label),
        |maj AS (SELECT cid, label, cnt FROM (
        |          SELECT cid, label, cnt,
        |                 row_number() OVER (PARTITION BY cid ORDER BY cnt DESC, label) AS rn
        |          FROM lab) WHERE rn = 1)
        |SELECT a2.cid AS cluster, count(*)::BIGINT AS n_points,
        |       sum(a2.dist)::BIGINT AS inertia,
        |       m.label AS majority_label,
        |       round(m.cnt / CAST(count(*) AS DOUBLE), 4) AS purity
        |FROM a2 JOIN maj m ON a2.cid = m.cid
        |GROUP BY a2.cid, m.label, m.cnt ORDER BY cluster""".stripMargin),
    "q177_semdedup" -> (assignSql +
      """,
        |dropped AS (SELECT DISTINCT b.vec_id FROM a2 a JOIN a2 b
        |            ON a.cid = b.cid AND a.vec_id < b.vec_id
        |            AND list_sum(list_transform(range(len(a.u)),
        |                  k -> (a.u[k+1] - b.u[k+1]) * (a.u[k+1] - b.u[k+1]))) <= 1350000000000
        |)
        |SELECT a2.cid AS cluster, count(*)::BIGINT AS n_points,
        |       sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
        |       sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.vec_id
        |GROUP BY a2.cid ORDER BY cluster""".stripMargin),
  )
}
