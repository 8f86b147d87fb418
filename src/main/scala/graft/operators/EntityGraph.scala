package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-graph ancestry (SURVEY.md §1.1 entity graph, §2.4 J8): the
  * reference walks Donor→Sample→Dataset parent links with per-node HTTP
  * lookups (survey.py:226-303); here the graph is an `edges` DataFrame
  * and ancestry is an iterative self-join to fixpoint (BFS). Catalyst
  * has no recursion, so the driver loops; each iteration is one
  * distributed hash join + except, and the loop terminates on the first
  * empty frontier (cycle-safe because visited pairs are excluded).
  */
object EntityGraph extends QueryModule {

  /** Transitive closure of a (child, parent) edge set. Frontier-based:
    * per iteration only the newly discovered pairs join against edges,
    * so total work is O(paths), not O(iterations × closure).
    */
  def transitiveClosure(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    import graft.plans.Checkpoints
    val e = Checkpoints.pin(edges.select(col("child"), col("parent")).distinct())
    // Cache each BFS level once and keep the cumulative closure as a
    // plain union VIEW over the cached levels: union scans its cached
    // children, so re-caching the whole closure every iteration (an extra
    // full materialization pass + a second in-memory copy per level) is
    // pure overhead. One action per iteration (count materializes the new
    // level AND answers the emptiness check). The levels are consumed
    // lazily by the RETURNED union plan, so there is no in-scope point to
    // unpersist them — they are pin()-registered and drained by
    // Checkpoints.release once the caller's terminal consumer has run.
    val first = Checkpoints.pin(e.select(col("child"), col("parent").as("ancestor")))
    var closure = first
    var frontier = first
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      // no explicit distinct: EXCEPT has set semantics and dedups anyway
      val next = Checkpoints.pin(frontier.as("f")
        .join(e.as("g"), col("f.ancestor") === col("g.child"))
        .select(col("f.child"), col("g.parent").as("ancestor"))
        .except(closure))
      if (next.count() == 0L) done = true
      else {
        closure = closure.union(next)
        frontier = next
        i += 1
      }
    }
    if (!done) {
      System.err.println(
        s"[graft] transitiveClosure stopped at maxIters=$maxIters with a non-empty frontier — " +
          "closure may be incomplete; raise maxIters for deeper graphs")
    }
    closure
  }

  /** The star schema as an entity graph: customer→nation→region, typed
    * string ids like the reference's uuid space.
    */
  def starEdges(customer: DataFrame, nation: DataFrame): DataFrame =
    customer.select(
        concat(lit("C"), col("c_custkey")).as("child"),
        concat(lit("N"), col("c_nationkey")).as("parent"))
      .unionByName(nation.select(
        concat(lit("N"), col("n_nationkey")).as("child"),
        concat(lit("R"), col("n_regionkey")).as("parent")))

  def ancestry(customer: DataFrame, nation: DataFrame): DataFrame =
    transitiveClosure(starEdges(customer, nation))
      .orderBy("child", "ancestor")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_ancestry" -> ((s, d) => { val t = Tables(s, d); ancestry(t.customer, t.nation) }),
  )

  override def oracles: Map[String, String] = Map(
    "q31_ancestry" ->
      """WITH RECURSIVE edges AS (
           SELECT 'C' || c_custkey AS child, 'N' || c_nationkey AS parent FROM customer
           UNION ALL
           SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
         anc AS (
           SELECT child, parent AS ancestor FROM edges
           UNION
           SELECT a.child, e.parent FROM anc a JOIN edges e ON a.ancestor = e.child)
         SELECT child, ancestor FROM anc ORDER BY child, ancestor""",
  )
}
