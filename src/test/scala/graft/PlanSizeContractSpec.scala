package graft

/** Repo-wide guard against the exponential-lineage bug class: an
  * iterative operator that references its previous round twice (or
  * carries corpus lineage into a loop) doubles its logical plan per
  * round — the plan still EXECUTES, so no correctness gate catches it,
  * and the failure surfaces only at scale (q296's driver OOM while
  * stringifying the plan, q307's 11 s of re-derived windows, q301's
  * 27,020-line / 1,540-scan plan). This spec walks EVERY
  * `SparkEntry.queries` entry at sf0.001 and bounds the physical plan
  * the driver would execute:
  *
  *   - `MaxPlanLines`: total plan-string lines. A healthy iterative
  *     plan is O(1) per round after its lineage cuts (q314: ~350
  *     lines); the bound is an order of magnitude above the largest
  *     legitimate plan, and three orders below the failure mode.
  *   - `MaxParquetScans`: distinct parquet scans in the plan. Queries
  *     legitimately scan a table a handful of times (self-joins,
  *     multi-config audits like q326); an exponential-lineage plan
  *     scans it HUNDREDS of times.
  *
  * Building each DataFrame executes the operators' eager lineage cuts
  * (that is the point — the bound applies to the post-cut plan, the one
  * the cluster actually plans per round), so this suite is also an
  * any-query-throws smoke test of the whole surface.
  */
class PlanSizeContractSpec extends SparkSpec {

  // calibrated: the largest legitimate plan across all 330 queries is
  // 300 lines / 28 scans (q307 / q31); the failure mode is 27,000 / 1,540
  private val MaxPlanLines = 1000
  private val MaxParquetScans = 48

  test("every SparkEntry query's executed plan is lineage-bounded") {
    val dir = sf("")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val p = df.queryExecution.executedPlan.toString
        val lines = p.count(_ == '\n') + 1
        val scans = "Scan parquet".r.findAllIn(p).size
        sizes += ((name, lines, scans))
        // a second repo-wide scale-killer ban: no unbounded cartesian
        // anywhere (scalar-frame crossJoins plan as BroadcastNestedLoop,
        // which is allowed; a CartesianProduct node means both sides
        // were row-level)
        if (p.contains("CartesianProduct"))
          failures += s"$name plans a CartesianProduct"
      } catch {
        case e: Throwable => failures += s"$name threw: ${e.getMessage}"
      } finally graft.plans.Checkpoints.release(spark)
    }
    assert(failures.isEmpty, failures.mkString("; "))
    val offenders = sizes.filter { case (_, l, s) =>
      l > MaxPlanLines || s > MaxParquetScans
    }
    val top = sizes.sortBy(-_._2).take(5)
      .map { case (n, l, s) => s"$n($l lines,$s scans)" }.mkString(", ")
    info(s"largest plans: $top")
    assert(offenders.isEmpty,
      "exponential-lineage suspects (add a Checkpoints.cut, see q301/q296/q307): " +
        offenders.map { case (n, l, s) => s"$n: $l lines, $s parquet scans" }
          .mkString("; "))
  }
}
