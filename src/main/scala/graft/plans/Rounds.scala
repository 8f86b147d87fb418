package graft.plans

import org.apache.spark.sql.SparkSession

/** Cluster-operator knob for iteration depth, the counterpart of
  * [[Checkpoints.DirConf]]: every iterative `SparkEntry.queries` entry
  * constructs its operator with the oracle-pinned default round count,
  * and `spark.conf.set("spark.graft.rounds.<op>", n)` deepens (or
  * shortens) the iteration session-wide with NO code edits — e.g.
  * `spark.graft.rounds.lpa = 10` for real community convergence on a
  * cluster, or `spark.graft.rounds.hyperball = 8` for the full distance
  * distribution. Defaults unchanged ⇒ oracle results unchanged; a
  * non-default count is a deliberate semantic choice (the fixed-round
  * unrolled oracles pin the default only).
  */
object Rounds {

  /** Conf prefix; full key is `spark.graft.rounds.<op>`. */
  val Prefix = "spark.graft.rounds."

  def of(spark: SparkSession, op: String, default: Int): Int =
    posInt(spark, Prefix + op, default)

  /** General positive-int session knob under any `spark.graft.*` key,
    * with the same fail-fast validation as the rounds knobs. Used for
    * model-SIZE parameters that must grow with the corpus — e.g.
    * `spark.graft.kmeans.k`: SemDeDup's within-cluster pairwise bound
    * Σnᵢ² only stays linear when k scales ∝ corpus size (fixed k on
    * 10× data is 10× the per-cluster membership = 100× the pairwise
    * work — measured by the sf1 scale sweep). Defaults oracle-pinned.
    */
  def posInt(spark: SparkSession, key: String, default: Int): Int =
    spark.conf.getOption(key)
      .map(_.trim)
      .filter(_.nonEmpty)
      .map { v =>
        val n =
          try v.toInt
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"$key must be an integer, got '$v'")
          }
        // 0 or negative silently degenerate (0-round LPA returns the
        // warm start; k=0 k-means has no clusters) — fail fast like
        // the non-integer path instead
        if (n < 1) throw new IllegalArgumentException(
          s"$key must be >= 1, got '$v'")
        n
      }
      .getOrElse(default)
}
