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
    spark.conf.getOption(Prefix + op)
      .map(_.trim)
      .filter(_.nonEmpty)
      .map { v =>
        val n =
          try v.toInt
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"${Prefix}$op must be an integer round count, got '$v'")
          }
        // 0 or negative rounds silently degenerate (0-round LPA returns
        // the warm start; 0-round k-core peels nothing) — fail fast like
        // the non-integer path instead
        if (n < 1) throw new IllegalArgumentException(
          s"${Prefix}$op must be >= 1, got '$v'")
        n
      }
      .getOrElse(default)
}
