package graft.jobs

import scala.util.matching.Regex

import org.apache.spark.sql.SparkSession

/** Resource-map routing (SURVEY §2.4 J6 tail): the reference assigns
  * per-DAG/per-task compute resources from an ordered regex rule table
  * (utils.py:1820-1889 `_lookup_resource_record` over the compiled
  * resource map) — queue routing, thread counts, lane (concurrency)
  * limits, scratch retention. The Spark-native counterparts: queues map
  * to fair-scheduler pools (`spark.scheduler.pool`), threads size
  * CPU-bound stages (codec partitioning, shuffle widths), lanes bound
  * concurrent pipeline runs.
  *
  * Semantics are pinned to the reference exactly:
  *   - first DAG rule whose regex matches wins; within it, first task
  *     rule wins; a DAG match with no task match is an error, unmatched
  *     DAG is an error (utils.py:1845-1867);
  *   - task-level values overlay DAG-level values (`dict.update`);
  *   - a `None` task id looks up `"__default__"` (utils.py:1909-1911).
  */
object Resources {

  /** One task-level overlay: first matching pattern wins. */
  final case class TaskRule(taskPattern: String, threads: Option[Int] = None,
                            coreuse: Option[Int] = None, queue: Option[String] = None) {
    private[jobs] lazy val re: Regex = taskPattern.r
  }

  /** One DAG-level rule with its task overlays. */
  final case class DagRule(dagPattern: String, queue: String, lanes: Int,
                           preserveScratch: Boolean = false,
                           threads: Option[Int] = None, coreuse: Option[Int] = None,
                           tasks: Seq[TaskRule] = Nil) {
    private[jobs] lazy val re: Regex = dagPattern.r
  }

  /** Merged lookup record (DAG values overlaid by the matched task). */
  final case class Record(queue: String, lanes: Int, preserveScratch: Boolean,
                          threads: Option[Int], coreuse: Option[Int])

  final case class ResourceMap(rules: Seq[DagRule]) {

    /** `_lookup_resource_record` (utils.py:1845-1867): first-match on
      * both levels, task overlay via update, errors mirror the
      * reference's.
      */
    def lookup(dagId: String, taskId: Option[String]): Record = {
      rules.find(_.re.findPrefixOf(dagId).isDefined) match {
        case None =>
          throw new IllegalArgumentException(
            s"No resource map entry found for dag_id <$dagId> task_id <${taskId.orNull}>")
        case Some(dag) =>
          val base = Record(dag.queue, dag.lanes, dag.preserveScratch, dag.threads, dag.coreuse)
          taskId match {
            case None => base
            case Some(t) =>
              dag.tasks.find(_.re.findPrefixOf(t).isDefined) match {
                case None => throw new IllegalArgumentException(
                  s"Resource map entry for dag_id <$dagId> has no match for task_id <$t>")
                case Some(task) => base.copy(
                  queue = task.queue.getOrElse(base.queue),
                  threads = task.threads.orElse(base.threads),
                  coreuse = task.coreuse.orElse(base.coreuse))
              }
          }
      }
    }

    /** `get_threads_resource` (utils.py:1902-1921), arithmetic
      * reproduced LITERALLY — including the reference's integer
      * division: `math.ceil(cpu_count * (coreuse // 100))`, so
      * coreuse below 100 floors to ZERO threads (a latent quirk in the
      * reference; real maps use coreuse ≥ 100 multiples). The branch
      * ladder: coreuse present-and-nonzero → the coreuse arithmetic
      * (non-positive coreuse falls to `ceil(cpu/4)`); otherwise the
      * explicit `threads` field.
      */
    def threads(dagId: String, taskId: Option[String], cpuCount: Int): Int = {
      val rec = lookup(dagId, Some(taskId.getOrElse("__default__")))
      rec.coreuse.filter(_ != 0) match {
        case Some(c) if c > 0 => cpuCount * (c / 100) // ceil of an int product is itself
        case Some(_)          => math.ceil(cpuCount / 4.0).toInt
        case None             => rec.threads.getOrElse(throw new IllegalArgumentException(
          s"resource record for <$dagId> has neither threads nor coreuse"))
      }
    }

    /** `get_queue_resource` (utils.py:1869-1879). */
    def queue(dagId: String, taskId: Option[String] = None): String =
      lookup(dagId, Some(taskId.getOrElse("__default__"))).queue

    /** `get_lanes_resource` (utils.py:1882-1889): DAG-level concurrency
      * bound (the reference feeds it to max_active_runs).
      */
    def lanes(dagId: String): Int = lookup(dagId, None).lanes

    /** `get_preserve_scratch_resource` (utils.py:1892-1899). */
    def preserveScratch(dagId: String): Boolean = lookup(dagId, None).preserveScratch

    /** Route a job onto its fair-scheduler pool — the Spark counterpart
      * of the reference's Celery queue override (utils.py:236-248): set
      * before submitting the job's actions, on the thread that runs
      * them.
      */
    def applyPool(spark: SparkSession, dagId: String, taskId: Option[String] = None,
                  template: Option[String] = None): String = {
      val pool = mapQueueName(queue(dagId, taskId), template)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
      pool
    }
  }

  /** `map_queue_name` (utils.py:1759-1773): an optional deployment
    * template (e.g. `"prefix_{}"`) customizes the raw queue name for job
    * separation; absent template passes through.
    */
  def mapQueueName(raw: String, template: Option[String]): String =
    template match {
      case Some(t) => t.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"").replace("{}", raw)
      case None => raw
    }
}
