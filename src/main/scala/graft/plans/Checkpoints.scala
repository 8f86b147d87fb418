package graft.plans

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Lineage-breaking for iterative plans (CC rounds, PageRank, triangle
  * phases), with a reliability knob and a scoped storage-release API.
  *
  * Default (`dir = None` and the session conf unset) is
  * `localCheckpoint(eager = true)`: blocks are materialized in executor
  * storage — fastest, but an executor loss mid-iteration kills the
  * lineage and the job. That is the right trade in a single-JVM sandbox
  * and for short interactive runs. A 1000-executor run over 100 TB wants
  * the RELIABLE `checkpoint()` path: the round is written to the
  * fault-tolerant store (HDFS/object store), so iteration k survives any
  * executor and restarts from materialized state instead of replaying
  * the whole lineage chain.
  *
  * The reliable path is reachable two ways:
  *   - per call site, `cut(df, Some(path))` — explicit plumbing;
  *   - session-wide, `spark.conf.set("spark.graft.checkpointDir", path)`
  *     — every `cut(df, None)` in the session upgrades to `checkpoint()`
  *     into that directory with NO call-site changes. This is the knob a
  *     cluster deployment flips: the query surface (`SparkEntry.queries`)
  *     constructs operators with `checkpointDir = None`, and the conf
  *     re-routes all of them at once. (Checkpoint files are cleaned by
  *     Spark only with `spark.cleaner.referenceTracking.cleanCheckpoints`
  *     — lifecycle of the directory belongs to the deployment.)
  *
  * The checkpoint directory is process-global in Spark
  * (`SparkContext.setCheckpointDir`); it is set lazily on first use and
  * only re-set when the requested base dir actually changes, so
  * repeated calls inside an iteration loop do not spray one UUID
  * subdirectory per round.
  *
  * Storage lifecycle. `localCheckpoint` pins its blocks for the session
  * lifetime — in a long-lived 100×-scale session those pinned blocks
  * accumulate until the unified-memory storage floor squeezes execution
  * memory. Every local cut therefore REGISTERS the RDD it pinned, and
  * iterative operators that `cache()` an intermediate consumed lazily by
  * their RESULT plan (so an in-scope unpersist à la Dedup's CC loop is
  * impossible) register it via [[pin]]. A harness calls
  * [[release]] once the query's terminal consumer has run — Bench does
  * so between queries — and all graft-pinned storage drains. Releasing
  * makes the already-returned DataFrames non-recomputable (their lineage
  * was truncated at the cut), which is exactly the contract: release
  * only after the results are consumed.
  */
object Checkpoints {

  /** Session conf key for the reliable-checkpoint upgrade. */
  val DirConf = "spark.graft.checkpointDir"

  /** Session conf key that turns every [[cut]] into a no-op. A cut
    * truncates lineage, so `explain`/plan-contract tooling sees only the
    * final segment of an iterative operator; flipping this knob exposes
    * the WHOLE composed plan for inspection (at the cost of the
    * re-execution the cuts exist to prevent — inspection only, never
    * production).
    */
  val DisableConf = "spark.graft.checkpoint.disable"

  @volatile private var lastDir: Option[String] = None

  // RDD ids pinned by localCheckpoint cuts, and cached Datasets pinned
  // via pin() — both drained by release(). Identified per-call (not
  // per-session): the sandbox runs one session, and on a cluster each
  // driver JVM owns one SparkContext anyway.
  private val pinnedRddIds = ConcurrentHashMap.newKeySet[Integer]()
  private val pinnedDatasets = new ConcurrentLinkedQueue[Dataset[_]]()

  def cut(df: DataFrame, dir: Option[String]): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(DisableConf).contains("true")) return df
    val effective =
      dir.orElse(spark.conf.getOption(DirConf).map(_.trim).filter(_.nonEmpty))
    effective match {
      case Some(d) =>
        val sc = spark.sparkContext
        synchronized {
          if (!lastDir.contains(d) || sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(d)
            lastDir = Some(d)
          }
        }
        df.checkpoint()
      case None =>
        val sc = spark.sparkContext
        // localCheckpoint(eager) persists exactly the RDDs it pins before
        // returning — a before/after diff of the persistent-RDD registry
        // captures their ids for later release. Cuts are driver-side and
        // effectively sequential per query; a concurrent foreign persist
        // landing in the window would merely be released late (harmless:
        // release touches only ids still live at drain time).
        val before = sc.getPersistentRDDs.keySet
        val out = df.localCheckpoint(true)
        sc.getPersistentRDDs.keySet.diff(before).foreach { id =>
          pinnedRddIds.add(id)
        }
        out
    }
  }

  /** Presentation sort over a BOUNDED (report-sized) result: materialize
    * the frame with [[cut]], THEN apply the global orderBy. A global
    * sort's range partitioner SAMPLES its child before the real pass.
    * When this helps — and when it doesn't: under AQE, query stages
    * materialize bottom-up, so the sampling re-executes only the segment
    * ABOVE the last shuffle. If that segment is a cheap post-shuffle
    * aggregate (most report tails), the cut buys nothing (A/B-measured
    * flat on q187/q113/q115/q117/q137). It pays ~2× exactly when the
    * segment between the last exchange and the sort is map-heavy —
    * q94's broadcast-join probe chain (measured 3.7 → 2.1 s at sf0.1).
    * Only for results whose size is set by the report schema, never
    * corpus-sized outputs (those would pin corpus-scale storage).
    */
  def cutSorted(df: DataFrame, sortCols: org.apache.spark.sql.Column*): DataFrame =
    cut(df, None).orderBy(sortCols: _*)

  /** `cache()` an intermediate that the operator's RESULT plan consumes
    * lazily (so the operator itself has no safe point to unpersist), and
    * register it for [[release]]. Returns the same Dataset.
    */
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    ds.cache()
    pinnedDatasets.add(ds)
    ds
  }

  /** Drain every block graft pinned via [[cut]] (local path) or [[pin]].
    * Call AFTER the terminal consumer of the returned DataFrames — the
    * cuts' lineage is truncated, so post-release re-execution of those
    * plans would fail by design. Non-blocking unpersist: block removal
    * proceeds asynchronously while the next query starts.
    */
  def release(spark: SparkSession): Unit = {
    var d = pinnedDatasets.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = pinnedDatasets.poll()
    }
    val live = spark.sparkContext.getPersistentRDDs
    val it = pinnedRddIds.iterator()
    while (it.hasNext) {
      live.get(it.next().intValue()).foreach(_.unpersist(blocking = false))
      it.remove()
    }
  }
}
