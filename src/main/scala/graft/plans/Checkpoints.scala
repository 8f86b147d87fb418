package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage-breaking for iterative plans (CC rounds, PageRank, triangle
  * phases), with a reliability knob.
  *
  * Default (`dir = None`) is `localCheckpoint(eager = true)`: blocks are
  * materialized in executor storage — fastest, but an executor loss
  * mid-iteration kills the lineage and the job. That is the right trade
  * in a single-JVM sandbox and for short interactive runs. A 1000-
  * executor run over 100 TB wants `dir = Some(path)`: a RELIABLE
  * `checkpoint()` writes the round to the fault-tolerant store behind
  * `path` (HDFS/object store), so iteration k survives any executor and
  * restarts from materialized state instead of replaying the whole
  * lineage chain.
  *
  * The checkpoint directory is process-global in Spark
  * (`SparkContext.setCheckpointDir`); it is set lazily on first use and
  * only re-set when the requested base dir actually changes, so
  * repeated calls inside an iteration loop do not spray one UUID
  * subdirectory per round.
  */
object Checkpoints {
  @volatile private var lastDir: Option[String] = None

  def cut(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      synchronized {
        if (!lastDir.contains(d) || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(d)
          lastDir = Some(d)
        }
      }
      df.checkpoint()
    case None =>
      df.localCheckpoint(true)
  }
}
