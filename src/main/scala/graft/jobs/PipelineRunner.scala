package graft.jobs

/** §7 "hard parts" — external process stages (the reference shells out
  * to cwltool per workflow): isolated behind a trait so jobs stay
  * testable and the devtest path mocks it, exactly like the reference's
  * devtest collection type exists to exercise the machinery without a
  * real pipeline. A production implementation wraps the workflow
  * launcher; the engine only ever sees the returned status.
  */
trait PipelineRunner extends Serializable {
  /** Run `workflow` with `conf`; returns the terminal status string the
    * status machine understands ("qa", "invalid", "error").
    */
  def run(workflow: String, conf: Map[String, String]): String
}

/** Deterministic mock: succeeds unless the conf asks it not to — the
  * devtest stand-in for cwltool.
  */
object DevtestRunner extends PipelineRunner {
  def run(workflow: String, conf: Map[String, String]): String =
    if (conf.get("fail").contains("true")) "error"
    else if (workflow == "no_workflow") "invalid"
    else "qa"
}
