package graft.plans

import graft.SparkSpec

/** The `spark.graft.rounds.<op>` iteration-depth knob: defaults stay
  * oracle-pinned, and a conf-set count reaches the operator through the
  * `SparkEntry.queries` surface with no code edits.
  */
class RoundsSpec extends SparkSpec {

  test("Rounds.of reads the session conf, falls back to the default") {
    assert(Rounds.of(spark, "lpa", 2) == 2)
    spark.conf.set(Rounds.Prefix + "lpa", "5")
    try assert(Rounds.of(spark, "lpa", 2) == 5)
    finally spark.conf.unset(Rounds.Prefix + "lpa")
  }

  test("a conf-set round count is respected by the query surface") {
    val dir = sf("")
    val defaultRows =
      graft.SparkEntry.queries("q143_pagerank")(spark, dir).collect().toSeq
    spark.conf.set(Rounds.Prefix + "pagerank", "1")
    try {
      val viaConf =
        graft.SparkEntry.queries("q143_pagerank")(spark, dir).collect().toSeq
      val direct = graft.operators.GraphOps.copurchaseRank(
        graft.operators.GraphOps.sharedEdges(spark, dir),
        iters = 1, topN = 10).collect().toSeq
      assert(viaConf == direct, "conf-set count must reach the operator")
      assert(viaConf != defaultRows, "1-round ranks must differ from 3-round")
    } finally spark.conf.unset(Rounds.Prefix + "pagerank")
    assert(graft.SparkEntry.queries("q143_pagerank")(spark, dir)
      .collect().toSeq == defaultRows, "unsetting restores the default")
  }
}
