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

  test("Rounds.of rejects non-positive round counts") {
    for (bad <- Seq("0", "-3")) {
      spark.conf.set(Rounds.Prefix + "lpa", bad)
      try intercept[IllegalArgumentException](Rounds.of(spark, "lpa", 2))
      finally spark.conf.unset(Rounds.Prefix + "lpa")
    }
  }

  test("the cc cap knob reaches connectedComponents") {
    import spark.implicits._
    // a 6-node path needs >1 min-propagation round past the warm start
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("left_id", "right_id")
    val full = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(_.getLong(1)).distinct
    assert(full.toSeq == Seq(1L), "converged: one component labeled 1")
    spark.conf.set(Rounds.Prefix + "cc", "1")
    try {
      val capped = graft.operators.Dedup.connectedComponents(pairs)
        .collect().map(_.getLong(1)).distinct
      assert(capped.length > 1, "cap=1 must stop before the fixpoint")
    } finally spark.conf.unset(Rounds.Prefix + "cc")
  }

  test("the dawidskene rounds knob is respected by the query surface") {
    val dir = sf("")
    val q = graft.SparkEntry.queries("q334_dawid_skene")
    val defaultRows = q(spark, dir).collect().toSeq
    spark.conf.set(Rounds.Prefix + "dawidskene", "1")
    try {
      val viaConf = q(spark, dir).collect().toSeq
      val direct = graft.operators.RoundNineOps
        .dawidSkene(graft.Tables(spark, dir).documents, rounds = 1)
        .collect().toSeq
      assert(viaConf == direct, "conf-set count must reach the operator")
      assert(viaConf != defaultRows, "1-round EM must differ from 2-round")
    } finally spark.conf.unset(Rounds.Prefix + "dawidskene")
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
