package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 crash-resume contract for the streaming monitors: stop the
  * query between micro-batches, restart from the SAME checkpoint +
  * monitor-state dir, and the cumulative PSI cells / SPRT decision
  * table must equal what an uninterrupted run over all the data
  * produces. This is the property the parity specs could not see: the
  * monitors' driver-side cumulative map lives OUTSIDE Spark's streaming
  * checkpoint, so without [[IngestStream.MonitorState]] persistence a
  * restarted monitor silently forgot every pre-crash day/cell.
  * A replayable FILE source (not MemoryStream) drives both runs, so the
  * restart recovers real offsets from the checkpoint.
  */
class MonitorResumeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("psi monitor restart resumes cumulative cells (additive merge, batch-id idempotent)") {
    val root = java.nio.file.Files.createTempDirectory("graft_psi_resume").toString
    val srcDir = s"$root/src"
    val monDir = s"$root/mon"
    def mkVecs(lo: Int, hi: Int) = (lo until hi).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 1.7 + 0.9 * d).toFloat)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def stream = spark.readStream.schema(schema).parquet(srcDir)
    val updates = scala.collection.mutable.ArrayBuffer.empty[Seq[Row]]
    def run(): Unit = {
      val q = IngestStream.startPsiMonitor(stream, projs = 4,
        stateDir = Some(monDir)) { df => updates += df.collect().toSeq }
      q.processAllAvailable()
      q.stop()
    }
    mkVecs(0, 40).toDF("vec_id", "embedding")
      .write.mode("append").parquet(srcDir)
    run()                                  // first life: cells for vecs 0-39
    assert(updates.nonEmpty, "first life must emit at least one PSI update")
    val firstLife = updates.last
    mkVecs(40, 100).toDF("vec_id", "embedding")
      .write.mode("append").parquet(srcDir)
    run()                                  // second life: ONLY the new files replay
    val resumed = updates.last
    assert(resumed != firstLife, "second life must fold the new vectors in")
    // uninterrupted reference: one batch pass over the union
    val all = mkVecs(0, 100).toDF("vec_id", "embedding")
    val batchRef = graft.operators.RoundNineOps.psiFromCells(
      graft.operators.RoundNineOps.psiBucketCells(all, projs = 4)).collect().toSeq
    assert(resumed == batchRef,
      "restarted monitor must equal the uninterrupted cumulative fold")
    // durable state artifact exists and recorded the last batch id
    val f = java.nio.file.Paths.get(monDir, "monitor_state.tsv")
    assert(java.nio.file.Files.exists(f))
    assert(new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .startsWith("#batch\t"))
  }

  test("sprt monitor restart resumes the finalized-day table and decisions") {
    val root = java.nio.file.Files.createTempDirectory("graft_sprt_resume").toString
    val srcDir = s"$root/src"
    val monDir = s"$root/mon"
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType)))
    def stream = spark.readStream.schema(schema).parquet(srcDir)
    val decisions = scala.collection.mutable.ArrayBuffer.empty[Seq[Row]]
    def run(): Unit = {
      val q = IngestStream.startSprtMonitor(stream, watermark = "1 day",
        stateDir = Some(monDir)) { df => decisions += df.collect().toSeq }
      q.processAllAvailable()
      q.stop()
    }
    // file 1: days 1-2 (odd users only count) + a day-4 watermark
    // carrier — wm advances to day-3 00:30, finalizing days 1 and 2
    Seq(
      (ts("2024-01-01 01:00:00"), 1L, "purchase"),
      (ts("2024-01-01 02:00:00"), 1L, "click"),
      (ts("2024-01-01 03:00:00"), 3L, "purchase"),
      (ts("2024-01-01 04:00:00"), 2L, "purchase"), // even user: filtered out
      (ts("2024-01-02 01:00:00"), 1L, "click"),
      (ts("2024-01-02 02:00:00"), 3L, "click"),
      (ts("2024-01-02 03:00:00"), 5L, "purchase"),
      (ts("2024-01-04 00:30:00"), 1L, "click"))    // carrier, lands in day 4
      .toDF("ts", "user_id", "event_type")
      .write.mode("append").parquet(srcDir)
    run()                                          // first life
    // file 2 AFTER the stop: more day-4 events + a day-6 carrier — wm
    // advances to day-5 00:30, finalizing day 4 in the SECOND life
    Seq(
      (ts("2024-01-04 01:00:00"), 3L, "purchase"),
      (ts("2024-01-04 02:00:00"), 1L, "purchase"),
      (ts("2024-01-06 00:30:00"), 1L, "click"))    // carrier, day 6 stays open
      .toDF("ts", "user_id", "event_type")
      .write.mode("append").parquet(srcDir)
    run()                                          // second life
    val resumed = decisions.last
    // uninterrupted reference: the same finalized days {1, 2, 4} folded
    // through the SAME shared finisher
    val ref = graft.operators.RoundNineOps.sprtFromDays(Seq(
      ("2024-01-01", 3L, 2L),
      ("2024-01-02", 3L, 1L),
      ("2024-01-04", 3L, 2L)).toDF("day", "n", "x")).collect().toSeq
    assert(resumed == ref,
      s"restarted SPRT table diverged:\n got $resumed\n ref $ref")
    // the pre-crash days 1-2 can only be present via the durable state:
    // the second life's micro-batches emitted day 4 alone
    assert(resumed.map(_.getString(0)) == Seq("2024-01-01", "2024-01-02", "2024-01-04"))
  }
}
