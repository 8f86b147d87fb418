package graft.streaming

import graft.SparkSpec
import graft.streaming.StatefulSessions.{Event, OpenSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = StatefulSessions.gapMicros(1800)

  test("foldEvents: gap splits sessions, state carries the open one") {
    val events = Seq(Event(1, 0L), Event(1, 60_000_000L), Event(1, 4_000_000_000L))
    val (closed, open) = StatefulSessions.foldEvents(1L, events, None, Gap)
    assert(closed.map(s => (s.nEvents, s.durationMicros)) == Seq((2L, 60_000_000L)))
    assert(open.contains(OpenSession(4_000_000_000L, 4_000_000_000L, 1)))
  }

  test("foldEvents resumes an open session from state across batches") {
    val open0 = Some(OpenSession(0L, 100_000_000L, 3))
    val (closed, open) = StatefulSessions.foldEvents(
      1L, Seq(Event(1, 100_000_000L + Gap)), open0, Gap)
    assert(closed.isEmpty) // still within gap → extended, not closed
    assert(open.get.nEvents == 4)
  }

  test("streaming end-to-end: sessions emitted as batches arrive") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulSessions.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    // batch 1: one burst, then a far-later event → first session closes
    input.addData(Event(1, 0L), Event(1, 1_000_000L), Event(1, 10_000_000_000L))
    q.processAllAvailable()
    // batch 2: another far jump closes the second session
    input.addData(Event(1, 20_000_000_000L))
    q.processAllAvailable()
    val got = spark.table("sessions_out")
      .as[StatefulSessions.SessionSummary].collect().sortBy(_.startMicros)
    q.stop()
    assert(got.map(s => (s.startMicros, s.nEvents)).toSeq ==
      Seq((0L, 2L), (10_000_000_000L, 1L)))
  }
}
