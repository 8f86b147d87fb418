package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize splits on gaps > threshold and numbers sessions") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:10:00")), // same session (10 min)
      (3L, 1L, ts("2024-01-01 01:00:00")), // new session (50 min gap)
      (4L, 2L, ts("2024-01-01 00:00:00")),
    ).toDF("event_id", "user_id", "ts")
    val got = LogPipeline.sessionize(ev)
      .select("user_id", "n_sessions", "n_events", "max_session_events")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 2L), (2L, 1L, 1L, 1L)))
  }

  test("sessionize boundary: exactly the gap stays in-session") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:30:00")), // exactly 1800s → NOT a break (strict >)
    ).toDF("event_id", "user_id", "ts")
    val got = LogPipeline.sessionize(ev).select("n_sessions").as[Long].head()
    assert(got == 1L)
  }

  test("extractAndJoin parses the numeric ref before the equi-join") {
    val ev = Seq((1L, """{"k": 7}""", 10.0), (2L, """{"k": 8}""", 20.0), (3L, "nope", 5.0))
      .toDF("event_id", "props", "value")
    val part = Seq((7L, "Brand#1"), (8L, "Brand#1"), (9L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    val got = LogPipeline.extractAndJoin(ev, part)
      .select("p_brand", "n_events", "total_value").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("Brand#1", 2L, 30.0)))
  }

  test("runningRevenue is per-supplier cumulative in cents") {
    val li = Seq(
      (1L, 100L, 1, ts("2024-01-01 00:00:00"), 10.0, 0.0),
      (1L, 100L, 2, ts("2024-01-02 00:00:00"), 20.0, 0.5),
      (2L, 200L, 1, ts("2024-01-01 00:00:00"), 5.0, 0.0),
    ).toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice", "l_discount")
    val got = LogPipeline.runningRevenue(li)
      .select("l_suppkey", "running_revenue").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)))
  }

  test("latestStatus returns one row per user with the newest event") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, 1L, ts("2024-02-01 00:00:00"), "error"),
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = LogPipeline.latestStatus(ev)
      .select("user_id", "last_status").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "error")))
  }
}
