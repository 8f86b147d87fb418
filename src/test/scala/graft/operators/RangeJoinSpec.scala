package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketedRangeJoin matches points in multi-bucket intervals exactly once, inclusive bounds") {
    val points = Seq(
      (1L, 101L, ts("2024-01-01 10:00:00")), // == interval start (inclusive)
      (1L, 102L, ts("2024-01-01 13:30:00")), // inside, 3 buckets later
      (1L, 103L, ts("2024-01-01 14:00:00")), // == interval end (inclusive)
      (1L, 104L, ts("2024-01-01 14:00:01")), // just past the end
      (2L, 201L, ts("2024-01-01 11:00:00")), // right time, wrong key
    ).toDF("user_id", "point_id", "err_ts")
    // one interval spanning 10:00..14:00 (5 hourly buckets)
    val intervals = Seq((1L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00")))
      .toDF("user_id", "iv_id", "session_start", "session_end")
    val got = RangeJoin.bucketedRangeJoin(points, intervals, "user_id",
        "err_ts", "session_start", "session_end")
      .select("point_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(101L, 102L, 103L))
  }

  test("touchAttribution: first/last touch inside the hour, purchase instant excluded") {
    def ev(id: Long, t: String, typ: String, user: Long = 1L) =
      (id, ts(t), user, typ, 0.0, "{}")
    val events = Seq(
      ev(1L, "2024-01-01 09:10:00", "view"),   // first touch
      ev(2L, "2024-01-01 09:40:00", "click"),  // last touch
      ev(3L, "2024-01-01 09:50:00", "error"),  // never a touch
      ev(4L, "2024-01-01 10:00:00", "purchase"),
      ev(5L, "2024-01-01 08:59:59", "signup"), // outside the hour window
      ev(6L, "2024-01-01 12:00:00", "purchase"), // no touches → no row
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RangeJoin.touchAttribution(events).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "view" && r(0).getString(1) == "click")
    assert(r(0).getLong(2) == 1L)
  }

  test("touchAttribution: a touch AT the purchase timestamp is excluded (strictly before)") {
    def ev(id: Long, t: String, typ: String) = (id, ts(t), 1L, typ, 0.0, "{}")
    val events = Seq(
      ev(1L, "2024-01-01 09:30:00", "view"),
      ev(2L, "2024-01-01 10:00:00", "click"), // same instant as purchase
      ev(3L, "2024-01-01 10:00:00", "purchase"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RangeJoin.touchAttribution(events).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "view" && r(0).getString(1) == "view")
  }

  test("positionalAttribution: U-shaped credits for 1-, 2- and 4-touch journeys") {
    def ev(id: Long, t: String, typ: String, user: Long) =
      (id, ts(t), user, typ, 0.0, "{}")
    val events = Seq(
      // user 1: 4-touch journey → 40/20/20/40
      ev(1L, "2024-01-01 09:10:00", "view", 1L),
      ev(2L, "2024-01-01 09:20:00", "click", 1L),
      ev(3L, "2024-01-01 09:30:00", "click", 1L),
      ev(4L, "2024-01-01 09:40:00", "signup", 1L),
      ev(5L, "2024-01-01 10:00:00", "purchase", 1L),
      // user 2: single touch → 100%
      ev(6L, "2024-01-01 09:30:00", "view", 2L),
      ev(7L, "2024-01-01 10:00:00", "purchase", 2L),
      // user 3: two touches → 50/50
      ev(8L, "2024-01-01 09:30:00", "view", 3L),
      ev(9L, "2024-01-01 09:40:00", "click", 3L),
      ev(10L, "2024-01-01 10:00:00", "purchase", 3L),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RangeJoin.positionalAttribution(events).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // view: u1 first 400000 + u2 solo 1000000 + u3 first 500000
    assert(r("view") == ((1900000L, 3L, 1L, 0L)))
    // click: u1 middles 100000+100000 + u3 last 500000
    assert(r("click") == ((700000L, 0L, 1L, 2L)))
    // signup: u1 last 400000
    assert(r("signup") == ((400000L, 0L, 1L, 0L)))
  }
}
