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
}
