package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row for key 20
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "a"),
      (10L, ts("2024-01-01 10:00:00"), "b"), // equal ts -> included (<=)
      (10L, ts("2024-01-01 11:00:00"), "c"),
      (20L, ts("2024-01-01 09:30:00"), "z"),
    ).toDF("user_id", "ts", "tag")
    val got = AsOfJoin.asOfJoin(left, right, "user_id", "ts", "ts", carry = Seq("tag"))
      .selectExpr("event_id", "asof.tag")
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("b"), 2L -> Some("c"), 3L -> None))
  }
  test("null right timestamps never match (no-prior rows stay null)") {
    val left = Seq((1L, 10L, ts("2024-01-01 08:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Option.empty[Timestamp], "poison"),
      (10L, Some(ts("2024-01-01 09:00:00")), "later"),
    ).toDF("user_id", "ts", "tag")
    val got = AsOfJoin.asOfJoin(left, right, "user_id", "ts", "ts", carry = Seq("tag"))
      .selectExpr("event_id", "asof.tag").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> None))
  }
}