package graft.status

import graft.SparkSpec
import graft.status.StatusMachine.{EntityType, Status}

class StatusMachineSpec extends SparkSpec {
  import spark.implicits._

  test("transition guard rails: unknown, illegal, same-status, ok") {
    assert(StatusMachine.transition(EntityType.Dataset, None, "bogus").isLeft)
    assert(StatusMachine.transition(EntityType.Upload, None, "published").isLeft)
    assert(StatusMachine.transition(EntityType.Dataset, Some(Status.Qa), "QA") == Right(None))
    assert(StatusMachine.transition(EntityType.Dataset, Some(Status.New), "qa") == Right(Some(Status.Qa)))
  }

  test("currentStatuses is latest-wins per uuid") {
    val ev = Seq(
      ("u1", "dataset", "new", 1L, 1L),
      ("u1", "dataset", "qa", 2L, 2L),
      ("u1", "dataset", "published", 2L, 3L), // same ts → seq breaks tie
      ("u2", "upload", "valid", 5L, 4L),
    ).toDF("uuid", "entity_type", "status", "ts", "seq")
    val got = StatusMachine.currentStatuses(ev)
      .select("uuid", "status").as[(String, String)].collect().toMap
    assert(got == Map("u1" -> "published", "u2" -> "valid"))
  }

  test("write path output feeds the read path: stampEvents → currentStatuses") {
    val raw = Seq(
      ("u1", "upload", "reorganized"),
      ("c1", "dataset", "submitted")).toDF("uuid", "entity_type", "status")
    val stamped = StatusMachine.stampEvents(raw, tsMicros = 1000L)
    val cur = StatusMachine.currentStatuses(stamped)
      .select("uuid", "status").as[(String, String)].collect().toMap
    assert(cur == Map("u1" -> "reorganized", "c1" -> "submitted"))
  }

  test("validateBatch rejects illegal and suppresses same-status") {
    val requested = Seq(
      ("u1", "dataset", "qa"),        // ok (current=new)
      ("u2", "upload", "published"),  // illegal for upload
      ("u3", "dataset", "qa"),        // same-status → suppressed
    ).toDF("uuid", "entity_type", "status")
    val current = Seq(("u1", "new"), ("u3", "qa")).toDF("uuid", "status")
    val (accepted, rejected) = StatusMachine.validateBatch(spark, requested, current)
    assert(accepted.select("uuid").as[String].collect().toSeq == Seq("u1"))
    assert(rejected.select("uuid").as[String].collect().toSeq == Seq("u2"))
  }
}
