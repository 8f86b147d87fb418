package graft.status

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Status state machine (SURVEY.md §1.1, §2.8 V5; status_utils.py:50-127
  * `Statuses`/`ENTITY_STATUS_MAP`, status_manager.py:194-381
  * `StatusChanger`): entity statuses as a Scala ADT with per-entity-type
  * legality, an append-only `status_events` store, a latest-wins current
  * view, and transition guard rails (same-status suppression, unknown
  * status rejection) — the reference's imperative PUT-with-checks
  * becomes a deterministic event fold.
  */
object StatusMachine {

  sealed abstract class EntityType(val name: String)
  object EntityType {
    case object Dataset extends EntityType("dataset")
    case object Upload extends EntityType("upload")
    case object Publication extends EntityType("publication")
    val all: Seq[EntityType] = Seq(Dataset, Upload, Publication)
  }

  sealed abstract class Status(val name: String)
  object Status {
    case object New extends Status("new")
    case object Valid extends Status("valid")
    case object Invalid extends Status("invalid")
    case object Processing extends Status("processing")
    case object Submitted extends Status("submitted")
    case object Qa extends Status("qa")
    case object Published extends Status("published")
    case object Error extends Status("error")
    case object Hold extends Status("hold")
    case object Deprecated extends Status("deprecated")
    case object Reorganized extends Status("reorganized")
    val all: Seq[Status] = Seq(New, Valid, Invalid, Processing, Submitted,
      Qa, Published, Error, Hold, Deprecated, Reorganized)
    def parse(s: String): Option[Status] = all.find(_.name == s.toLowerCase.trim)
  }

  /** Which statuses are legal per entity type (ENTITY_STATUS_MAP shape —
    * status_utils.py:50-127: uploads can be Reorganized but not
    * Published/QA; datasets/publications the reverse).
    */
  val legalStatuses: Map[EntityType, Set[Status]] = {
    import EntityType._
    import Status._
    Map(
      Dataset -> Set(New, Valid, Invalid, Processing, Submitted, Qa, Published, Error, Hold, Deprecated),
      Upload -> Set(New, Valid, Invalid, Processing, Submitted, Error, Reorganized),
      Publication -> Set(New, Valid, Invalid, Processing, Submitted, Qa, Published, Error, Hold),
    )
  }

  def isLegal(e: EntityType, s: Status): Boolean = legalStatuses(e).contains(s)

  /** Guarded transition (status_manager.py:253-289): None = suppressed
    * no-op (same status), Left(reason) = rejected, Right(next) = apply.
    */
  def transition(e: EntityType, current: Option[Status], requested: String): Either[String, Option[Status]] =
    Status.parse(requested) match {
      case None => Left(s"unknown status '$requested'")
      case Some(s) if !isLegal(e, s) => Left(s"status '${s.name}' illegal for ${e.name}")
      case Some(s) if current.contains(s) => Right(None) // same-status suppression
      case Some(s) => Right(Some(s))
    }

  /** Stamp a raw event batch (uuid, entity_type, status) with event-store
    * metadata: the write path appends (ts, seq) so the read path can
    * resolve latest-wins deterministically. `ts` is caller-provided
    * (job event time, not wall clock) for reproducible folds.
    */
  def stampEvents(batch: DataFrame, tsMicros: Long, seqStart: Long = 0L): DataFrame =
    batch
      .withColumn("ts", lit(tsMicros))
      .withColumn("seq", lit(seqStart) + row_number().over(
        Window.orderBy("uuid", "entity_type", "status")) - 1)

  /** Append-only event-store schema: (uuid, entity_type, status, ts
    * [, seq]). Current status = latest-wins window (W3); `seq` breaks
    * same-ts ties when present (see [[stampEvents]]).
    */
  def currentStatuses(statusEvents: DataFrame): DataFrame = {
    val order =
      if (statusEvents.columns.contains("seq")) Seq(col("ts").desc, col("seq").desc)
      else Seq(col("ts").desc)
    val w = Window.partitionBy("uuid").orderBy(order: _*)
    statusEvents.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("uuid"), col("entity_type"), col("status"), col("ts").as("since"))
  }

  /** Validate a batch of requested status events against the current
    * view: returns (accepted, rejected-with-reason). Mirrors the
    * reference's guard rails as set logic instead of per-row HTTP.
    */
  def validateBatch(spark: SparkSession, requested: DataFrame, current: DataFrame): (DataFrame, DataFrame) = {
    // .toSeq first: flatMap on the Map would rebuild a Map and silently
    // dedupe (entity_type → one status)
    val legal = legalStatuses.toSeq.flatMap { case (e, ss) => ss.toSeq.map(s => (e.name, s.name)) }
    import spark.implicits._
    val legalDf = legal.toDF("entity_type", "status")
    val req = requested.withColumn("status", lower(trim(col("status"))))
    val cur = current.select(col("uuid"), col("status").as("current_status"))
    val joined = req.join(broadcast(legalDf.withColumn("is_legal", lit(true))),
        Seq("entity_type", "status"), "left")
      .join(cur, Seq("uuid"), "left")
    val rejected = joined.filter(col("is_legal").isNull)
      .select(col("uuid"), col("status"),
              concat(lit("illegal status for "), col("entity_type")).as("reason"))
    val accepted = joined.filter(col("is_legal").isNotNull &&
        (col("current_status").isNull || col("current_status") =!= col("status")))
      .drop("is_legal", "current_status")
    (accepted, rejected)
  }
}
