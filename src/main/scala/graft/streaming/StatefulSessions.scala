package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2.11 "custom state" —
  * `KeyValueGroupedDataset.flatMapGroupsWithState`): the streaming
  * counterpart of the batch gap-sessionizer (`LogPipeline.sessionize`).
  * Each user's open session lives in managed state; an event-time gap
  * or a processing-time timeout closes it and emits a summary row.
  *
  * State is per-key and tiny (one open session), so the operator scales
  * with the number of concurrent active users, not total history —
  * exactly what mapGroupsWithState is for at 100 TB/day event volumes.
  */
object StatefulSessions {

  final case class Event(userId: Long, tsMicros: Long)
  final case class OpenSession(startMicros: Long, lastMicros: Long, nEvents: Long)
  final case class SessionSummary(userId: Long, startMicros: Long, endMicros: Long,
                                  nEvents: Long, durationMicros: Long)

  def gapMicros(gapSeconds: Long): Long = gapSeconds * 1000000L

  /** The per-key transition function: fold sorted events into the open
    * session, emitting summaries whenever the gap splits. Pure —
    * testable without a stream.
    */
  def foldEvents(userId: Long, events: Seq[Event], open: Option[OpenSession],
                 gapUs: Long): (Seq[SessionSummary], Option[OpenSession]) = {
    val sorted = events.sortBy(_.tsMicros)
    var cur = open
    val out = Seq.newBuilder[SessionSummary]
    for (e <- sorted) {
      cur match {
        case Some(s) if e.tsMicros - s.lastMicros <= gapUs =>
          cur = Some(s.copy(lastMicros = e.tsMicros, nEvents = s.nEvents + 1))
        case Some(s) =>
          out += SessionSummary(userId, s.startMicros, s.lastMicros, s.nEvents,
            s.lastMicros - s.startMicros)
          cur = Some(OpenSession(e.tsMicros, e.tsMicros, 1))
        case None =>
          cur = Some(OpenSession(e.tsMicros, e.tsMicros, 1))
      }
    }
    (out.result(), cur)
  }

  /** Wire into a streaming Dataset[Event]. With `timeoutMinutes` set,
    * idle sessions close even when no further events arrive for the key
    * (production mode — note the timeout keeps the query scheduling
    * micro-batches, so `processAllAvailable` never drains; tests use
    * the NoTimeout default).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800L,
                 timeoutMinutes: Option[Int] = None): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMicros(gapSeconds)
    val timeoutConf = if (timeoutMinutes.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, SessionSummary](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(s =>
              SessionSummary(userId, s.startMicros, s.lastMicros, s.nEvents,
                s.lastMicros - s.startMicros))
            state.remove()
            closed.iterator
          } else {
            val (summaries, open) = foldEvents(userId, it.toSeq, state.getOption, gapUs)
            open match {
              case Some(s) =>
                state.update(s)
                timeoutMinutes.foreach(m => state.setTimeoutDuration(s"$m minutes"))
              case None => state.remove()
            }
            summaries.iterator
          }
      }
  }
}
