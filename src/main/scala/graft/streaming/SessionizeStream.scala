package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Stateful streaming sessionizer — the streaming twin of
  * graft.operators.Sessionize (same gap semantics, incremental).
  *
  * Uses flatMapGroupsWithState keyed by user with event-time timeout:
  * state is one open session per user; an event either extends it or
  * closes it (emitting the closed session); the watermark-driven timeout
  * flushes sessions for idle users. State size is O(active users), not
  * O(events) — the property that keeps this viable on an unbounded stream.
  */
object SessionizeStream {
  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Long, end: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, inicio: Timestamp, fin: Timestamp,
                        n_eventos: Long, imp_valor: Double)

  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  open = Some(s.copy(end = math.max(s.end, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(user, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)
                  open = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
