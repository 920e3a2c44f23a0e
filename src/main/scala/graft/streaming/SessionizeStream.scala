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
  /** State times are MICROSECONDS since epoch: Timestamp.getTime truncates
    * to ms, which would shift µs-grained gap boundaries vs the batch form. */
  case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, inicio: Timestamp, fin: Timestamp,
                        n_eventos: Long, imp_valor: Double)

  /** Epoch microseconds of a Timestamp, exact. */
  private[streaming] def micros(t: Timestamp): Long =
    (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000

  /** Timestamp from epoch microseconds, exact. */
  private[streaming] def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** First whole millisecond strictly after the session's expiry instant —
    * the event-time timeout registered with the state store (ms API). */
  private[streaming] def timeoutMs(endUs: Long, gapUs: Long): Long =
    Math.floorDiv(endUs + gapUs, 1000L) + 1L

  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, toTs(s.startUs), toTs(s.endUs), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if t - s.endUs <= gapUs =>
                  open = Some(s.copy(endUs = math.max(s.endUs, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(user, toTs(s.startUs), toTs(s.endUs), s.n, s.sum)
                  open = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(timeoutMs(s.endUs, gapUs))
            }
            closed.result().iterator
          }
      }
  }
}
