package graft.streaming

import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.streaming.GroupState

/** Custom-state sessionization for Structured Streaming
  * (`flatMapGroupsWithState`) — the reference's training-session grouping
  * (`trainer/flax.ipynb` cells 16/18 `app.run` scoping) generalized to
  * event-time sessions with a gap timeout.
  *
  * State per user: the currently-open session. Each micro-batch folds its
  * (unordered) events in event-time order: events within [[GapMicros]] of the
  * open session extend it; a larger gap closes-and-emits the session and
  * opens a new one. The open session registers an event-time timeout at
  * `end + gap`, so the engine emits it once the watermark passes — bounded
  * state, no full-stream buffering, exactly the semantics of the
  * oracle-checked gaps-and-islands batch twin (`stream_session_windows`).
  */
object Sessionize {
  val GapMicros: Long = 30L * 60 * 1000000

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class OpenSession(startUs: Long, endUs: Long, n: Long)
  case class Session(user_id: Long, s_start: String, s_end: String, n: Long)

  private val fmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(ZoneOffset.UTC)

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def fmtUs(v: Long): String =
    fmt.format(java.time.Instant.ofEpochSecond(
      Math.floorDiv(v, 1000000L), Math.floorMod(v, 1000000L) * 1000))

  private def toOut(userId: Long, s: OpenSession): Session =
    Session(userId, fmtUs(s.startUs), fmtUs(s.endUs), s.n)

  def apply(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (events.isEmpty && state.hasTimedOut) {
      // Watermark passed end+gap: the open session can never grow again.
      val out = state.getOption.map(toOut(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toArray.sortBy(e => (us(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    for (e <- sorted) {
      val t = us(e.ts)
      open match {
        case Some(s) if t - s.endUs < GapMicros =>
          open = Some(OpenSession(s.startUs, math.max(s.endUs, t), s.n + 1))
        case Some(s) =>
          closed += toOut(userId, s)
          open = Some(OpenSession(t, t, 1))
        case None =>
          open = Some(OpenSession(t, t, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp((s.endUs + GapMicros) / 1000) // millis
    }
    closed.result().iterator
  }
}
