package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Online one-sided CUSUM drift alarms for Structured Streaming
  * (`flatMapGroupsWithState`) — the streaming twin of the batch custom
  * operator `graft.plans.Cusum` behind `window_cusum_alert` (the same
  * batch/streaming duality the sessionizer family has: one state machine,
  * proven against the declarative batch form).
  *
  * State per user: the running clamped sum S_t = max(0, S_{t-1} + (x_t −
  * [[K]])) plus the last-seen event time. Each micro-batch folds its
  * (unordered) events in event-time order; an ALARM ONSET — S crossing
  * [[H]] from at-or-below — emits IMMEDIATELY in-batch (append mode), so
  * the emitted set never depends on watermark edge semantics: the
  * event-time timeout exists only to GARBAGE-COLLECT state for users idle
  * past [[IdleMicros]] (bounded state at 100 TB — a user's state is two
  * scalars, and dead keys age out; nothing is emitted on timeout).
  *
  * Exactness: the fold is the identical max(0, s + (x − k)) double chain
  * the batch CusumExec and the DuckDB recursive-CTE oracle evaluate —
  * bit-exact across engines; the 6-dp presentation round happens in the
  * DataFrame AFTER the state machine (Spark's own `round`), never here.
  */
object CusumAlert {
  /** Page-test drift allowance (same k as `window_cusum_alert`). */
  val K: Double = 60.0

  /** Alarm threshold h (same as `window_cusum_alert`). */
  val H: Double = 300.0

  /** Event-time idle horizon after which a user's state is dropped. */
  val IdleMicros: Long = 24L * 3600 * 1000000

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      value: Double)
  case class St(s: Double, lastUs: Long)
  case class Alarm(user_id: Long, event_id: Long, cusum: Double)

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  def apply(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[St]): Iterator[Alarm] = {
    if (events.isEmpty && state.hasTimedOut) {
      // Watermark passed lastSeen + idle horizon: GC only, no emission.
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toArray.sortBy(e => (us(e.ts), e.event_id))
    var st = state.getOption.getOrElse(St(0.0, Long.MinValue))
    val out = Seq.newBuilder[Alarm]
    for (e <- sorted) {
      val prev = st.s
      val s = math.max(0.0, prev + (e.value - K))
      if (s > H && prev <= H) out += Alarm(userId, e.event_id, s)
      st = St(s, math.max(st.lastUs, us(e.ts)))
    }
    state.update(st)
    state.setTimeoutTimestamp((st.lastUs + IdleMicros) / 1000) // millis
    out.result().iterator
  }
}
