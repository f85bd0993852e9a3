package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit state — the streaming twin of the
  * batch `EventOps.sessionize` (q12): events for a user belong to one
  * session while consecutive gaps stay <= `gapSeconds`; a longer silence
  * closes the session.
  *
  * Batch can sessionize with a lag window because it sees all data at once.
  * A stream cannot — session boundaries depend on events that have not
  * arrived yet — so this is the canonical
  * `KeyValueGroupedDataset.flatMapGroupsWithState` shape:
  *
  *  - state per user = the OPEN session (start, last-seen, count): O(active
  *    users), not O(events) — bounded regardless of stream length;
  *  - an event-time timeout fires once the WATERMARK passes
  *    last-seen + gap, which is exactly the moment the batch definition can
  *    prove the session closed (no on-time event can extend it anymore);
  *  - closed sessions are emitted in Append mode, so the sink sees each
  *    session exactly once.
  *
  * Scale: state is hash-partitioned by user across executors; each
  * micro-batch shuffles only that batch's events. Late events beyond the
  * watermark are dropped by the watermark operator — the same contract as
  * every watermarked op in this engine (CandleStream/DocumentStream).
  */
object SessionStream {

  case class Event(user_id: Long, ts: Timestamp)

  /** The open session per user. Epoch seconds, like the batch op. */
  case class OpenSession(start: Long, last: Long, n: Long)

  case class ClosedSession(user_id: Long, session_start: Long, session_end: Long,
                           n_events: Long)

  /** events(user_id, ts) -> stream of CLOSED sessions (epoch-second bounds,
    * event count). `watermark` bounds both lateness and state lifetime.
    */
  def sessions(events: DataFrame, gapSeconds: Long = 1800L,
               watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .selectExpr("user_id", "ts")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFn(gapSeconds))
  }

  private def stateFn(gapSeconds: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // watermark passed last+gap: the batch definition proves this session
      // closed — emit and clear
      val s = state.get
      state.remove()
      Iterator.single(ClosedSession(userId, s.start, s.last, s.n))
    } else {
      // fold this micro-batch's events (sorted: arrival order within a
      // batch is not time order) into the open session, closing sessions
      // whose gap is exceeded WITHIN the batch
      val sorted = events.map(e => e.ts.getTime / 1000L).toArray
      java.util.Arrays.sort(sorted)
      val closed = Vector.newBuilder[ClosedSession]
      var acc = state.getOption
      sorted.foreach { t =>
        acc = acc match {
          case Some(a) if t - a.last <= gapSeconds =>
            // math.min on start: a late-but-within-watermark event from a
            // PREVIOUS batch may precede the open session's start — the
            // session must extend backwards to cover it (batch sessionize
            // would have started it there). An event more than gap before
            // the open span still folds in (the live-view approximation;
            // the batch reconciler owns exact history).
            Some(OpenSession(math.min(a.start, t), math.max(a.last, t), a.n + 1))
          case Some(a) =>
            closed += ClosedSession(userId, a.start, a.last, a.n)
            Some(OpenSession(t, t, 1L))
          case None =>
            Some(OpenSession(t, t, 1L))
        }
      }
      acc.foreach { a =>
        state.update(a)
        // close when the WATERMARK (not wall clock) passes last + gap
        state.setTimeoutTimestamp((a.last + gapSeconds) * 1000L + 1L)
      }
      closed.result().iterator
    }
  }
}
