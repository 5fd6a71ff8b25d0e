package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dml.events.Event

/** Streaming forms of the pipeline operators whose batch versions live in
  * the catalog (exact dedup, sessionization): `readStream → transform →
  * writeStream` with watermarks bounding all state — the only shape that
  * survives an unbounded 100 TB/day ingest.
  */
object StreamingPipeline {

  /** Ingestion dedup on the event id. `dropDuplicatesWithinWatermark`
    * keeps an id in state only until the watermark passes it, so state is
    * bounded by (ingest rate × watermark), not by history — the unbounded
    * `dropDuplicates` would OOM a long-running stream. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes")
      : DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** A closed user session (emitted once the gap passes or event-time
    * timeout fires). */
  final case class Session(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, value_sum: Double)

  /** Open-session state carried between micro-batches. */
  final case class SessState(start: Long, last: Long, n: Long, sum: Double)

  /** Streaming gap sessionizer — the stateful twin of the batch
    * `q_events_sessions` plan, via `flatMapGroupsWithState`: per-user state
    * is one open session; events extend it, a gap closes and emits it, and
    * the event-time timeout flushes sessions for users who went quiet.
    * State is one small record per active user — bounded by concurrent
    * users, independent of history. */
  def sessionizeStream(
      events: Dataset[Event], gapSeconds: Long = 6 * 3600,
      watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def close(uid: Long, s: SessState): Session =
      Session(uid, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.last), s.n, s.sum)

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _)).iterator
            state.remove()
            out
          } else {
            // micro-batches are unordered within a group: restore time order
            // (ts unique per user in the event log contract)
            val evs = it.toArray.sortBy(_.ts.getTime)
            val closed = Vector.newBuilder[Session]
            var open = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t < s.start - gapMs =>
                  // a late event more than a gap BEFORE the open session is
                  // its own earlier session — emit it closed (any event that
                  // could have extended it would itself be late by now)
                  closed += close(uid, SessState(t, t, 1, e.value))
                case Some(s) if t - s.last > gapMs =>
                  closed += close(uid, s)
                  open = Some(SessState(t, t, 1, e.value))
                case Some(s) =>
                  // a late-but-within-gap-of-start event extends backwards;
                  // anything else extends forwards
                  open = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case None =>
                  open = Some(SessState(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
