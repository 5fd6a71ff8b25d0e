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
            // Classic interval merge over (prior open session + this
            // batch's events, time-sorted): any two intervals within the
            // gap fuse, so late in-batch events — including several older
            // than the open session — land in the right session instead of
            // fragmenting. Everything but the newest merged session is
            // emitted closed; cross-BATCH merging of already-emitted
            // sessions is the one thing this can't undo (emission happens
            // before the watermark passes — the price of prompt output).
            val intervals = (state.getOption.toSeq ++
              it.map(e => SessState(e.ts.getTime, e.ts.getTime, 1, e.value)))
              .sortBy(s => (s.start, s.last))
            val merged = intervals.foldLeft(Vector.empty[SessState]) {
              (acc, cur) =>
                acc.lastOption match {
                  case Some(p) if cur.start - p.last <= gapMs =>
                    acc.init :+ SessState(p.start,
                      math.max(p.last, cur.last), p.n + cur.n, p.sum + cur.sum)
                  case _ => acc :+ cur
                }
            }
            merged.lastOption.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            merged.dropRight(1).map(close(uid, _)).iterator
          }
      }
  }
}
