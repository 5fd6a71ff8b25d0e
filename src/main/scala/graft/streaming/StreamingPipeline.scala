package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

import graft.dml.events.Event
import graft.llm.Dedup

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

  /** Accumulating MinHash signature index for continuous near-dup
    * detection: each arriving batch is hashed ONCE, probed against
    * everything seen so far ([[Dedup.candidatesFromBuckets]] — the index
    * side pruned by the batch's band keys), then appended. State is the
    * signature table (bytes per doc-band, never the text); lineage is
    * truncated by eager localCheckpoint on every batch and the union chain
    * is re-checkpointed every `compactEvery` batches so the plan stays
    * constant-size over an unbounded stream. On a real cluster the index
    * would live in a storage table (append + bucketed by band_hash); this
    * in-memory form is the same algorithm with executor-resident blocks. */
  final class NearDupIndex(
      k: Int = 3, numHashes: Int = 8, bands: Int = 4,
      minEstJaccard: Double = 0.5, compactEvery: Int = 16) {
    private var index: Option[DataFrame] = None
    private var batches = 0

    /** Number of (doc, band) rows currently indexed. */
    def size: Long = synchronized { index.map(_.count()).getOrElse(0L) }

    /** Hash the batch once, return candidate pairs vs (index ∪ batch),
      * append the batch to the index. Thread-safe; the returned (lazy)
      * frame reads only checkpoint-backed inputs, so it remains valid
      * after the index advances past this batch. */
    def probeAndAppend(batchDocs: DataFrame): DataFrame = synchronized {
      val nb = Dedup.signatureIndex(batchDocs, k, numHashes, bands)
        .localCheckpoint(true)
      val cands = Dedup.candidatesFromBuckets(
        index.getOrElse(nb.limit(0)), nb, minEstJaccard)
      index = Some(index.map(_.unionAll(nb)).getOrElse(nb))
      batches += 1
      if (batches % compactEvery == 0) index = index.map(_.localCheckpoint(true))
      cands
    }
  }

  /** Continuous near-dup detection over a document stream (doc_id, text):
    * foreachBatch probes-and-appends the [[NearDupIndex]] and hands the
    * batch's candidate pairs (doc_a, doc_b, est_jaccard — at least one
    * side in the batch) to `onCandidates`. The only state Spark itself
    * holds is the streaming offset log (durable under `checkpointDir`);
    * the index is the operator's own bounded signature table. Pass
    * `Trigger.AvailableNow()` for drain-and-stop runs (tests, backfills);
    * the default processing-time trigger runs continuously. */
  def nearDupStream(
      docs: DataFrame, index: NearDupIndex,
      onCandidates: (Long, DataFrame) => Unit,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
      .outputMode("append")
      .queryName("near_dup_stream")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onCandidates(batchId,
          index.probeAndAppend(batch.select("doc_id", "text")))
        ()
      }
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start()
  }

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
