package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state (§2.12 parity-plus; SURVEY §7.1 step 6's
  * "watermarks + windowed aggs + mapGroupsWithState" surface):
  * gap-based sessionization over an event stream via
  * `flatMapGroupsWithState` with an EVENT-TIME timeout.
  *
  * Semantics: consecutive events of a user belong to one session while
  * inter-event gaps stay ≤ `gapSeconds`; a session closes either when a
  * later event of the same user arrives past the gap (emitted in that
  * batch) or when the WATERMARK passes `last_event + gap` (emitted by
  * the state timeout — no per-key polling, no driver involvement).
  *
  * Scale posture: state is one small fixed-size record per OPEN session
  * (not per event); the stream shuffles once on user_id; closed state is
  * removed eagerly, and the watermark bounds both state size and
  * lateness. This is the canonical shape for billions of keys — the
  * state store scales with concurrently-open sessions only.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long, value_sum: Double)

  /** Append-mode sessionizer. Input must be a streaming Dataset[Ev];
    * `delay` is the late-data tolerance handed to the watermark. */
  def sessions(events: Dataset[Ev], gapSeconds: Long,
               delay: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, s.startMs, s.lastMs, s.n, s.sum))
      } else {
        // within one micro-batch events are unordered; fold in time order
        val sorted = evs.toArray.sortBy(_.ts.getTime)
        val out = Array.newBuilder[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              cur = Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value))
            case Some(s) =>
              out += Session(userId, s.startMs, s.lastMs, s.n, s.sum)
              cur = Some(OpenSession(t, t, 1L, e.value))
            case None =>
              cur = Some(OpenSession(t, t, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup at ingest (the streaming form of q22's
    * dedup-by-digest): duplicates of `keyCols` arriving within the
    * watermark horizon are dropped; state for a key is released once the
    * watermark passes it — bounded state, unlike a plain
    * `dropDuplicates` whose key set only grows. The LLM-ingest shape:
    * key on the content digest, dedup before anything expensive runs. */
  def dedupWithinWatermark(events: Dataset[Ev], delay: String,
                           keyCols: Seq[String] = Seq("user_id", "value")): Dataset[Ev] =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keyCols)
}
