package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming THROTTLE — at most one kept event per (user, type) per
  * window, measured from the last KEPT event: an event passes iff its
  * event time is > `last_kept + window`. This is the stateful shape the
  * batch debounce (q87, `Sessions.q87`) deliberately is NOT: q87's
  * lag-form compares each event to the previous RAW event (a burst
  * extends while activity continues), while the throttle's window is
  * anchored to the last event that actually PASSED — "at most N per
  * hour" rate limiting, alert suppression, notification capping. That
  * anchoring is a running fold over the kept-set, inexpressible as a
  * fixed-frame window function, hence `flatMapGroupsWithState`.
  *
  * Scale posture: one shuffle on the group key; state is ONE timestamp
  * per key with an event-time timeout — once the watermark passes
  * `last_kept + window` the state is removed, because any later
  * in-watermark event would be kept regardless (timeout-as-cleanup is
  * semantics-preserving, not a heuristic); state size is bounded by
  * keys active within one window, not total keys ever seen.
  *
  * Ordering caveat (inherent to streaming): events are folded in
  * event-time order WITHIN a micro-batch, and cross-batch late arrivals
  * beyond the watermark are dropped — an in-delay straggler that lands
  * in a later batch is throttled against state as of ITS batch. The
  * batch twin over the full log is the exact-order reference.
  */
object Throttle extends Serializable {

  final case class Ev(user_id: Long, event_type: String, ts: Timestamp,
                      value: Double)
  final case class Kept(user_id: Long, event_type: String, ts_ms: Long,
                        value: Double)
  // not private: the state encoder's generated code instantiates it
  final case class LastKept(ms: Long)

  /** The throttle's core as a pure fold (property-tested in
    * ThrottleLawsProps): given event times in ascending order and the
    * carried last-kept time, returns (kept times, new last-kept).
    * Greedy earliest-first selection — keep t iff t > last + window. */
  private[graft] def foldKept(sortedTimes: Seq[Long], lastKept: Option[Long],
                              windowMs: Long): (Seq[Long], Option[Long]) = {
    val out = Seq.newBuilder[Long]
    var last = lastKept
    sortedTimes.foreach { t =>
      if (last.forall(t > _ + windowMs)) { out += t; last = Some(t) }
    }
    (out.result(), last)
  }

  /** Append-mode throttle over a streaming Dataset[Ev]. */
  def throttled(events: Dataset[Ev], windowSeconds: Long,
                delay: String = "0 seconds"): Dataset[Kept] = {
    val spark = events.sparkSession
    import spark.implicits._
    val windowMs = windowSeconds * 1000L

    def fn(key: (Long, String), evs: Iterator[Ev],
           state: GroupState[LastKept]): Iterator[Kept] = {
      if (state.hasTimedOut) {
        // watermark passed last_kept + window: every future on-time
        // event clears the throttle anyway — drop the state record
        state.remove()
        Iterator.empty
      } else {
        val sorted = evs.toArray.sortBy(e => (e.ts.getTime, e.value))
        val (kept, last) =
          foldKept(sorted.map(_.ts.getTime), state.getOption.map(_.ms), windowMs)
        val keptSet = kept.toSet
        // ties on ts: foldKept keeps ONE timestamp; emit the first
        // sorted event carrying it (the (ts, value) sort makes it unique)
        val out = Array.newBuilder[Kept]
        val seen = scala.collection.mutable.Set[Long]()
        sorted.foreach { e =>
          val t = e.ts.getTime
          if (keptSet.contains(t) && !seen.contains(t)) {
            seen += t
            out += Kept(key._1, key._2, t, e.value)
          }
        }
        last.foreach { ms =>
          state.update(LastKept(ms))
          state.setTimeoutTimestamp(ms + windowMs)
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", delay)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
