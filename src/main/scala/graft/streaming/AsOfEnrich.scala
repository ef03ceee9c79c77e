package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF enrichment — the streaming twin of the batch as-of
  * join (Relational q47): each arriving purchase is matched to the same
  * user's LATEST click at-or-before it, with full event-time
  * correctness under out-of-order arrival.
  *
  * Why not emit on arrival: a purchase seen now may still be preceded
  * (in EVENT time) by a click that arrives later. The only generally
  * correct answer is to buffer each purchase until the WATERMARK passes
  * its event time — at that point no earlier click can still arrive
  * (that is the watermark's contract), so the match is final. Purchases
  * are matched and emitted exactly once, in the batch where the
  * watermark crosses them (via data arrival or the event-time TIMEOUT —
  * no per-key polling).
  *
  * Match semantics mirror q47 exactly: latest click with click_ts <=
  * purchase_ts; at equal timestamps the click counts (q47's tag
  * ordering) and ties break toward the larger click_id (q47's
  * max-event_id dedup); a purchase with no prior click emits
  * asof_click = None (q47's LEFT join).
  *
  * Scale posture: one shuffle on user_id (the same key the batch form
  * windows on); state per user is the in-flight buffer only — purchases
  * ahead of the watermark, clicks ahead of the watermark, plus ONE
  * "floor" click (the latest at-or-before the watermark: every future
  * purchase has event time >= the watermark, so older clicks can never
  * be an as-of match again and are evicted). State is O(traffic inside
  * the watermark horizon) per user, not O(stream).
  */
object AsOfEnrich {

  final case class Click(user_id: Long, click_id: Long, ts: Timestamp)
  final case class Purchase(user_id: Long, event_id: Long, ts: Timestamp)
  final case class Enriched(user_id: Long, event_id: Long, ts_ms: Long,
                            asof_click: Option[Long])

  /** Internal tagged-union row (public: Spark's generated de/serializer
    * code instantiates it reflectively and cannot touch private types). */
  final case class Tagged(user_id: Long, id: Long, ts: Timestamp,
                          is_click: Boolean)
  /** (event_ms, id) buffers; clicks compacted per the floor rule. */
  final case class Buf(clicks: Vector[(Long, Long)],
                       purchases: Vector[(Long, Long)])

  private def fn(user: Long, it: Iterator[Tagged],
                 state: GroupState[Buf]): Iterator[Enriched] = {
    val prev = state.getOption.getOrElse(Buf(Vector.empty, Vector.empty))
    val incoming = if (state.hasTimedOut) Vector.empty else it.toVector
    val (inClicks, inPurch) = incoming.partition(_.is_click)
    val clicks = prev.clicks ++ inClicks.map(e => (e.ts.getTime, e.id))
    val purchases = prev.purchases ++ inPurch.map(e => (e.ts.getTime, e.id))
    val wm = state.getCurrentWatermarkMs()

    // final (watermark-passed) purchases: match and emit, in event order
    val (ready, pending) = purchases.partition(_._1 <= wm)
    val out = ready.sorted.map { case (pMs, pId) =>
      val m = clicks.filter(_._1 <= pMs)
      Enriched(user, pId, pMs, if (m.isEmpty) None else Some(m.max._2))
    }

    // evict clicks at-or-before the watermark down to the single floor
    // candidate (lexicographic max = latest ts, then largest id)
    val (liveC, oldC) = clicks.partition(_._1 > wm)
    val keptC = (if (oldC.nonEmpty) Vector(oldC.max) else Vector.empty) ++ liveC

    if (pending.isEmpty && keptC.isEmpty) state.remove()
    else {
      state.update(Buf(keptC, pending))
      // wake when the watermark crosses the earliest buffered purchase,
      // even if no further data arrives for this user. A clicks-only
      // buffer needs no timeout: it is already compact and purely
      // passive until a purchase shows up.
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
    }
    out.iterator
  }

  /** Append-mode as-of enrichment of two streaming inputs. `delay` is
    * the shared late-data tolerance handed to the watermark. */
  def enrich(clicks: Dataset[Click], purchases: Dataset[Purchase],
             delay: String = "0 seconds"): Dataset[Enriched] = {
    val spark = clicks.sparkSession
    import spark.implicits._
    clicks.map(c => Tagged(c.user_id, c.click_id, c.ts, is_click = true))
      .unionByName(
        purchases.map(p => Tagged(p.user_id, p.event_id, p.ts, is_click = false)))
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
