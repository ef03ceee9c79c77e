package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join — the streaming form of the batch range
  * join (q48): each purchase joins the same user's clicks from the
  * preceding hour, with BOTH streams watermarked so the join state is
  * bounded (§2.12's remaining classic after windowed aggs,
  * sessionization and dedup).
  *
  * Scale posture: Spark keeps each side's rows in the state store only
  * until the other side's watermark passes the interval bound — the
  * event-time condition `click in [purchase - 1h, purchase)` plus both
  * watermarks gives the planner an eviction bound on BOTH sides, so
  * state is O(traffic in the interval window), not O(stream). The join
  * shuffles both streams once on user_id, the same key the batch q48
  * bins on. An un-watermarked stream-stream join would grow state
  * forever; this shape is the one to copy.
  */
object IntervalJoin {

  final case class Click(user_id: Long, click_ts: Timestamp)
  final case class Purchase(user_id: Long, event_id: Long, purchase_ts: Timestamp)

  /** Inner interval join: (purchase, matching prior-hour click) rows.
    * `delay` is each side's late-data tolerance. */
  def purchasesWithPriorClicks(clicks: Dataset[Click], purchases: Dataset[Purchase],
                               delay: String = "0 seconds"): DataFrame =
    joined(clicks, purchases, delay, "inner")

  /** LEFT OUTER interval join — the attribution shape "every purchase,
    * with its prior-hour click IF any": a purchase that never matches
    * must still come out, but only once it CANNOT match anymore — the
    * engine holds the unmatched purchase in state and emits the
    * null-padded row when the click-side watermark passes
    * `purchase_ts` (the end of its interval), which is exactly the
    * watermark-finalization semantics append-mode outer joins need.
    * Until the watermark moves, absence is indistinguishable from
    * lateness; after it, absence is a fact. State bounds are the same
    * as the inner form — both sides evict at the interval horizon. */
  def purchasesWithOptionalClicks(clicks: Dataset[Click], purchases: Dataset[Purchase],
                                  delay: String = "0 seconds"): DataFrame =
    joined(clicks, purchases, delay, "left_outer")

  private def joined(clicks: Dataset[Click], purchases: Dataset[Purchase],
                     delay: String, joinType: String): DataFrame = {
    val c = clicks.withWatermark("click_ts", delay)
      .withColumnRenamed("user_id", "c_user")
    val p = purchases.withWatermark("purchase_ts", delay)
    p.join(
      c,
      expr(
        """user_id = c_user AND
          |click_ts >= purchase_ts - INTERVAL 1 HOUR AND
          |click_ts < purchase_ts""".stripMargin),
      joinType)
      .select(col("user_id"), col("event_id"), col("purchase_ts"), col("click_ts"))
  }
}
