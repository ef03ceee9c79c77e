package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IntervalJoin
import graft.streaming.IntervalJoin.{Click, Purchase}

/** Stream-stream interval join: a purchase matches exactly the same
  * user's clicks inside [purchase - 1h, purchase), across micro-batch
  * boundaries, and the watermarked interval bounds the join state. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // away from epoch 0 (initial watermark drops ts <= 0)
  private val Base = 10000000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)

  test("purchase joins same-user clicks from the preceding hour only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val query = IntervalJoin
      .purchasesWithPriorClicks(clicks.toDS(), purchases.toDS())
      .writeStream.format("memory").queryName("interval_out")
      .outputMode("append").start()
    try {
      // clicks arrive in an EARLIER batch than the purchase: the join
      // must match across batches via state, not within one batch
      clicks.addData(
        Click(1, ts(0)),       // 50 min before the purchase -> match
        Click(1, ts(2400)),    // 10 min before -> match
        Click(1, ts(3100)),    // 100 s AFTER the purchase -> no match
        Click(2, ts(2500)))    // other user -> no match
      query.processAllAvailable()
      purchases.addData(Purchase(1, 101L, ts(3000)))
      query.processAllAvailable()
      // a purchase >1h past user 2's click: interval excludes it
      purchases.addData(Purchase(2, 102L, ts(2500 + 3601)))
      query.processAllAvailable()

      val out = s.table("interval_out")
        .select("user_id", "event_id", "click_ts").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).sortBy(_._3.getTime)
      assert(out.toSeq === Seq(
        (1L, 101L, ts(0)),
        (1L, 101L, ts(2400))), s"got ${out.toSeq}")

      // the physical plan is the symmetric watermarked stream-stream join
      val plan = query.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
      assert(s.table("interval_out").schema.fieldNames.toSeq ===
        Seq("user_id", "event_id", "purchase_ts", "click_ts"))
      assert(plan.lastProgress == null ||
        plan.lastProgress.stateOperators.nonEmpty, "expected stateful join operators")
    } finally query.stop()
  }

  test("left outer: unmatched purchase emits null-padded ONLY after the " +
    "watermark proves no click can arrive") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val query = IntervalJoin
      .purchasesWithOptionalClicks(clicks.toDS(), purchases.toDS())
      .writeStream.format("memory").queryName("interval_outer_out")
      .outputMode("append").start()
    try {
      // user 1 purchases with a prior click; user 3 purchases with none
      clicks.addData(Click(1, ts(2400)))
      purchases.addData(Purchase(1, 201L, ts(3000)), Purchase(3, 301L, ts(3000)))
      query.processAllAvailable()
      val early = s.table("interval_outer_out")
        .select("event_id", "click_ts").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1))))
      // the matched row may emit now; the UNMATCHED one must NOT — at
      // this watermark, absence could still be lateness
      assert(!early.contains((301L, None)),
        s"null-padded row emitted before finalization: ${early.toSeq}")

      // advance the CLICK watermark far past purchase_ts 3000 — the
      // unmatched purchase is now a fact and must emit null-padded
      // (watermark trails by a batch: two adds)
      clicks.addData(Click(9, ts(20000)))
      query.processAllAvailable()
      clicks.addData(Click(9, ts(20001)))
      query.processAllAvailable()
      purchases.addData(Purchase(9, 999L, ts(30000))) // nudge the join along
      query.processAllAvailable()

      val out = s.table("interval_outer_out")
        .select("event_id", "click_ts").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)))).toSet
      assert(out.contains((201L, Some(ts(2400)))), s"matched row missing: $out")
      assert(out.contains((301L, None)), s"finalized null-padded row missing: $out")
    } finally query.stop()
  }
}
