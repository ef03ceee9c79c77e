package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AsOfEnrich
import graft.streaming.AsOfEnrich.{Click, Enriched, Purchase}

/** Streaming as-of enrichment (q47's twin): purchases match the latest
  * prior click with event-time correctness ACROSS micro-batches — a
  * click arriving in a later batch than the purchase it precedes must
  * still win, and matches only finalize once the watermark passes. */
class AsOfEnrichSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // offset away from epoch 0: the initial watermark is 0 and events at
  // or before it would be late
  private val Base = 1000000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)
  private def ms(sec: Long) = (Base + sec) * 1000L

  test("cross-batch out-of-order click wins; matches finalize on watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val query = AsOfEnrich.enrich(clicks.toDS(), purchases.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    def got() = s.table("asof_out").as[Enriched].collect()
      .filter(_.user_id == 1).toSet
    try {
      // batch 0: click c1@10, purchase p1@20 — watermark still 0, so
      // NOTHING may be emitted yet (a later batch could still deliver a
      // click between 10 and 20)
      clicks.addData(Click(1, 101, ts(10)))
      purchases.addData(Purchase(1, 201, ts(20)))
      query.processAllAvailable()
      assert(got().isEmpty, s"premature emit: ${got()}")

      // batch 1: the OUT-OF-ORDER click c2@15 arrives after p1 did
      // (watermark is 20-10=10, so 15 is still in-horizon), plus c3@25
      // and p2@30. Watermark during this batch is 10: still nothing
      // final. After it: 30-10=20 — p1@20's timeout needs wm > 20.
      clicks.addData(Click(1, 102, ts(15)), Click(1, 103, ts(25)))
      purchases.addData(Purchase(1, 202, ts(30)))
      query.processAllAvailable()
      assert(got().isEmpty, s"premature emit: ${got()}")

      // push the watermark to 35-10=25 via another key: p1@20 finalizes
      // BY TIMEOUT and must match the late-arriving c2@15 — not c1@10
      // it saw first; p2@30 (> 25) must still be pending
      clicks.addData(Click(99, 999, ts(35)))
      query.processAllAvailable()
      assert(got() === Set(Enriched(1, 201, ms(20), Some(102))))

      // p3@40 arrives; push the watermark past everything (60-10=50):
      // p2@30 matches c3@25, p3@40 matches c3 too (latest prior)
      purchases.addData(Purchase(1, 203, ts(40)))
      clicks.addData(Click(99, 998, ts(60)))
      query.processAllAvailable()
      assert(got() === Set(
        Enriched(1, 201, ms(20), Some(102)),
        Enriched(1, 202, ms(30), Some(103)),
        Enriched(1, 203, ms(40), Some(103))))
    } finally query.stop()
  }

  test("no prior click -> None; equal-ts click counts; max id tie-break") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val query = AsOfEnrich.enrich(clicks.toDS(), purchases.toDS())
      .writeStream.format("memory").queryName("asof_out2")
      .outputMode("append").start()
    try {
      // p1@10 has no prior click; p2@20 ties with two clicks AT 20 —
      // q47 semantics: the equal-ts click matches, larger click_id wins
      purchases.addData(Purchase(1, 201, ts(10)), Purchase(1, 202, ts(20)))
      clicks.addData(Click(1, 55, ts(20)), Click(1, 56, ts(20)))
      query.processAllAvailable()
      // advance the watermark twice (it trails the data by one batch)
      clicks.addData(Click(99, 1, ts(50)))
      query.processAllAvailable()
      clicks.addData(Click(99, 2, ts(51)))
      query.processAllAvailable()
      val got = s.table("asof_out2").as[Enriched].collect()
        .filter(_.user_id == 1).toSet
      assert(got === Set(
        Enriched(1, 201, ms(10), None),
        Enriched(1, 202, ms(20), Some(56))))
    } finally query.stop()
  }
}
