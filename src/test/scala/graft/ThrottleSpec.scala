package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Throttle
import graft.streaming.Throttle.{Ev, Kept}

/** Streaming throttle: window anchored to the last KEPT event (the
  * semantics q87's lag-based debounce cannot express), state carried
  * across micro-batches, independent keys throttled independently. */
class ThrottleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // offset away from epoch 0: the initial watermark is 0 and events at
  // or before it are dropped as late
  private val Base = 1000000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)
  private def ms(sec: Long) = (Base + sec) * 1000L

  test("keeps one event per 30s window measured from the last KEPT event") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Ev]
    val query = Throttle.throttled(input.toDS(), windowSeconds = 30)
      .writeStream.format("memory").queryName("throttle_out")
      .outputMode("append").start()
    try {
      // 0 kept; 25 dropped (within 0+30); 52 KEPT: 52 > 0+30 even though
      // it is only 27s after the previous RAW event — the exact case
      // where throttle (anchor = last kept) and debounce (anchor =
      // previous raw) disagree, q87's doc caveat made executable
      input.addData(Ev(1, "click", ts(0), 1.0), Ev(1, "click", ts(25), 2.0),
        Ev(1, "click", ts(52), 3.0),
        // independent key: same user, different type — its own throttle
        Ev(1, "view", ts(26), 4.0))
      query.processAllAvailable()
      val batch1 = s.table("throttle_out").as[Kept].collect().toSet
      assert(batch1 === Set(
        Kept(1, "click", ms(0), 1.0),
        Kept(1, "click", ms(52), 3.0),
        Kept(1, "view", ms(26), 4.0)), s"got $batch1")

      // cross-batch state: last kept for (1, click) is 52 —
      // 80 is within 52+30 (dropped), 83 clears it (kept)
      input.addData(Ev(1, "click", ts(80), 5.0), Ev(1, "click", ts(83), 6.0))
      query.processAllAvailable()
      val all = s.table("throttle_out").as[Kept].collect().toSet
      assert(all === batch1 + Kept(1, "click", ms(83), 6.0), s"got $all")
    } finally query.stop()
  }

  test("ties within a batch fold deterministically; first of burst wins") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Ev]
    val query = Throttle.throttled(input.toDS(), windowSeconds = 10)
      .writeStream.format("memory").queryName("throttle_tie_out")
      .outputMode("append").start()
    try {
      // same timestamp: (ts, value) sort keeps the lower value, exactly one
      input.addData(Ev(7, "view", ts(5), 2.0), Ev(7, "view", ts(5), 1.0))
      query.processAllAvailable()
      val out = s.table("throttle_tie_out").as[Kept].collect().toSeq
      assert(out === Seq(Kept(7, "view", ms(5), 1.0)), s"got $out")
    } finally query.stop()
  }
}
