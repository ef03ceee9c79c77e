package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Ev, Session}

/** flatMapGroupsWithState sessionization: gap-splitting within a batch,
  * watermark-driven timeout across batches, state removal on close. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // offset away from epoch 0: the initial watermark is 0, and events at
  // or before the watermark are dropped as late
  private val Base = 1000000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)
  private def ms(sec: Long) = (Base + sec) * 1000L

  test("sessions split on gap, close on watermark timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Ev]
    val query = Sessionize.sessions(input.toDS(), gapSeconds = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two events 10s apart (one session), then one event past
      // the 30s gap in the SAME batch -> first session closes in-batch
      input.addData(Ev(1, ts(0), 1.0), Ev(1, ts(10), 2.0), Ev(1, ts(100), 4.0))
      query.processAllAvailable()
      val inBatch = s.table("sessions_out").as[Session].collect()
      assert(inBatch.toSeq === Seq(Session(1, ms(0), ms(10), 2, 3.0)))

      // advance the watermark far past 100s + gap via another key; the
      // open session (start 100s) must close via EVENT-TIME TIMEOUT.
      // (watermark advances one batch behind the data, hence two adds)
      input.addData(Ev(2, ts(1000), 5.0))
      query.processAllAvailable()
      input.addData(Ev(2, ts(1001), 5.0))
      query.processAllAvailable()
      val all = s.table("sessions_out").as[Session].collect().sortBy(x => (x.user_id, x.start_ms))
      assert(all.contains(Session(1, ms(100), ms(100), 1, 4.0)),
        s"timeout session missing: ${all.toSeq}")
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark drops in-horizon duplicates, keeps distinct") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Ev]
    val query = Sessionize.dedupWithinWatermark(input.toDS(), "1 minute")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts(0), 1.0), Ev(1, ts(5), 1.0),  // duplicate (user_id, value) pair
        Ev(1, ts(7), 2.0),                     // distinct value
        Ev(2, ts(3), 1.0))                     // distinct user
      query.processAllAvailable()
      val out = s.table("dedup_out").as[Ev].collect()
      assert(out.length === 3, s"got: ${out.toSeq}")
      assert(out.map(e => (e.user_id, e.value)).toSet ===
        Set((1L, 1.0), (1L, 2.0), (2L, 1.0)))
    } finally query.stop()
  }
}
