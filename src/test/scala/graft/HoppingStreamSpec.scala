package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Throttle.Ev

/** q85's scaladoc claims hopping windows are "the batch form of the
  * sliding windows Structured Streaming runs — identical semantics".
  * This spec makes that claim executable: the SAME `window(ts, 3 days,
  * 1 day)` aggregate, run as a watermarked append-mode stream, must
  * emit exactly the rows the batch plan computes for every window the
  * watermark has closed. */
class HoppingStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val DayMs = 86400L * 1000L
  // away from epoch 0 (initial watermark drops ts <= 0); epoch-aligned
  // so window starts land on day boundaries in both plans
  private def ts(day: Long, hourOff: Long = 12): Timestamp =
    new Timestamp(day * DayMs + hourOff * 3600L * 1000L)

  private val events = Seq(
    Ev(1, "view", ts(100), 1.0), Ev(2, "view", ts(100, 20), 2.0),
    Ev(1, "purchase", ts(101), 10.0), Ev(3, "view", ts(102), 3.0),
    Ev(2, "purchase", ts(102, 1), 20.0), Ev(1, "view", ts(103), 4.0))

  private def hopping(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(window(col("ts"), "3 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))

  test("streamed hopping aggregate == batch hopping aggregate for closed windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Ev]
    val query = hopping(input.toDS().withWatermark("ts", "0 seconds").toDF())
      .writeStream.format("memory").queryName("hopping_out")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      // flush: push the watermark far past every window end (watermark
      // trails the max seen event time by one batch, hence two adds)
      input.addData(Ev(99, "view", ts(200), 0.0))
      query.processAllAvailable()
      input.addData(Ev(99, "view", ts(201), 0.0))
      query.processAllAvailable()

      val streamed = s.table("hopping_out")
        .filter(col("w_start") < lit(ts(110))) // exclude the flush events' windows
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = hopping(events.toDF())
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === batch,
        s"stream/batch divergence:\n streamed=$streamed\n batch=$batch")
      // sanity: every event lands in window/hop = 3 windows
      assert(batch.toSeq.map(_._3).sum === events.size * 3)
    } finally query.stop()
  }
}
