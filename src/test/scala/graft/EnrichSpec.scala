package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Enrich
import graft.streaming.Enrich.Event

/** Stream-static enrichment via the refreshable (foreachBatch) mode:
  * broadcast left join per micro-batch, missing dims survive as nulls,
  * and a dim OVERWRITE between batches is visible to the next batch
  * without a query restart — the slowly-changing-dimension contract. */
class EnrichSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Base = 10000000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)

  test("each batch joins the dim as of that batch; nulls for missing users") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val base = java.nio.file.Files.createTempDirectory("enrich").toString
    val dimDir = s"$base/dim"
    val outDir = s"$base/out"
    Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
      .write.mode("overwrite").parquet(dimDir)

    val events = MemoryStream[Event]
    val query = Enrich.refreshableEnriched(spark, events.toDS(), dimDir, outDir).start()
    try {
      events.addData(Event(1, 100, ts(1), 1.0), Event(3, 101, ts(2), 2.0))
      query.processAllAvailable()
      val batch1 = spark.read.parquet(outDir).collect()
        .map(r => r.getLong(1) -> Option(r.getString(4))).toMap
      assert(batch1 === Map(100L -> Some("gold"), 101L -> None))

      // dim refresh between batches: user 3 appears, user 1 upgrades
      Seq((1L, "platinum"), (3L, "gold")).toDF("user_id", "segment")
        .write.mode("overwrite").parquet(dimDir)
      events.addData(Event(1, 102, ts(3), 3.0), Event(3, 103, ts(4), 4.0))
      query.processAllAvailable()
      val all = spark.read.parquet(outDir).collect()
        .map(r => r.getLong(1) -> Option(r.getString(4))).toMap
      assert(all(102L) === Some("platinum"), "dim refresh must reach the next batch")
      assert(all(103L) === Some("gold"))
      // batch-1 rows are untouched history (append sink)
      assert(all(100L) === Some("gold") && all(101L) === None)
    } finally query.stop()
  }
}
