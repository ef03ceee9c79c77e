package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable

/** The kappa loop end to end: streamed events land as EXACTLY-ONCE txn
  * commits ([[TxnTable.appendBatch]]), each commit's change feed folds
  * into the maintained daily aggregate ([[Materialized.maintainFromFeed]]
  * — no recompute anywhere), and after every micro-batch the aggregate
  * equals a from-scratch recompute of the raw table. Ingestion,
  * transactional storage, CDC, and incremental view maintenance in one
  * running pipeline — the architecture the individual specs certify
  * piecewise, proven composed. */
class StreamingKappaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stream -> txn commits -> feed-maintained aggregate == recompute") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val base = Files.createTempDirectory("kappa").toString
    val (rawRoot, aggRoot, ckpt) = (s"$base/raw", s"$base/agg", s"$base/ckpt")

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("day", date_format($"ts", "yyyy-MM-dd"))
        .groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(graft.Det.cents($"value")).as("sum_cents"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    // bootstrap: an empty-history start is just "overwrite with batch 0"
    val seed = Seq(("2024-01-01", "a", 1.0))
      .toDF("d", "event_type", "value")
      .select(to_timestamp($"d").as("ts"), $"event_type", $"value")
    TxnTable.overwrite(spark, rawRoot, seed)
    TxnTable.overwrite(spark, aggRoot, agg(TxnTable.read(spark, rawRoot)))
    var cursor = TxnTable.versions(spark, rawRoot).last

    val input = MemoryStream[(String, String, Double)]
    val query = input.toDS().toDF("d", "event_type", "value")
      .select(to_timestamp($"d").as("ts"), $"event_type", $"value")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        TxnTable.appendBatch(ss, rawRoot, batch, batchId).foreach { snap =>
          // one feed window per commit; the cursor is the consumer state
          Materialized.maintainFromFeed(ss, rawRoot, aggRoot, cursor, snap.version)
          cursor = snap.version
        }
      }
      .start()
    try {
      input.addData(("2024-01-01", "a", 2.0), ("2024-01-02", "b", 3.0))
      query.processAllAvailable()
      assert(rows(TxnTable.read(spark, aggRoot)) ===
        rows(agg(TxnTable.read(spark, rawRoot))),
        "after batch 0 the maintained aggregate must equal recompute")

      input.addData(("2024-01-02", "b", 0.25), ("2024-01-03", "c", 9.0))
      query.processAllAvailable()
      assert(rows(TxnTable.read(spark, aggRoot)) ===
        rows(agg(TxnTable.read(spark, rawRoot))),
        "after batch 1 the maintained aggregate must equal recompute")

      // mid-stream MERGE-ON-READ erasure on the raw table (the GDPR
      // path): a small keyed delete file, no data rewrite — the
      // MoR-native feed emits its keys as delete events with the
      // pre-image, and the SAME maintain call folds them
      TxnTable.deleteKeysMor(spark, rawRoot, "event_type",
        Seq("a").toDF("event_type"))
      val delVer = TxnTable.versions(spark, rawRoot).last
      assert(TxnTable.latest(spark, rawRoot).get.deletes.nonEmpty,
        "the erasure must stay merge-on-read (live delete files)")
      Materialized.maintainFromFeed(spark, rawRoot, aggRoot, cursor, delVer)
      cursor = delVer
      assert(rows(TxnTable.read(spark, aggRoot)) ===
        rows(agg(TxnTable.read(spark, rawRoot))),
        "after the MoR erasure the maintained aggregate must equal recompute")

      // and the loop keeps running on top of the LIVE delete set —
      // exactly-once commits, feed windows, IVM, no compaction needed
      input.addData(("2024-01-03", "c", 4.5), ("2024-01-04", "d", 7.0))
      query.processAllAvailable()
      assert(rows(TxnTable.read(spark, aggRoot)) ===
        rows(agg(TxnTable.read(spark, rawRoot))),
        "after a batch on live MoR deletes the aggregate must equal recompute")

      // every raw mutation is a distinct atomic commit, every one folded
      assert(TxnTable.versions(spark, rawRoot).size === 5)
      assert(cursor === 5L)
    } finally query.stop()
  }
}
