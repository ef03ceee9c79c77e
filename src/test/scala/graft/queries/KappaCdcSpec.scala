package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable
import graft.streaming.CdcSource

/** The kappa loop over the STREAMING change feed: a second stream reads
  * the raw txn table's CDC through [[CdcSource]] and maintains the daily
  * aggregate with [[Materialized.applyFeedBatch]] — table → stream →
  * table, the composition the batch-cursor kappa spec proves piecewise.
  * The view bootstraps from the stream itself (no batch recompute), MoR
  * deletes subtract through it, and a replayed micro-batch no-ops. */
class KappaCdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(graft.Det.cents(col("value"))).as("sum_cents"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("CDC stream maintains the aggregate == recompute, through a MoR delete") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("kappa_cdc").toString
    val (rawRoot, aggRoot, ckpt) = (s"$base/raw", s"$base/agg", s"$base/ckpt")

    def raw(rs: (Long, String, String, Double)*) =
      rs.toSeq.toDF("event_id", "d", "event_type", "value")
        .select($"event_id", to_timestamp($"d").as("ts"), $"event_type", $"value")

    TxnTable.overwrite(spark, rawRoot,
      raw((1L, "2024-01-01", "a", 1.5), (2L, "2024-01-01", "b", 2.0),
          (3L, "2024-01-02", "a", 3.25)))

    val q = spark.readStream.format(CdcSource.Format)
      .option("root", rawRoot).option("startVersion", "0").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Materialized.applyFeedBatch(batch.sparkSession, batch, aggRoot, id)
      }.start()
    try {
      // bootstrap: the view builds from the stream's initial window
      q.processAllAvailable()
      assert(rows(TxnTable.read(spark, aggRoot)) ===
        rows(agg(TxnTable.read(spark, rawRoot))))

      // live append folds in
      TxnTable.append(spark, rawRoot, raw((4L, "2024-01-02", "a", 4.0)))
      q.processAllAvailable()
      assert(rows(TxnTable.read(spark, aggRoot)) ===
        rows(agg(TxnTable.read(spark, rawRoot))))

      // a MoR delete subtracts through the feed; its group empties out
      TxnTable.deleteKeysMor(spark, rawRoot, "event_id", Seq(2L).toDF("event_id"))
      q.processAllAvailable()
      assert(rows(TxnTable.read(spark, aggRoot)) ===
        rows(agg(TxnTable.read(spark, rawRoot))))
      assert(TxnTable.read(spark, aggRoot)
        .filter($"event_type" === "b").count() === 0L)
    } finally q.stop()

    // crash-replay: re-applying an already-applied batch id must no-op
    val before = rows(TxnTable.read(spark, aggRoot))
    val replay = TxnTable.changesBetween(spark, rawRoot, 0L max 1L, 2L)
      .withColumn("_commit_version", lit(2L))
    Materialized.applyFeedBatch(spark, replay, aggRoot, batchId = 1L)
    assert(rows(TxnTable.read(spark, aggRoot)) === before)
  }
}
