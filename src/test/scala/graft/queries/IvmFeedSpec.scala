package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable

/** Incremental view maintenance from the change feed
  * ([[Materialized.maintainFromFeed]]): after every raw commit, folding
  * the feed into the aggregate equals recomputing it from the raw head —
  * through deletes (subtraction), inserts (addition, including brand-new
  * groups), and group-vanishing (the view row is deleted, not zeroed). */
class IvmFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"ivm_$tag").toString + "/tbl"

  /** Synthetic raw events: full control over groups and values. */
  private def raw(rows: (String, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("d", "event_type", "value")
      .select(to_timestamp($"d").as("ts"), $"event_type", $"value")
  }

  private def agg(df: org.apache.spark.sql.DataFrame) = {
    val s = spark
    import s.implicits._
    df.withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(graft.Det.cents($"value")).as("sum_cents"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("feed-maintained aggregate == recompute through delete, vanish, insert") {
    val rawRoot = freshRoot("raw")
    val aggRoot = freshRoot("agg")
    TxnTable.overwrite(spark, rawRoot, raw(
      ("2024-01-01", "a", 1.0), ("2024-01-01", "a", 2.0),
      ("2024-01-01", "b", 3.0), ("2024-01-02", "a", 4.0)))
    TxnTable.overwrite(spark, aggRoot, agg(TxnTable.read(spark, rawRoot)))

    // v2 on raw: delete the only day1/b row — that group must VANISH
    TxnTable.deleteWhere(spark, rawRoot, col("value") === 3.0)
    Materialized.maintainFromFeed(spark, rawRoot, aggRoot, 1, 2)
    assert(rows(TxnTable.read(spark, aggRoot)) ===
      rows(agg(TxnTable.read(spark, rawRoot))))
    assert(TxnTable.read(spark, aggRoot)
      .filter(col("event_type") === "b").head(1).isEmpty,
      "emptied group must be deleted from the view, not zeroed")

    // v3 on raw: append — an update to an existing group AND a new group
    TxnTable.append(spark, rawRoot, raw(
      ("2024-01-02", "a", 0.5), ("2024-01-03", "c", 7.0)))
    Materialized.maintainFromFeed(spark, rawRoot, aggRoot, 2, 3)
    assert(rows(TxnTable.read(spark, aggRoot)) ===
      rows(agg(TxnTable.read(spark, rawRoot))))

    // no-op window: nothing changed, nothing committed
    val before = TxnTable.versions(spark, aggRoot)
    Materialized.maintainFromFeed(spark, rawRoot, aggRoot, 3, 3)
    assert(TxnTable.versions(spark, aggRoot) === before)
  }
}
