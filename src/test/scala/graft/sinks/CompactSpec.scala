package graft.sinks

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Compaction: fewer files, identical rows, shuffle-free plan,
  * idempotent second pass. */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("compact merges a splintered directory without a shuffle, idempotently") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/events"
    val src = graft.Tables.t(spark, sfDir, "events")
    src.repartition(64).write.mode("overwrite").parquet(dir) // splintered
    val before = src.collect().map(_.getAs[Long]("event_id")).sorted.toSeq

    // the coalesce rewrite must be a narrow plan — no exchange
    val plan = spark.read.parquet(dir).coalesce(1)
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"coalesce rewrite must not shuffle:\n$plan")

    val stats = Compact.compact(spark, dir, targetBytes = 1L << 30)
    assert(stats.rewritten && stats.filesBefore === 64 && stats.filesAfter === 1,
      s"$stats")
    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.getAs[Long]("event_id")).sorted.toSeq === before)
    assert(after.schema === src.schema)

    val again = Compact.compact(spark, dir, targetBytes = 1L << 30)
    assert(!again.rewritten && again.filesAfter === 1, s"$again")
  }

  test("target size splits into multiple files, none re-merged needlessly") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact2").toString + "/e"
    graft.Tables.t(spark, sfDir, "events")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val bytes = Compact.compact(spark, dir, targetBytes = 1L << 40).bytes
    // re-splinter, then compact to ~quarter-of-total target => >=4 files
    graft.Tables.t(spark, sfDir, "events")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val stats = Compact.compact(spark, dir, targetBytes = math.max(1L, bytes / 4))
    assert(stats.rewritten)
    assert(stats.filesAfter >= 4 && stats.filesAfter < 32, s"$stats")
  }
}
