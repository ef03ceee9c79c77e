package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDupStream
import graft.streaming.NearDupStream.Doc

/** Incremental near-dedup at ingest: a duplicate arriving in a LATER
  * micro-batch must be flagged against the persisted signature store
  * (not just against its own batch), and in-batch duplicates flag with
  * the keep-min-id convention. */
class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("later-batch duplicate is flagged against the stored signatures") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val base = Files.createTempDirectory("neardup").toString
    val (store, flags, ckpt) = (s"$base/store", s"$base/flags", s"$base/ckpt")

    val input = MemoryStream[Doc]
    val query = NearDupStream.start(input.toDS(), store, flags, ckpt)
    try {
      // batch 0: two distinct docs -> no flags, signatures stored
      input.addData(
        Doc(1, "alpha beta gamma delta epsilon"),
        Doc(2, "one two three four five six"))
      query.processAllAvailable()
      // no flags yet -> the (empty) flag dataset was not even written
      assert(!new java.io.File(flags).exists())
      // 2 docs x 4 bands in the store
      assert(spark.read.parquet(store).count() === 8)

      // batch 1: doc 3 duplicates doc 1 (flag vs the STORE), doc 4 is
      // fresh, docs 5+6 duplicate each other IN-batch (keep-min-id)
      input.addData(
        Doc(3, "alpha beta gamma delta epsilon"),
        Doc(4, "seven eight nine ten eleven"),
        Doc(5, "red green blue cyan magenta"),
        Doc(6, "red green blue cyan magenta"))
      query.processAllAvailable()
      val flagged = spark.read.parquet(flags)
        .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
      assert(flagged === Set((3L, 1L), (6L, 5L)), s"got $flagged")
      assert(spark.read.parquet(store).count() === 24)
    } finally query.stop()
  }

  test("at-least-once replay after a committed store write is idempotent") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("neardup_replay").toString
    val (store, flags) = (s"$base/store", s"$base/flags")

    def run(batch: Seq[Doc], id: Long): Unit =
      NearDupStream.processBatch(batch.toDF("doc_id", "text"), id, store, flags)

    run(Seq(Doc(1, "alpha beta gamma delta epsilon")), 0L)
    run(Seq(Doc(3, "alpha beta gamma delta epsilon"),
            Doc(5, "red green blue cyan magenta"),
            Doc(6, "red green blue cyan magenta")), 1L)
    val firstFlags = spark.read.parquet(flags)
      .select("doc_id", "dup_of", "batch_id").as[(Long, Long, Int)].collect().toSet
    assert(firstFlags.map(t => (t._1, t._2)) === Set((3L, 1L), (6L, 5L)))

    // REPLAY batch 1 (foreachBatch at-least-once: store write committed,
    // checkpoint didn't). Without the batch_id < current guard, the batch
    // re-joins its OWN stored signatures: self-flags (5,5)/(6,6)/(3,3)
    // and the reversed (5,6) pair. The flag output must be unchanged.
    run(Seq(Doc(3, "alpha beta gamma delta epsilon"),
            Doc(5, "red green blue cyan magenta"),
            Doc(6, "red green blue cyan magenta")), 1L)
    val replayed = spark.read.parquet(flags)
      .select("doc_id", "dup_of", "batch_id").as[(Long, Long, Int)].collect().toSet
    assert(replayed === firstFlags,
      s"replay changed flag output: $replayed vs $firstFlags")
    // store: replay overwrote its own partition, no duplication
    assert(spark.read.parquet(store).filter($"batch_id" === 1).count() === 12)
  }

  test("flag join broadcasts the batch side — the store never shuffles") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("neardup_plan").toString
    val store = s"$base/store"
    NearDupStream.processBatch(
      Seq(Doc(1, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      0L, store, s"$base/flags")

    val bands = spark.read.parquet(store).drop("batch_id")
    val joined = NearDupStream.priorFlagJoin(bands, spark.read.parquet(store))
    val plan = PlanSig.initialPlan(joined)
    val ops = plan.collectWithSubqueries { case p => p.getClass.getSimpleName }
    assert(ops.count(_ == "ShuffleExchangeExec") === 0,
      s"store side must not shuffle:\n$plan")
    assert(ops.count(_ == "BroadcastExchangeExec") === 1,
      s"batch side must broadcast:\n$plan")
  }
}
