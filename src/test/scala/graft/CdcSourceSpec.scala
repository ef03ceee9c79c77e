package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.TxnTable
import graft.streaming.CdcSource

/** The txn change feed as a Structured Streaming source: replay from
  * version 0 (history), default start (new changes only), per-commit
  * `_commit_version` attribution, MoR delete events with pre-images,
  * compaction silence, and exactly-once resume across a checkpoint
  * restart. */
class CdcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshBase(): String =
    Files.createTempDirectory("cdc_source").toString

  private def df(ids: Long*) = {
    val s = spark
    import s.implicits._
    ids.toDF("id").withColumn("v", col("id") * 10)
  }

  /** (id, v, change_type, n, commit_version) rows from a memory sink. */
  private def sinkRows(name: String): Set[(Long, Long, String, Long, Long)] =
    spark.table(name).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))
    }.toSet

  private def startStream(root: String, ckpt: String, sink: String,
                          startVersion: Option[Long]) = {
    val reader = spark.readStream.format(CdcSource.Format).option("root", root)
    startVersion.foreach(v => reader.option("startVersion", v.toString))
    reader.load().writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt).start()
  }

  test("history replay: inserts, MoR delete pre-image, compaction silence") {
    val base = freshBase()
    val root = s"$base/tbl"
    val s = spark
    import s.implicits._
    TxnTable.overwrite(spark, root, df(1, 2))                      // v1
    TxnTable.append(spark, root, df(3))                            // v2
    TxnTable.deleteKeysMor(spark, root, "id", Seq(1L).toDF("id"))  // v3
    TxnTable.compactDeletes(spark, root)                           // v4: silent

    val q = startStream(root, s"$base/ckpt", "cdc_replay", Some(0L))
    try {
      q.processAllAvailable()
      assert(sinkRows("cdc_replay") === Set(
        (1L, 10L, "insert", 1L, 1L),
        (2L, 20L, "insert", 1L, 1L),
        (3L, 30L, "insert", 1L, 2L),
        (1L, 10L, "delete", 1L, 3L)))
      // a live append lands in the running stream with its own version
      TxnTable.append(spark, root, df(4))                          // v5
      q.processAllAvailable()
      assert(sinkRows("cdc_replay").contains((4L, 40L, "insert", 1L, 5L)))
      assert(sinkRows("cdc_replay").size === 5)
    } finally q.stop()
  }

  test("default start emits only commits after stream start") {
    val base = freshBase()
    val root = s"$base/tbl"
    TxnTable.overwrite(spark, root, df(1, 2)) // v1: before the stream
    val q = startStream(root, s"$base/ckpt", "cdc_tail", None)
    try {
      q.processAllAvailable()
      assert(sinkRows("cdc_tail").isEmpty)
      TxnTable.append(spark, root, df(3))     // v2
      q.processAllAvailable()
      assert(sinkRows("cdc_tail") === Set((3L, 30L, "insert", 1L, 2L)))
    } finally q.stop()
  }

  test("maxVersionsPerBatch paces a backlog into bounded micro-batches") {
    val base = freshBase()
    val root = s"$base/tbl"
    TxnTable.overwrite(spark, root, df(1))   // v1
    TxnTable.append(spark, root, df(2))      // v2
    TxnTable.append(spark, root, df(3))      // v3: a 3-version backlog
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    val q = spark.readStream.format(CdcSource.Format).option("root", root)
      .option("startVersion", "0").option("maxVersionsPerBatch", "1").load()
      .writeStream.option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = batch.select("_commit_version").collect().map(_.getLong(0)).toSet
        if (vs.nonEmpty) { batches.add(vs); () }
      }.start()
    try {
      q.processAllAvailable()
      // one commit window per micro-batch, in order, nothing lost
      assert(batches.toArray.toSeq === Seq(Set(1L), Set(2L), Set(3L)))
    } finally q.stop()
  }

  test("the CDC stream carries a position-delta commit as delete+insert " +
      "events (merge-on-read SQL UPDATE mid-stream)") {
    val base = freshBase()
    val root = s"$base/tbl"
    TxnTable.overwrite(spark, root, df(1, 2, 3))               // v1
    TxnTable.setTableProperty(spark, root, TxnTable.RowLevelModeKey,
      "merge-on-read")
    val cat = "graft_cdc_mor_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", base)
    val q = startStream(root, s"$base/ckpt", "cdc_mor", Some(0L))
    try {
      q.processAllAvailable()
      assert(sinkRows("cdc_mor").size === 3)                   // v1 inserts
      spark.sql(s"UPDATE $cat.tbl SET v = 99 WHERE id = 2")    // v2: MoR
      q.processAllAvailable()
      assert(sinkRows("cdc_mor").contains((2L, 20L, "delete", 1L, 2L)))
      assert(sinkRows("cdc_mor").contains((2L, 99L, "insert", 1L, 2L)))
      assert(sinkRows("cdc_mor").size === 5)
    } finally q.stop()
  }

  test("default start + restart: commits made while down are delivered " +
      "without waiting for a future commit (starvation regression)") {
    val base = freshBase()
    val root = s"$base/tbl"
    val ckpt = s"$base/ckpt"
    TxnTable.overwrite(spark, root, df(1))    // v1: before the stream
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    // NO startVersion: 'latest at stream start' — which must mean the
    // FIRST start, not re-resolve to the head at every restart
    def run() = spark.readStream.format(CdcSource.Format).option("root", root)
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => got.add((r.getLong(0), r.getLong(4))))
      }.start()
    val q1 = run()
    try {
      q1.processAllAvailable()
      assert(got.isEmpty)                     // tail-only: v1 not emitted
    } finally q1.stop()

    TxnTable.append(spark, root, df(2))       // v2: while the stream is DOWN
    TxnTable.append(spark, root, df(3))       // v3: while the stream is DOWN
    val q2 = run()
    try {
      // the table stays quiescent after restart — the down-time commits
      // must flow anyway (the old floor = restart-time head withheld
      // them forever)
      q2.processAllAvailable()
      assert(got.toArray.toSet === Set((2L, 2L), (3L, 3L)))
    } finally q2.stop()
  }

  test("checkpoint restart resumes exactly after the last committed version") {
    val base = freshBase()
    val root = s"$base/tbl"
    val ckpt = s"$base/ckpt"
    TxnTable.overwrite(spark, root, df(1))    // v1
    // memory sinks cannot recover a checkpoint; foreachBatch can
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String, Long, Long)]()
    def run() = spark.readStream.format(CdcSource.Format).option("root", root)
      .option("startVersion", "0").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => got.add(
          (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))))
      }.start()
    val q1 = run()
    try {
      q1.processAllAvailable()
      assert(got.toArray.toSet === Set((1L, 10L, "insert", 1L, 1L)))
    } finally q1.stop()

    TxnTable.append(spark, root, df(2))       // v2: while the stream is down
    got.clear()
    val q2 = run()
    try {
      q2.processAllAvailable()
      // only the missed window replays — v1 is behind the checkpoint
      assert(got.toArray.toSet === Set((2L, 20L, "insert", 1L, 2L)))
    } finally q2.stop()
  }
}
