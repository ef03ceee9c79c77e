package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Change data feed ([[TxnTable.changesBetween]]): the feed equals the
  * state diff, carried files are never read, file-moves (compaction)
  * cancel to an empty feed, and duplicate rows keep their multiplicity.
  * The end-to-end feed == recomputed-diff contract is the driver's q98
  * oracle. */
class TxnCdfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshRoot(): String =
    Files.createTempDirectory("txn_cdf").toString + "/tbl"

  private def df(ids: Int*) = {
    val s = spark
    import s.implicits._
    ids.toDF("id").withColumn("v", col("id") * 10)
  }

  private def feed(root: String, v1: Long, v2: Long): Set[(Int, Int, String, Long)] =
    TxnTable.changesBetween(spark, root, v1, v2)
      .collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[Int]("v"),
        r.getAs[String]("_change_type"), r.getAs[Long]("_n")))
      .toSet

  test("append shows as inserts; delete shows as deletes; carried rows absent") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3).repartition(3),
      statsCols = Seq("id"))
    TxnTable.append(spark, root, df(4), statsCols = Seq("id"))
    assert(feed(root, 1, 2) === Set((4, 40, "insert", 1L)))
    // delete id=4 only: stats-bounded, so files 1..3 carry by reference
    TxnTable.deleteWhere(spark, root, col("id") === 4, Some((4L, 4L)))
    assert(feed(root, 2, 3) === Set((4, 40, "delete", 1L)))
    // across the whole history the append and its deletion cancel
    assert(feed(root, 1, 3) === Set.empty)
  }

  test("the feed reads only changed files, never carried ones") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3).repartition(3),
      statsCols = Seq("id"))
    TxnTable.append(spark, root, df(4), statsCols = Seq("id"))
    val s1 = TxnTable.snapshot(spark, root, 1)
    val s2 = TxnTable.snapshot(spark, root, 2)
    val changed = (s2.files.toSet -- s1.files.toSet) ++
      (s1.files.toSet -- s2.files.toSet)
    val scanned = graft.PlanSig
      .initialPlan(TxnTable.changesBetween(spark, root, 1, 2))
      .collectWithSubqueries {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.toSeq
      }.flatten.toSet
    assert(scanned.nonEmpty)
    scanned.foreach { p =>
      assert(changed.exists(p.endsWith),
        s"feed scanned carried file $p (changed set: $changed)")
    }
  }

  test("compaction produces an empty feed (rows moved, nothing changed)") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3, 4).repartition(4))
    TxnTable.compactTxn(spark, root, targetFiles = 1)
    assert(feed(root, 1, 2) === Set.empty)
    // and the empty feed still has the full CDF shape
    val empty = TxnTable.changesBetween(spark, root, 2, 2)
    assert(empty.columns.toSeq === Seq("id", "v", "_change_type", "_n"))
    assert(empty.count() === 0L)
  }

  test("applying the feed to v1 reproduces v2 — the CDC consumer law") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3).repartition(3),
      statsCols = Seq("id"))
    TxnTable.append(spark, root, df(4), statsCols = Seq("id"))
    TxnTable.deleteWhere(spark, root, col("id") <= 1, Some((0L, 1L)))
    val (v1, v2) = (1L, 3L)
    def multiset(d: org.apache.spark.sql.DataFrame): Set[(Int, Int, Long)] =
      d.groupBy("id", "v").agg(sum(lit(1L)).as("n")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val feed = TxnTable.changesBetween(spark, root, v1, v2)
    val state1 = TxnTable.readAsOf(spark, root, v1)
      .groupBy("id", "v").agg(sum(lit(1L)).as("n"))
    val delta = feed.select(col("id"), col("v"),
      when(col("_change_type") === "insert", col("_n"))
        .otherwise(-col("_n")).as("n"))
    val applied = state1.unionByName(delta)
      .groupBy("id", "v").agg(sum("n").as("n")).filter(col("n") > 0)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(applied === multiset(TxnTable.readAsOf(spark, root, v2)))
  }

  test("MoR deletes feed natively: pre-image delete events, CDC law, " +
      "carried files unread on an unchanged delete set") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3).repartition(3),
      statsCols = Seq("id"))                                       // v1
    TxnTable.deleteKeysMor(spark, root, "id", df(2).select(col("id"))) // v2
    TxnTable.append(spark, root, df(4), statsCols = Seq("id"))     // v3

    // the delete file feeds as a keyed delete event with the pre-image
    assert(feed(root, 1, 2) === Set((2, 20, "delete", 1L)))
    // composed window across the MoR version
    assert(feed(root, 1, 3) === Set((2, 20, "delete", 1L), (4, 40, "insert", 1L)))

    // CDC consumer law through the MoR version: feed(v1,v3) applied to
    // state(v1) reproduces state(v3) as a multiset
    val fd = TxnTable.changesBetween(spark, root, 1, 3)
    val delta = fd.select(col("id"), col("v"),
      when(col("_change_type") === "insert", col("_n"))
        .otherwise(-col("_n")).as("n"))
    val applied = TxnTable.readAsOf(spark, root, 1)
      .groupBy("id", "v").agg(sum(lit(1L)).as("n"))
      .unionByName(delta)
      .groupBy("id", "v").agg(sum("n").as("n")).filter(col("n") > 0)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val state3 = TxnTable.readAsOf(spark, root, 3)
      .groupBy("id", "v").agg(sum(lit(1L)).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(applied === state3)

    // an append window on an UNCHANGED live delete set must not read
    // carried DATA files — decided from the manifests alone. (The
    // delete-key files ARE read: the appended rows anti-join against
    // the live keys — O(delete keys), not O(carried data).)
    val s2 = TxnTable.snapshot(spark, root, 2)
    val s3 = TxnTable.snapshot(spark, root, 3)
    val changed = (s3.files.toSet -- s2.files.toSet) ++ s3.deletes
    val scanned = graft.PlanSig
      .initialPlan(TxnTable.changesBetween(spark, root, 2, 3))
      .collectWithSubqueries {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.toSeq
      }.flatten.toSet
    assert(scanned.nonEmpty)
    scanned.foreach { p =>
      assert(changed.exists(p.endsWith),
        s"live-delete append window scanned carried file $p")
    }

    // folding the deletes in moves every row between files but changes
    // no effective content: an empty feed
    TxnTable.compactDeletes(spark, root)                           // v4
    assert(feed(root, 3, 4) === Set.empty)
  }

  test("restoring past a MoR delete feeds the resurrected rows as inserts") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3).repartition(3))    // v1
    TxnTable.deleteKeysMor(spark, root, "id", df(2, 3).select(col("id"))) // v2
    TxnTable.restore(spark, root, 1)                               // v3
    // same data files carry; the delete file leaves → its keys come back
    assert(feed(root, 2, 3) === Set((2, 20, "insert", 1L), (3, 30, "insert", 1L)))
    // and the full cycle cancels
    assert(feed(root, 1, 3) === Set.empty)
  }

  test("duplicate rows keep multiset multiplicity in _n") {
    val root = freshRoot()
    // v1 holds row (7,70) twice; v2 overwrites with it FIVE times
    TxnTable.overwrite(spark, root, df(7, 7))
    TxnTable.overwrite(spark, root, df(7, 7, 7, 7, 7))
    assert(feed(root, 1, 2) === Set((7, 70, "insert", 3L)))
    assert(feed(root, 2, 2) === Set.empty)
  }
}
