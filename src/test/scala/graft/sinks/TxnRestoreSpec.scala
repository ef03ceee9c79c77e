package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[TxnTable.restore]]: rolling back to a version is a NEW metadata-only
  * commit — reads equal the target version, no data files are staged or
  * rewritten, history stays time-travelable, the change feed across the
  * restore is exactly the undone rows, and schema/stats travel with the
  * restored manifest. */
class TxnRestoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshRoot(): String =
    Files.createTempDirectory("txn_restore").toString + "/tbl"

  private def df(ids: Int*) = {
    val s = spark
    import s.implicits._
    ids.toDF("id").withColumn("v", col("id") * 10)
  }

  private def idsOf(d: org.apache.spark.sql.DataFrame): Set[Int] =
    d.select("id").collect().map(_.getInt(0)).toSet

  test("restore rolls reads back; history and the undo feed are intact") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3), statsCols = Seq("id"))
    TxnTable.append(spark, root, df(4))
    TxnTable.append(spark, root, df(5))
    val snap = TxnTable.restore(spark, root, 1) // v4
    assert(snap.version === 4L && snap.op === "restore:1")
    assert(idsOf(TxnTable.read(spark, root)) === Set(1, 2, 3))
    // the bad versions remain time-travelable
    assert(idsOf(TxnTable.readAsOf(spark, root, 3)) === Set(1, 2, 3, 4, 5))
    // the feed across the restore is exactly the rows it undid
    val undo = TxnTable.changesBetween(spark, root, 3, 4)
      .select("id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(undo === Set(4 -> "delete", 5 -> "delete"))
  }

  test("restore is metadata-only: file list is path-identical, nothing staged") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3).repartition(3),
      statsCols = Seq("id"))
    TxnTable.append(spark, root, df(4))
    val before = dataFiles(root)
    TxnTable.restore(spark, root, 1)
    assert(dataFiles(root) === before, "restore wrote data files")
    assert(TxnTable.snapshot(spark, root, 3).files ===
      TxnTable.snapshot(spark, root, 1).files)
  }

  test("restore forward re-targets any retained version; stats keep pruning") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2, 3).repartition(3),
      statsCols = Seq("id"))
    TxnTable.append(spark, root, df(40), statsCols = Seq("id"))
    TxnTable.restore(spark, root, 1) // v3: back to 1..3
    TxnTable.restore(spark, root, 2) // v4: forward again
    assert(idsOf(TxnTable.read(spark, root)) === Set(1, 2, 3, 40))
    // restored manifest carried the stats: point-read prunes to 1 file
    val pruned = TxnTable.readPruned(spark, root, 40L, 40L)
    assert(idsOf(pruned) === Set(40))
    assert(graft.PlanSig.initialPlan(pruned).collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.length
    }.sum === 1)
  }

  test("restore reverts schema evolution; old-shape appends work after") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1))
    TxnTable.append(spark, root, df(2).withColumn("extra", lit("x")))
    assert(TxnTable.read(spark, root).columns.toSeq === Seq("id", "v", "extra"))
    TxnTable.restore(spark, root, 1)
    assert(TxnTable.read(spark, root).columns.toSeq === Seq("id", "v"))
    TxnTable.append(spark, root, df(3))
    assert(idsOf(TxnTable.read(spark, root)) === Set(1, 3))
  }

  private def dataFiles(root: String): Set[String] = {
    val base = new java.io.File(root, "data")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(base).map(_.getPath).filter(_.contains("part-")).toSet
  }
}
