package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Write–audit–publish + tags: a staged append is invisible until
  * published, the audit preview is the exact publish result, publish
  * survives a concurrent commit, abort leaves no trace, vacuum spares
  * staged files, and tagged versions pin history through retention. */
class TxnWapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshRoot(): String =
    Files.createTempDirectory("txn_wap").toString + "/tbl"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def df(ids: Long*) = {
    val s = spark
    import s.implicits._
    ids.toDF("id").withColumn("v", col("id") * 10)
  }

  test("staged append: invisible, preview == publish, stats carried") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1, 2), statsCols = Seq("id"))
    val id = TxnTable.stageAppend(spark, root, df(10, 11))
    // invisible to readers and to the version line
    assert(rows(TxnTable.read(spark, root)) === rows(df(1, 2)))
    assert(TxnTable.versions(spark, root) === Seq(1L))
    assert(TxnTable.stagedIds(spark, root) === Seq(id))
    // audit preview is the publish result
    val preview = rows(TxnTable.readStaged(spark, root, id))
    assert(preview === rows(df(1, 2, 10, 11)))
    val snap = TxnTable.publishStaged(spark, root, id)
    assert(snap.version === 2L)
    assert(rows(TxnTable.read(spark, root)) === preview)
    assert(TxnTable.stagedIds(spark, root).isEmpty)
    // prior version untouched; staged files' stats prune after publish
    assert(rows(TxnTable.readAsOf(spark, root, 1L)) === rows(df(1, 2)))
    assert(TxnTable.readPruned(spark, root, "id", 10L, 11L)
      .inputFiles.length < snap.files.size)
  }

  test("abort leaves no trace — no rows, no markers, no data files") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1))
    val before = TxnTable.latest(spark, root).get
    val id = TxnTable.stageAppend(spark, root, df(2))
    val stagedFiles = TxnTable.readStaged(spark, root, id).inputFiles.toSet --
      TxnTable.read(spark, root).inputFiles.toSet
    assert(stagedFiles.nonEmpty)
    TxnTable.abortStaged(spark, root, id)
    assert(TxnTable.stagedIds(spark, root).isEmpty)
    assert(TxnTable.latest(spark, root).get.files === before.files)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    stagedFiles.foreach(f => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(f.stripPrefix("file:")))))
  }

  test("publish retries onto a head that moved after staging") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1))
    val id = TxnTable.stageAppend(spark, root, df(2))
    TxnTable.append(spark, root, df(3)) // a racing writer takes v2
    val snap = TxnTable.publishStaged(spark, root, id)
    assert(snap.version === 3L)
    assert(rows(TxnTable.read(spark, root)) === rows(df(1, 2, 3)))
  }

  test("vacuum spares staged files; publish still works after it") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1))
    val id = TxnTable.stageAppend(spark, root, df(2))
    TxnTable.append(spark, root, df(3))
    TxnTable.append(spark, root, df(4))
    TxnTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    assert(rows(TxnTable.readStaged(spark, root, id)) === rows(df(1, 2, 3, 4)))
    TxnTable.publishStaged(spark, root, id)
    assert(rows(TxnTable.read(spark, root)) === rows(df(1, 2, 3, 4)))
  }

  test("tags pin versions through vacuum; immutable until dropped") {
    val root = freshRoot()
    TxnTable.overwrite(spark, root, df(1))          // v1
    TxnTable.tagVersion(spark, root, "baseline", 1L)
    TxnTable.append(spark, root, df(2))             // v2
    TxnTable.append(spark, root, df(3))             // v3
    TxnTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    // v2 is gone, the tagged v1 is not
    assert(TxnTable.versions(spark, root) === Seq(1L, 3L))
    assert(rows(TxnTable.readTag(spark, root, "baseline")) === rows(df(1)))
    assert(TxnTable.tags(spark, root) === Map("baseline" -> 1L))
    intercept[IllegalStateException] {
      TxnTable.tagVersion(spark, root, "baseline", 3L)
    }
    TxnTable.dropTag(spark, root, "baseline")
    TxnTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    assert(TxnTable.versions(spark, root) === Seq(3L))
  }
}
