package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Merge-on-read equality deletes ([[TxnTable.deleteKeysMor]]): deletes
  * cost O(keys) and rewrite nothing (file path identity), readers merge
  * them out, time travel still sees pre-delete rows, raw-file paths
  * refuse until [[TxnTable.compactDeletes]] folds the deletes in
  * (except the change feed, which is MoR-native and emits the delete
  * file as keyed delete events), and vacuum treats delete files as
  * referenced data. */
class TxnMorDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshRoot: String =
    Files.createTempDirectory("txn_mor").toString

  private def seed(root: String) = {
    val s = spark
    import s.implicits._
    TxnTable.append(spark, root,
      (0L until 100L).map(i => (i, s"v$i", i % 7)).toDF("id", "payload", "grp"),
      statsCols = Seq("id"))
  }

  test("MoR delete: no rewrite, merged reads, time travel intact") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    seed(root)
    val filesBefore = TxnTable.latest(spark, root).get.files.toSet

    val snap = TxnTable.deleteKeysMor(spark, root, "id",
      Seq(3L, 7L, 42L, 999L).toDF("id")) // 999 matches nothing: harmless
    assert(snap.files.toSet === filesBefore, "MoR delete must not rewrite data")
    assert(snap.deletes.nonEmpty && snap.deleteCol === Some("id"))

    val ids = TxnTable.read(spark, root).select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 100L).toSet -- Set(3L, 7L, 42L))
    // non-key columns survive the anti-join untouched
    assert(TxnTable.read(spark, root).filter($"id" === 5L)
      .select($"payload").head().getString(0) === "v5")
    // time travel: v1 still sees every row
    assert(TxnTable.readAsOf(spark, root, 1L).count() === 100L)

    // consecutive deletes accumulate
    TxnTable.deleteKeysMor(spark, root, "id", Seq(5L).toDF("id"))
    assert(TxnTable.read(spark, root).count() === 96L)
    // a different delete column is refused
    intercept[IllegalArgumentException] {
      TxnTable.deleteKeysMor(spark, root, "grp", Seq(1L).toDF("grp"))
    }
  }

  test("appends carry live deletes; raw-file paths refuse; compaction folds") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    seed(root)
    TxnTable.deleteKeysMor(spark, root, "id", Seq(10L, 11L).toDF("id"))

    // an append must not lose the live deletes
    TxnTable.append(spark, root,
      Seq((200L, "v200", 4L)).toDF("id", "payload", "grp"))
    val ids = TxnTable.read(spark, root).select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids(10L) && !ids(11L) && ids(200L),
      "append dropped the live MoR deletes")

    // raw-file code paths refuse while deletes are live
    intercept[IllegalArgumentException] {
      TxnTable.readPruned(spark, root, 0L, 50L)
    }
    intercept[IllegalArgumentException] {
      TxnTable.deleteWhere(spark, root, col("id") === 1L)
    }
    // ...but the change feed is MoR-native: the delete file feeds as
    // keyed delete events carrying the pre-image (v1 -> v2 here is
    // exactly the deleteKeysMor commit)
    val feedDel = TxnTable.changesBetween(spark, root, 1, 2)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
        r.getAs[String]("_change_type"), r.getAs[Long]("_n"))).toSet
    assert(feedDel === Set((10L, "v10", "delete", 1L),
      (11L, "v11", "delete", 1L)))
    // and an append window on top of the (unchanged) live delete set
    // feeds just the inserts
    val feedApp = TxnTable.changesBetween(spark, root, 2, 3)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"))).toSet
    assert(feedApp === Set((200L, "insert")))

    // compaction folds the deletes in: same content, no delete files,
    // raw-file paths work again
    val before = TxnTable.read(spark, root).collect().map(_.toSeq).toSet
    val compacted = TxnTable.compactDeletes(spark, root)
    assert(compacted.deletes.isEmpty)
    assert(TxnTable.read(spark, root).collect().map(_.toSeq).toSet === before)
    assert(TxnTable.readPruned(spark, root, 0L, 50L).count() > 0)
    // restore back to the MoR version carries its delete files
    val morVersion = compacted.version - 1
    TxnTable.restore(spark, root, morVersion)
    assert(TxnTable.latest(spark, root).get.deletes.nonEmpty)
    assert(TxnTable.read(spark, root).collect().map(_.toSeq).toSet === before)
  }

  test("composite-key MoR delete: every component must match (null-safe); " +
    "feed and fold honor the tuple key") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    seed(root) // (id, payload, grp) with grp = id % 7
    // (3, 3) matches row 3 (3 % 7 = 3); (10, 4) and (5, 999) each agree
    // on only ONE component (10 % 7 = 3, 5 % 7 = 5) and must NOT delete
    val keys = Seq((3L, 3L), (10L, 4L), (5L, 999L)).toDF("id", "grp")
    val snap = TxnTable.deleteKeysMor(spark, root, Seq("id", "grp"), keys)
    assert(snap.deleteCols === Seq("id", "grp"))
    val ids = TxnTable.read(spark, root).select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids(3L) && ids(10L) && ids(5L),
      s"composite key must match on EVERY component: $ids")
    assert(TxnTable.read(spark, root).count() === 99L)

    // a different key list is refused (the key is fixed at first use)
    intercept[IllegalArgumentException] {
      TxnTable.deleteKeysMor(spark, root, Seq("grp", "id"), keys)
    }
    // the MoR-native feed emits the composite-keyed pre-image
    val v = snap.version
    val feed = TxnTable.changesBetween(spark, root, v - 1, v)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
        r.getAs[String]("_change_type"))).toSet
    assert(feed === Set((3L, "v3", "delete")))
    // compaction folds the tuple-keyed deletes exactly
    val before = TxnTable.read(spark, root).collect().map(_.toSeq).toSet
    TxnTable.compactDeletes(spark, root)
    assert(TxnTable.latest(spark, root).get.deletes.isEmpty)
    assert(TxnTable.read(spark, root).collect().map(_.toSeq).toSet === before)
  }

  test("vacuum keeps delete files referenced by retained manifests") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    seed(root)
    TxnTable.deleteKeysMor(spark, root, "id", Seq(1L, 2L).toDF("id"))
    val want = TxnTable.read(spark, root).collect().map(_.toSeq).toSet
    TxnTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    assert(TxnTable.read(spark, root).collect().map(_.toSeq).toSet === want,
      "vacuum reclaimed a live delete file")
  }
}
