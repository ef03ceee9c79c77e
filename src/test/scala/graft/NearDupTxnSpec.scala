package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable

/** [[NearDupTxn]]: the signature store tracks a mutating document txn
  * table through append / delete / merge / restore, and after every
  * sync equals a from-scratch rebuild over the source's current
  * snapshot — the IVM contract for dedup state. */
class NearDupTxnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val srcSf = "/root/testdata/sf0.001"

  private def storeRows(storeRoot: String): Set[(Int, String, Long)] =
    TxnTable.read(spark, storeRoot)
      .select(col("band").cast("int"), col("key"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  private def rebuiltRows(docsRoot: String): Set[(Int, String, Long)] =
    NearDupTxn.signatures(
        TxnTable.read(spark, docsRoot).select(col("doc_id"), col("text")))
      .select(col("band").cast("int"), col("key"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  test("store == full rebuild after append, delete, merge, and restore") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.t(spark, srcSf, "documents")
      .select($"doc_id", $"text")
    val docsRoot = Files.createTempDirectory("ndtxn_docs").toString
    val storeRoot = Files.createTempDirectory("ndtxn_store").toString

    // v1: initial corpus -> full build
    TxnTable.append(spark, docsRoot, docs.filter($"doc_id" < 200),
      statsCols = Seq("doc_id"))
    assert(NearDupTxn.sync(spark, docsRoot, storeRoot) === 1L)
    assert(storeRows(storeRoot) === rebuiltRows(docsRoot))
    assert(NearDupTxn.syncedVersion(spark, storeRoot) === Some(1L))

    // repeat sync with no source change: metadata-only no-op
    val nVersions = TxnTable.versions(spark, storeRoot).size
    assert(NearDupTxn.sync(spark, docsRoot, storeRoot) === 1L)
    assert(TxnTable.versions(spark, storeRoot).size === nVersions)

    // v2: APPEND new docs -> only the delta is signed
    TxnTable.append(spark, docsRoot, docs.filter($"doc_id".between(200, 299)))
    assert(NearDupTxn.sync(spark, docsRoot, storeRoot) === 2L)
    assert(storeRows(storeRoot) === rebuiltRows(docsRoot))

    // v3: DELETE a slice -> its signature rows disappear
    TxnTable.deleteWhere(spark, docsRoot, col("doc_id") % 7 === 0,
      statsRange = Some((0L, 299L)))
    assert(NearDupTxn.sync(spark, docsRoot, storeRoot) === 3L)
    val afterDelete = storeRows(storeRoot)
    assert(afterDelete === rebuiltRows(docsRoot))
    assert(!afterDelete.exists(_._3 % 7 == 0), "deleted docs still signed")

    // v4: MERGE rewrites some texts -> their signatures are re-derived
    val changes = TxnTable.read(spark, docsRoot)
      .filter($"doc_id" % 11 === 0)
      .withColumn("text", concat($"text", lit(" merged merged merged")))
    TxnTable.mergeInto(spark, docsRoot, changes, Seq("doc_id"),
      statsRange = Some((0L, 299L)))
    assert(NearDupTxn.sync(spark, docsRoot, storeRoot) === 4L)
    assert(storeRows(storeRoot) === rebuiltRows(docsRoot))

    // v5: RESTORE the source to v2 (pre-delete, pre-merge) — restore is
    // a roll-forward commit, so the sync is an ordinary incremental diff
    TxnTable.restore(spark, docsRoot, 2L)
    assert(NearDupTxn.sync(spark, docsRoot, storeRoot) === 5L)
    val afterRestore = storeRows(storeRoot)
    assert(afterRestore === rebuiltRows(docsRoot))
    assert(afterRestore.exists(_._3 % 7 == 0), "restore must resurrect signatures")

    // v6: MERGE-ON-READ delete on the source, NO compactDeletes — the
    // MoR-native feed emits the delete file as keyed delete events and
    // the sync folds them like any other delete
    TxnTable.deleteKeysMor(spark, docsRoot, "doc_id",
      docs.filter($"doc_id" % 13 === 0).select($"doc_id"))
    assert(TxnTable.latest(spark, docsRoot).get.deletes.nonEmpty,
      "test needs LIVE MoR delete files on the source")
    assert(NearDupTxn.sync(spark, docsRoot, storeRoot) === 6L)
    val afterMor = storeRows(storeRoot)
    assert(afterMor === rebuiltRows(docsRoot))
    assert(!afterMor.exists(_._3 % 13 == 0), "MoR-deleted docs still signed")
  }

  test("flagBatch respects source deletes (the GDPR re-admit composition)") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.t(spark, srcSf, "documents")
      .select($"doc_id", $"text")
    val docsRoot = Files.createTempDirectory("ndtxn_docs2").toString
    val storeRoot = Files.createTempDirectory("ndtxn_store2").toString
    TxnTable.append(spark, docsRoot, docs.filter($"doc_id" < 100),
      statsCols = Seq("doc_id"))
    NearDupTxn.sync(spark, docsRoot, storeRoot)

    // an exact re-ingest of a stored long document flags against it
    val victim = docs.filter($"doc_id" === 42 && length($"text") > 50)
      .select(lit(900042L).as("doc_id"), $"text")
    assert(victim.count() === 1, "test needs doc 42 with enough shingles")
    val flagged = NearDupTxn.flagBatch(spark, storeRoot, victim)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged.contains((900042L, 42L)),
      s"re-ingest of a stored doc must flag against it: ${flagged.toSeq}")

    // forget the doc, sync — the SAME batch must no longer flag to 42
    TxnTable.deleteWhere(spark, docsRoot, col("doc_id") === 42,
      statsRange = Some((42L, 42L)))
    NearDupTxn.sync(spark, docsRoot, storeRoot)
    val after = NearDupTxn.flagBatch(spark, storeRoot, victim)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!after.exists(_._2 == 42L),
      s"deleted doc still flagging: ${after.toSeq}")
  }
}
