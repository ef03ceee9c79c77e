package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.LlmOps
import graft.sinks.TxnTable

/** Near-dedup state over a MUTATING transactional corpus — the
  * composition a production corpus store actually runs: documents live
  * in a txn table (deletes, merges, restores — [[TxnTable]]), and the
  * MinHash signature store that dedup serves from ([[NearDupStream]]'s
  * store schema: band, key, doc_id) must track it WITHOUT rescanning
  * the corpus.
  *
  * [[sync]] folds the source's change feed ([[TxnTable.changesBetween]])
  * into the store, which is ITSELF a txn table:
  *  - feed `delete` rows → copy-on-write delete of those doc_ids'
  *    signature rows (stats-pruned on doc_id, so only store files whose
  *    recorded [min, max] overlap the deleted ids are rewritten);
  *  - feed `insert` rows → signatures computed for EXACTLY those docs
  *    (an update = delete+insert on the key, so re-signed content
  *    replaces its old rows);
  *  - the sync marker is the store's own commit op tag (appendBatch
  *    keyed by the SOURCE version) — atomic with the data it marks, so
  *    a crash between the delete and the append replays idempotently
  *    (the re-run delete matches nothing, the append proceeds).
  *
  * Incremental cost ∝ the CHANGE: changesBetween reads only files added
  * or removed between the versions, signatures are computed only for
  * inserted rows, and the store delete rewrites only stats-overlapping
  * files. The corpus is never rescanned — except through the one honest
  * escape hatch: a mass delete (> [[DeleteRebuildCap]] ids) or a store
  * whose marker is AHEAD of the source log (a recreated source) is
  * rebuild-class work by definition and falls back to a full rebuild,
  * logged by returning through [[rebuild]]'s replace commit.
  *
  * A RESTORE of the source needs no special case: restore commits a NEW
  * version (roll-forward), so the feed from the synced version to the
  * restored head is an ordinary diff. NearDupTxnSpec pins store ==
  * full-rebuild equivalence after append, delete, merge, and restore.
  *
  * Merge-on-read deletes on the source ([[TxnTable.deleteKeysMor]])
  * need no special case either: changesBetween is MoR-native — a live
  * equality-delete file feeds as keyed delete events carrying the
  * pre-image — so the sync tracks a GDPR-style MoR delete exactly like
  * a copy-on-write one, without waiting for a source `compactDeletes`.
  */
object NearDupTxn {

  /** Above this many deleted doc ids in one sync, rebuild instead: the
    * driver-held id list and the copy-on-write delete both scale with
    * the delete set, and a mass delete is rebuild-class work anyway. */
  private val DeleteRebuildCap = 100000

  /** Banded MinHash signatures of (doc_id, text) rows — the same B×R
    * scheme as batch q25 and [[NearDupStream]], so all three stores
    * interoperate. */
  private[graft] def signatures(docs: DataFrame): DataFrame = {
    val sh = docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(LlmOps.shingles3(col("tk"))).as("sh"))
    LlmOps.bandRows(LlmOps.minhashAgg(sh))
  }

  // the marker rides the batch-keyed op tags TxnTable already writes
  private val AppendTag = "append-batch:"
  private val ReplaceTag = "replace-batch:"

  /** The source version the store is synced to, read from the store's
    * own txn log — no side-channel marker file to drift or lose. */
  def syncedVersion(s: SparkSession, storeRoot: String): Option[Long] = {
    val ids = TxnTable.versions(s, storeRoot)
      .map(v => TxnTable.snapshot(s, storeRoot, v).op)
      .collect {
        case op if op.startsWith(AppendTag) =>
          op.stripPrefix(AppendTag).toLong
        case op if op.startsWith(ReplaceTag) =>
          op.stripPrefix(ReplaceTag).toLong
      }
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Bring the signature store at `storeRoot` up to date with the
    * document txn table at `docsRoot`. Returns the source version the
    * store is now synced to; a no-change call is a metadata-only no-op.
    * Serialized per JVM: a sync is two commits (delete, then the
    * marker-carrying append) and two interleaved syncs would race them
    * into TxnConflictExceptions; cross-JVM writers are still safe — the
    * store's optimistic commits make a lost race loud, and replaying
    * the failed sync converges (the idempotence argument above). */
  def sync(s: SparkSession, docsRoot: String, storeRoot: String): Long = synchronized {
    val srcVer = TxnTable.latest(s, docsRoot).getOrElse(throw new IllegalStateException(
      s"no committed snapshot at $docsRoot")).version
    syncedVersion(s, storeRoot) match {
      case Some(v0) if v0 == srcVer => srcVer
      case Some(v0) if v0 < srcVer =>
        val feed = TxnTable.changesBetween(s, docsRoot, v0, srcVer)
        val delIds = feed.filter(col("_change_type") === "delete")
          .select(col("doc_id")).distinct()
          .limit(DeleteRebuildCap + 1)
          .collect().map(_.getLong(0)).sorted
        if (delIds.length > DeleteRebuildCap)
          rebuild(s, docsRoot, storeRoot, srcVer)
        else {
          if (delIds.nonEmpty)
            TxnTable.deleteWhere(s, storeRoot,
              col("doc_id").isin(delIds.map(Long.box): _*),
              statsRange = Some((delIds.head, delIds.last)))
          TxnTable.appendBatch(s, storeRoot,
            signatures(feed.filter(col("_change_type") === "insert")
              .select(col("doc_id"), col("text"))), srcVer)
          srcVer
        }
      case _ => // no store yet, or marker ahead of a recreated source
        rebuild(s, docsRoot, storeRoot, srcVer)
    }
  }

  /** Flag an incoming batch against the synced store: banded signatures
    * of the batch (bounded) BROADCAST against the store's CURRENT
    * snapshot — [[NearDupStream.priorFlagJoin]]'s topology, served from
    * the txn-maintained state. Because the store tracks source deletes,
    * a document the corpus has forgotten no longer flags anything —
    * dedup-respects-deletes, the property NearDupTxnSpec pins (the
    * GDPR composition: delete + sync + re-ingest must re-admit). */
  def flagBatch(s: SparkSession, storeRoot: String,
                batch: DataFrame): DataFrame =
    NearDupStream.priorFlagJoin(signatures(batch),
      TxnTable.read(s, storeRoot))
      .filter(col("doc_id") =!= col("dup_of"))
      .distinct()

  private def rebuild(s: SparkSession, docsRoot: String, storeRoot: String,
                      srcVer: Long): Long = {
    // statsCol=doc_id from first build: every later incremental delete
    // prunes store files by the manifest's recorded [min, max]
    TxnTable.replaceBatch(s, storeRoot,
      signatures(TxnTable.read(s, docsRoot).select(col("doc_id"), col("text"))),
      srcVer, statsCols = Seq("doc_id"))
    srcVer
  }
}
