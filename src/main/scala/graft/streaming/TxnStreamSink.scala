package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

import graft.sinks.TxnTable

/** The txn table as a Structured Streaming SINK —
  * `df.writeStream.format("graft-txn").option("path", root)` — with the
  * exactly-once contract the format's idempotent batch commits already
  * provide ([[TxnTable.appendBatch]] / [[TxnTable.replaceBatch]]): the
  * commit op carries (streamId, batchId), so a replayed micro-batch
  * (restart, speculative re-run of addBatch) finds its own commit in
  * the log and no-ops — the Delta-sink mechanism (txnAppId/txnVersion),
  * upgraded from at-least-once by the txn log itself.
  *
  * Output modes map onto the format's three idempotent commit shapes:
  * Append → [[TxnTable.appendBatch]] (one new version per micro-batch);
  * Complete → [[TxnTable.replaceBatch]] (each batch REPLACES content —
  * the materialized-aggregate shape, old versions stay time-travelable);
  * Update → [[TxnTable.mergeBatch]] with `option("mergeKeys", "k1,k2")`
  * (each batch UPSERTS its changed keys — the stateful-aggregation
  * shape: sessionization or a running top-k sinks only the keys a
  * trigger touched, and the rewrite is bounded to the files whose
  * recorded key range overlaps the batch, never a Complete-mode full
  * rewrite). Update without mergeKeys refuses loud — an update stream
  * without row identity is not expressible as merge-or-replace.
  *
  * The idempotence key must be STABLE across restarts and UNIQUE per
  * query writing the table: `streamId` option, defaulting to the
  * query's `checkpointLocation` (stable by construction — the restart
  * reads the same checkpoint). A query with neither refuses loud: it
  * cannot be restarted exactly-once anyway, and two anonymous streams
  * sharing batch-id space would silently swallow each other's batches.
  *
  * Appends inherit the table's recorded statsCols/bloomCols/transform
  * spec like every other writer; a first batch into a fresh root
  * creates the table. */
class TxnStreamSink(s: SparkSession, root: String, streamId: String,
                    mode: OutputMode, mergeKeys: Seq[String] = Nil) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // addBatch hands a streaming-tagged DataFrame; the txn writer's
    // df.write staging path needs the batch view (same plan, no copies)
    val batch = org.apache.spark.sql.graft.StreamingShim.asBatch(data)
    val committed =
      if (mode == OutputMode.Complete())
        TxnTable.replaceBatch(s, root, batch, batchId, streamId = streamId)
      else if (mode == OutputMode.Update())
        TxnTable.mergeBatch(s, root, batch, batchId, mergeKeys,
          streamId = streamId)
      else
        TxnTable.appendBatch(s, root, batch, batchId, streamId = streamId)
    committed match {
      case None => // replay of an already-committed batch: exactly-once no-op
      case Some(_) => ()
    }
  }

  override def toString: String = s"TxnStreamSink($root, $streamId, $mode)"
}
