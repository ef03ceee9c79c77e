package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Stream-STATIC enrichment join — the ingest-time dimension lookup
  * (every event tagged with its user's current segment/tier), the last
  * §2.12 join shape beside the stream-stream interval join.
  *
  * Scale posture: the static side is a DIMENSION — small relative to
  * the stream — so it is broadcast and the streaming side never
  * shuffles (stateless: no watermark, no state store; an event is
  * enriched in the micro-batch it arrives in). Left join: an event
  * with no dim row survives with nulls (ingest must not drop on
  * missing metadata).
  *
  * Two deployment modes, split by whether the dim can change:
  *  - FIXED dim for the query's lifetime: join the stream directly
  *    ([[withSegments]] on the streaming Dataset). Caveat discovered
  *    the hard way (EnrichSpec's first draft): the static subplan IS
  *    re-executed per micro-batch, but a path-based parquet relation
  *    pins its FILE LISTING at analysis — overwriting the dim dir
  *    fails later batches with FAILED_READ_FILE.FILE_NOT_EXIST, and
  *    `catalog.refreshByPath` cannot reach the index instance captured
  *    inside the running streaming plan.
  *  - REFRESHABLE dim: [[refreshableEnriched]] — `foreachBatch`
  *    re-creates the dim DataFrame from storage EVERY batch (the
  *    standard Structured Streaming pattern for slowly-changing
  *    dimensions), so an overwrite lands batch-over-batch with no
  *    query restart. EnrichSpec proves the full refresh cycle.
  */
object Enrich {

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  /** Enrich events (batch or one micro-batch) against a (user_id,
    * segment) dimension: broadcast left join, stateless. */
  def withSegments(events: Dataset[Event], dim: DataFrame): DataFrame =
    events.join(
      broadcast(dim).withColumnRenamed("user_id", "d_user"),
      events("user_id") === col("d_user"),
      "left")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("segment"))

  /** Streaming enrichment with a dim that may be OVERWRITTEN between
    * micro-batches: the dim is re-read from `dimDir` per batch, the
    * enriched batch appended to `outDir`. */
  def refreshableEnriched(s: SparkSession, events: Dataset[Event],
                          dimDir: String, outDir: String): DataStreamWriter[Event] =
    events.writeStream
      .foreachBatch { (batch: Dataset[Event], _: Long) =>
        withSegments(batch, s.read.parquet(dimDir))
          .write.mode("append").parquet(outDir)
      }
}
