package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.LlmOps

/** Streaming MinHash near-dedup at ingest — the incremental form of the
  * q25 (candidates) / q30 (verify) batch pipeline, the shape a real
  * LLM-ingest pipeline runs: every arriving document is checked against
  * the signatures of EVERYTHING ingested before it, not just the current
  * micro-batch.
  *
  * Per micro-batch (foreachBatch):
  *  1. banded MinHash signatures for the batch's docs — the SAME B×R
  *     scheme as batch q25 (LlmOps.minhashAgg/bandRows), so the store is
  *     seedable from, and joinable against, the batch pipeline's output;
  *  2. flag collisions: a (band, key) hit against the persisted store
  *     (prior batches) flags the new doc against the stored doc; in-batch
  *     collisions come from the same skew-capped bucketPairs as q25, with
  *     the keep-min-id convention (doc_b flagged as dup of doc_a);
  *  3. append the batch's signatures to the store.
  *
  * Scale posture: the signature store lives OUT of the streaming state
  * store — it is an unbounded, append-only parquet dataset (that is the
  * semantics of dedup-against-all-history), while per-batch work stays
  * bounded: an equi-join on (band, key) between the batch's signatures
  * and the store, with the BATCH side broadcast — a micro-batch is
  * bounded by construction, so the ever-growing store side streams
  * through the broadcast hash probe with NO shuffle and NO sort,
  * per-batch cost O(store scan), not O(store shuffle). (Plan-asserted
  * in NearDupStreamSpec; strictly better than bucketing the store,
  * which would still pay a store-wide sorted-bucket read per batch.)
  *
  * At-least-once replay safety (foreachBatch's contract), three guards:
  *  - flags and signatures are written into batch_id partitions with
  *    dynamic partition overwrite, so a replayed batch overwrites its
  *    own partitions instead of duplicating output;
  *  - the store side of the flag join is filtered to batch_id <
  *    current batch — a replay whose store write succeeded before the
  *    checkpoint committed must not join against its own stored rows
  *    (self-flags / bidirectional pairs) and, because the filter keys
  *    on a partition column, prunes rather than scans them;
  *  - doc_id =!= dup_of on the final flag set — belt-and-braces for a
  *    source that legitimately re-delivers a doc_id in a later batch.
  */
object NearDupStream {

  final case class Doc(doc_id: Long, text: String)

  private def bandSignatures(batch: DataFrame): DataFrame = {
    val sh = batch
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(LlmOps.shingles3(col("tk"))).as("sh"))
    LlmOps.bandRows(LlmOps.minhashAgg(sh))
  }

  /** The per-batch flag join: the batch's signatures (bounded by the
    * micro-batch) BROADCAST against the prior-batch store (unbounded) —
    * the store side streams through the hash probe with no shuffle.
    * Exposed package-private so the spec can plan-assert exactly the
    * join the stream runs. */
  private[graft] def priorFlagJoin(bands: DataFrame, store: DataFrame): DataFrame =
    broadcast(bands).join(store.select(col("band"), col("key"),
        col("doc_id").as("dup_of")), Seq("band", "key"))
      .select(col("doc_id"), col("dup_of"))

  /** One micro-batch of the ingest-dedup pipeline — exposed
    * package-private so the spec can drive an at-least-once REPLAY
    * (same batchId twice) directly, the failure mode foreachBatch's
    * contract allows but MemoryStream won't reproduce on demand. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  storeDir: String, flagDir: String): Unit = {
    val spark = batch.sparkSession
    val bands = bandSignatures(batch).persist()
    try {
      val fs = new org.apache.hadoop.fs.Path(storeDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val priorFlags =
        if (fs.exists(new org.apache.hadoop.fs.Path(storeDir))) {
          // prior batches ONLY (partition-pruned): a replayed batch must
          // not see its own store rows
          priorFlagJoin(bands,
            spark.read.parquet(storeDir).filter(col("batch_id") < batchId))
        } else spark.emptyDataFrame
          .withColumn("doc_id", lit(0L)).withColumn("dup_of", lit(0L))
      val inBatchFlags = LlmOps.bucketPairs(bands)
        .select(col("doc_b").as("doc_id"), col("doc_a").as("dup_of"))
      // a 0-row partitioned write leaves no footer to infer a schema
      // from, so empty batches write nothing (deterministic recompute
      // on replay makes the skip idempotent too)
      def writeNonEmpty(df: DataFrame, dir: String): Unit = {
        val out = df.withColumn("batch_id", lit(batchId)).persist()
        try if (out.head(1).nonEmpty) {
          out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(dir)
        } finally out.unpersist()
      }
      writeNonEmpty(priorFlags.unionByName(inBatchFlags)
        .filter(col("doc_id") =!= col("dup_of")).distinct(), flagDir)
      writeNonEmpty(bands, storeDir)
    } finally bands.unpersist()
  }

  /** Start the ingest-dedup stream. `storeDir` holds the signature store
    * (band, key, doc_id, batch_id); `flagDir` accumulates flagged pairs
    * (doc_id, dup_of, batch_id). Both are plain parquet datasets readable
    * by any downstream batch job. */
  def start(docs: Dataset[Doc], storeDir: String, flagDir: String,
            checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storeDir, flagDir)
      }
      .start()
}
