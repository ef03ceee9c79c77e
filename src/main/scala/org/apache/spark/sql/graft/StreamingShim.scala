package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** One-constructor bridge into Spark's `private[sql]` DataFrame
  * factory, used in both streaming directions.
  *
  * A v1 [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch`
  * must hand MicroBatchExecution a DataFrame whose logical plan carries
  * `isStreaming = true` (the engine asserts it); conversely a v1
  * [[org.apache.spark.sql.execution.streaming.Sink]]'s `addBatch`
  * receives a DataFrame whose analyzed plan still carries the streaming
  * tag, which `df.write` refuses — the established out-of-tree pattern
  * for both (FileStreamSource / every v1 sink that re-plans) is
  * `internalCreateDataFrame(rdd, schema, isStreaming)`, which is
  * `private[sql]`, so this shim lives in the sql namespace. Nothing
  * else in the repo reaches into Spark internals; keep it that way
  * (this object stays one constructor, two directions).
  */
object StreamingShim {

  private def rewrap(df: DataFrame, streaming: Boolean): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = streaming)
  }

  /** Re-wrap a batch DataFrame as a streaming-tagged one: same rows,
    * same schema, the physical plan compiled once into an InternalRow
    * RDD (still lazy — nothing executes until the micro-batch runs). */
  def asStreamingBatch(df: DataFrame): DataFrame = rewrap(df, streaming = true)

  /** The sink-side inverse: re-wrap `addBatch`'s streaming-tagged
    * micro-batch as a plain batch DataFrame so the txn writer's
    * `df.write` path accepts it — no row copies, no Row round-trip
    * (the InternalRow RDD is reused as-is; the batch executes exactly
    * once, when the txn writer stages it). */
  def asBatch(df: DataFrame): DataFrame = rewrap(df, streaming = false)
}
