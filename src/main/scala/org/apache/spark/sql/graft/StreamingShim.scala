package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** One-method bridge into Spark's `private[sql]` streaming constructor.
  *
  * A v1 [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch`
  * must hand MicroBatchExecution a DataFrame whose logical plan carries
  * `isStreaming = true` (the engine asserts it). Spark's own v1 sources
  * (FileStreamSource) do this via `internalCreateDataFrame(rdd, schema,
  * isStreaming = true)`, which is `private[sql]` — so this shim lives in
  * the sql namespace, the established pattern for out-of-tree v1
  * connectors. Nothing else in the repo reaches into Spark internals;
  * keep it that way (this object stays one method).
  */
object StreamingShim {

  /** Re-wrap a batch DataFrame as a streaming-tagged one: same rows,
    * same schema, the physical plan compiled once into an InternalRow
    * RDD (still lazy — nothing executes until the micro-batch runs). */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
