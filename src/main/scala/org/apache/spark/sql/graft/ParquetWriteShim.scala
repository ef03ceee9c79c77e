package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet writing for the row-level-operation
  * [[org.apache.spark.sql.connector.write.BatchWrite]] (SQL
  * UPDATE / MERGE INTO on graft-txn tables): the DataSourceV2 write
  * protocol hands each task an iterator of [[InternalRow]]s, and the
  * rows must become parquet files WITHOUT a driver-side `df.write`
  * round-trip. Spark's own machinery for exactly this —
  * `ParquetUtils.prepareWrite` (schema/codec/timestamp-mode conf
  * plumbing) and the [[OutputWriterFactory]] it returns — is
  * `private[sql]`, so this adapter lives inside the
  * `org.apache.spark.sql` namespace like [[ExprBridge]]. The staged
  * files are byte-compatible with the session's normal `df.write`
  * output: same WriteSupport, same conf resolution, so the txn
  * manifest's footer-derived stats/blooms/counts machinery reads them
  * identically. */
object ParquetWriteShim {

  /** Driver side: resolve the session's parquet write configuration
    * once. Both returned pieces are java-serializable and ship inside
    * the DataWriterFactory. */
  def prepare(spark: SparkSession,
              schema: StructType): (OutputWriterFactory, SerializableConfiguration) = {
    val sqlConf = spark.sessionState.conf
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val factory = ParquetUtils.prepareWrite(sqlConf, job, schema,
      new ParquetOptions(Map.empty[String, String], sqlConf))
    (factory, new SerializableConfiguration(job.getConfiguration))
  }

  /** Executor side: open one parquet writer at `path`. */
  def open(factory: OutputWriterFactory, conf: SerializableConfiguration,
           schema: StructType, path: String,
           partitionId: Int, taskId: Long): ParquetRowWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(new org.apache.hadoop.mapreduce.JobID("graft-rlw", 0),
        TaskType.MAP, partitionId),
      // task id folds into the attempt id so a retried/speculative task
      // never collides with the first attempt's open file handle
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(conf.value, attempt)
    new ParquetRowWriter(factory.newInstance(path, schema, ctx))
  }

  def hadoopConf(conf: SerializableConfiguration): Configuration = conf.value
}

/** Thin close-once handle around the `private[sql]` OutputWriter. */
final class ParquetRowWriter(
    writer: org.apache.spark.sql.execution.datasources.OutputWriter) {
  def write(row: InternalRow): Unit = writer.write(row)
  def close(): Unit = writer.close()
}
