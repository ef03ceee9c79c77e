package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.graft.ParquetWriteShim
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.sinks.TxnTable
import graft.sinks.TxnTable.Snapshot

/** The txn table as a real DSv2 STREAMING WRITE — what
  * `df.writeStream.toTable("graft_cat.db.t")` runs (the catalog-resolved
  * table advertises STREAMING_WRITE; the path-based provider deliberately
  * does NOT, so path streams keep the V1 sink and its checkpoint-scoped
  * key — a query's resolution path is part of its definition, which is
  * what keeps each query's idempotence key stable across restarts).
  *
  * Executors stage parquet with the table's hidden-partitioning fan-out
  * ([[GraftFanout]] — the same task writer SQL UPDATE/MERGE uses, so
  * streamed files prune exactly like appended ones); the driver commits
  * each epoch through [[TxnTable.commitStagedBatch]] with the
  * (queryId, epochId) idempotence key — the streaming query id is
  * checkpoint-stable, so a restart's replayed epoch finds its own
  * commit, no-ops, and deletes the replay's freshly-staged orphans.
  * Append mode appends; Complete mode (Spark calls `truncate()` on the
  * write builder) replaces content per epoch. Retried/speculative task
  * attempts write attempt-unique names and only driver-acknowledged
  * files are referenced; the rest are [[TxnTable.vacuum]] food. */
class GraftTxnStreamingWrite(spark: SparkSession, root: String,
                             snap: Snapshot, queryId: String,
                             schema: StructType, replace: Boolean)
    extends StreamingWrite {

  private val relDir = s"data/${UUID.randomUUID().toString.take(8)}"
  private val streamId = s"q:$queryId"

  /** On a mapped table, APPEND epochs stage under the frozen PHYSICAL
    * names (positional rename, like the row-level write); Complete-mode
    * epochs REPLACE the table and reset the mapping, so they stage the
    * query's own (logical) names — the replacement snapshot records
    * them as the fresh identity. */
  private val writeSchema: StructType =
    if (replace) schema else GraftRowLevelOperation.physicalize(schema, snap)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    val (factory, conf) = ParquetWriteShim.prepare(spark, writeSchema)
    new GraftTxnStreamingWriterFactory(root.stripSuffix("/"), relDir,
      factory, conf, writeSchema, GraftFanout.specs(spark, snap, writeSchema))
  }

  private def stagedOf(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.collect { case GraftStagedFiles(rels) => rels }.flatten.toSeq

  private def delete(rels: Seq[String]): Unit = {
    val base = new Path(root.stripSuffix("/"))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rels.foreach(rel => fs.delete(new Path(base, rel), false))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    TxnTable.commitStagedBatch(spark, root, stagedOf(messages), epochId,
        streamId, schema, replace,
        stagedPhys = if (replace) None else Some(writeSchema.fieldNames.toSeq)) match {
      case None => delete(stagedOf(messages)) // replayed epoch: clean the re-stage
      case Some(_) => ()
    }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    delete(stagedOf(messages))

  override def toString: String = s"GraftTxnStreamingWrite($root, $streamId)"
}

/** Serializable executor half: the row-level task writer with an
  * epoch-unique file name (one relDir per query run; files from
  * different epochs, partitions, and attempts never collide). */
class GraftTxnStreamingWriterFactory(base: String, relDir: String,
                                     factory: OutputWriterFactory,
                                     conf: SerializableConfiguration,
                                     schema: StructType,
                                     fanout: Seq[GraftFanout])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftRowLevelDataWriter(base, relDir,
      s"part-$epochId-$partitionId-$taskId.parquet",
      factory, conf, schema, fanout, partitionId, taskId)
}
