package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Lit, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.graft.{ParquetRowWriter, ParquetWriteShim}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.sinks.TxnTable
import graft.sinks.TxnTable.Snapshot

/** SQL UPDATE / MERGE INTO (and subquery DELETE) for graft-txn tables,
  * through Spark's GROUP-BASED row-level-operation framework — the
  * copy-on-write shape Iceberg pioneered on this exact API:
  *
  *  1. Spark rewrites the statement into a `ReplaceData` plan: read the
  *     affected GROUPS (files, for this format), recompute their rows
  *     (update assignments / merge actions applied, untouched rows
  *     carried verbatim), write the replacement.
  *  2. The operation's SCAN decides which files those are. It
  *     implements [[SupportsRuntimeV2Filtering]] on the table's PRIMARY
  *     STATS COLUMN: Spark runs the statement's condition as a
  *     group-discovery subquery (on a normal fully-pushed-down read
  *     scan), hands the matching column values back, and the scan keeps
  *     only files whose recorded min/max range or bloom can contain any
  *     of them — manifest math, the same [[GraftTxnFileIndex.mayMatch]]
  *     proof a SELECT gets, now deciding the REWRITE set. This is the
  *     row-level analog of dynamic partition pruning: `UPDATE t SET …
  *     WHERE id = 7` on a clustered table rewrites the one file holding
  *     id 7 and carries the rest by reference.
  *  3. The WRITE stages the replacement rows as parquet from the
  *     executors (DSv2 write protocol — no driver round-trip; see
  *     [[ParquetWriteShim]]) and commits through
  *     [[TxnTable.commitReplace]]: scanned files out, staged files in,
  *     one atomic version, stats/blooms recomputed for the staged files
  *     only, REFUSED LOUD if the table head moved since planning
  *     (serializable row-level isolation).
  *
  * Soundness invariants, in framework terms:
  *  - the scan NEVER pushes row filters to parquet (no pushdown
  *    interfaces on the builder): a group-based write must receive
  *    every row of every scanned file, matched or not — file-granular
  *    pruning only.
  *  - runtime-filter values it cannot interpret prune NOTHING; if the
  *    filter never fires (conf off, non-translatable condition), every
  *    file is scanned and rewritten — a full-table rewrite is the
  *    correct degenerate case, never an incorrect narrow one.
  *  - MoR-live snapshots refuse at operation build (rewriting a file
  *    without applying its pending delete keys would resurrect rows);
  *    `compactDeletes` first.
  *  - staged files land flat (no hidden-partitioning fan-out): on a
  *    transformed table the rewritten files lose transform-value
  *    pruning until the next clustering compaction — weaker pruning,
  *    never wrong results.
  */
class GraftRowLevelOperation(spark: SparkSession, root: String,
                             val snap: Snapshot, cmd: Command,
                             tableSchema: StructType)
    extends RowLevelOperation {

  /** Files the scan will read = files the write will replace. Narrowed
    * by the runtime group filter; defaults to the whole snapshot (the
    * sound full-rewrite fallback). Driver-side state shared between the
    * operation's scan and write — the framework guarantees both come
    * from this one instance, and the scan plans before the write
    * commits. */
  @volatile private[sources] var scannedFiles: Set[String] = snap.files.toSet

  private[sources] def opTag: String = cmd match {
    case Command.DELETE => "delete"
    case Command.UPDATE => "update"
    case Command.MERGE  => "merge"
  }

  override def command(): Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new GraftRowLevelScan(spark, root, snap, tableSchema,
          GraftRowLevelOperation.this)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          val relDir = s"data/${UUID.randomUUID().toString.take(8)}"
          val (factory, conf) = ParquetWriteShim.prepare(spark, info.schema())
          new GraftReplaceBatchWrite(spark, root, GraftRowLevelOperation.this,
            relDir, factory, conf, info.schema())
        }
      }
    }
}

/** The group scan: reads whole files, no row filtering, runtime group
  * filter on the primary stats column (see [[GraftRowLevelOperation]]).
  * Each partition-planning call builds a FRESH vectorized
  * [[ParquetScanBuilder]] scan over the current file set, so the
  * post-filter re-plan can never serve a stale cached partition list. */
class GraftRowLevelScan(spark: SparkSession, root: String, snap: Snapshot,
                        tableSchema: StructType, op: GraftRowLevelOperation)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var files: Seq[String] = snap.files

  override def readSchema(): StructType = tableSchema

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-txn row-level ${op.opTag} scan of $root@v${snap.version}"

  private def statsCol: Option[String] =
    snap.statsCols.headOption.filter(c => tableSchema.fieldNames.contains(c))

  override def filterAttributes(): Array[NamedReference] =
    statsCol.map(c => Expressions.column(c)).toArray

  override def filter(predicates: Array[Predicate]): Unit = {
    for {
      col <- statsCol
      vs  <- predicates.iterator
                .flatMap(GraftRowLevelScan.pointValues(_, col)).nextOption()
    } {
      val c = GraftTxnFileIndex.Constraint(
        lo = if (vs.isEmpty) Long.MinValue else vs.min,
        hi = if (vs.isEmpty) Long.MaxValue else vs.max,
        points = Some(vs))
      files = files.filter(rel => GraftTxnFileIndex.mayMatch(snap, rel, Map(col -> c)))
      op.scannedFiles = files.toSet
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    op.scannedFiles = files.toSet
    freshScan().planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    freshScan().createReaderFactory()

  private def freshScan(): Batch =
    ParquetScanBuilder(spark,
      new GraftTxnFileIndex(spark, root, snap, tableSchema, Some(files)),
      tableSchema, tableSchema, CaseInsensitiveStringMap.empty()).build().toBatch
}

object GraftRowLevelScan {

  private def litLong(v: Any): Option[Long] = v match {
    case lv: V2Lit[_] => lv.dataType() match {
      case LongType    => Some(lv.value.asInstanceOf[Long])
      case IntegerType => Some(lv.value.asInstanceOf[Int].toLong)
      case ShortType   => Some(lv.value.asInstanceOf[Short].toLong)
      case ByteType    => Some(lv.value.asInstanceOf[Byte].toLong)
      case _           => None
    }
    case _ => None
  }

  /** The runtime filter arrives as `col IN (v1, …, vn)` (how
    * `DataSourceV2Strategy.translateRuntimeFilterV2` encodes the
    * group-discovery subquery's values). Anything else → None → no
    * pruning, full rewrite — sound. */
  private[sources] def pointValues(p: Predicate, col: String): Option[Seq[Long]] = {
    def isCol(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference => r.fieldNames().toSeq == Seq(col)
        case _ => false
      }
    p.name() match {
      case "IN" if p.children().nonEmpty && isCol(p.children().head) =>
        val vs = p.children().drop(1).map(litLong)
        if (vs.forall(_.isDefined)) Some(vs.flatten.toSeq) else None
      case "=" if p.children().length == 2 && isCol(p.children().head) =>
        litLong(p.children()(1)).map(Seq(_))
      case _ => None
    }
  }
}

/** Driver-side write half: collects the staged file names the executors
  * report and commits the group replacement through
  * [[TxnTable.commitReplace]]. */
class GraftReplaceBatchWrite(spark: SparkSession, root: String,
                             op: GraftRowLevelOperation, relDir: String,
                             factory: OutputWriterFactory,
                             conf: SerializableConfiguration,
                             schema: StructType)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftRowLevelWriterFactory(root.stripSuffix("/"), relDir, factory,
      conf, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case GraftStagedFiles(rels) => rels }
      .flatten.toSeq
    TxnTable.commitReplace(spark, root, op.snap.version, op.scannedFiles,
      staged, op.opTag)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(root.stripSuffix("/"))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case GraftStagedFiles(rels) => rels }.flatten
      .foreach(rel => fs.delete(new Path(base, rel), false))
  }
}

case class GraftStagedFiles(rels: Seq[String]) extends WriterCommitMessage

/** Serializable executor half — primitives only (no session, no op). */
class GraftRowLevelWriterFactory(base: String, relDir: String,
                                 factory: OutputWriterFactory,
                                 conf: SerializableConfiguration,
                                 schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftRowLevelDataWriter(base,
      s"$relDir/part-$partitionId-$taskId.parquet",
      factory, conf, schema, partitionId, taskId)
}

/** One task's parquet writer. Opens LAZILY on the first row (an empty
  * partition stages no file) at a task-unique path — a retried or
  * speculative attempt writes a different file name, and only the
  * attempt whose commit message the driver receives is referenced;
  * orphans are unreferenced data for [[TxnTable.vacuum]]. */
class GraftRowLevelDataWriter(base: String, rel: String,
                              factory: OutputWriterFactory,
                              conf: SerializableConfiguration,
                              schema: StructType,
                              partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private var writer: ParquetRowWriter = _

  /** A `ReplaceData` child emits `[__row_operation, <data cols>]` and —
    * when the operation requests no metadata attributes — Spark's plain
    * `DataWritingSparkTask` hands those rows through UNPROJECTED (the
    * row projection is only applied by the metadata-writing task). The
    * op code is always WRITE (5) or WRITE_WITH_METADATA (6) for a
    * group-based rewrite; anything else would mean a delta write was
    * misrouted here, so refuse rather than write a shifted row. */
  private lazy val shift =
    new org.apache.spark.sql.catalyst.ProjectingInternalRow(schema,
      (1 to schema.length).toIndexedSeq)

  override def write(row: InternalRow): Unit = {
    if (writer == null)
      writer = ParquetWriteShim.open(factory, conf, schema, s"$base/$rel",
        partitionId, taskId)
    if (row.numFields == schema.length) writer.write(row)
    else {
      require(row.numFields == schema.length + 1 &&
          (row.getInt(0) == 5 || row.getInt(0) == 6),
        s"row-level write expected ${schema.length} data columns or a " +
          s"WRITE-op-prefixed row, got ${row.numFields} fields " +
          s"(op=${if (row.numFields > schema.length) row.getInt(0) else -1})")
      shift.project(row)
      writer.write(shift)
    }
  }

  override def commit(): WriterCommitMessage =
    if (writer == null) GraftStagedFiles(Nil)
    else { writer.close(); writer = null; GraftStagedFiles(Seq(rel)) }

  override def abort(): Unit = {
    if (writer != null) { try writer.close() catch { case _: Throwable => () } }
    writer = null
    val p = new Path(s"$base/$rel")
    val fs = p.getFileSystem(ParquetWriteShim.hadoopConf(conf))
    fs.delete(p, false)
    ()
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
