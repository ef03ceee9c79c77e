package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.graft.{ParquetRowWriter, ParquetWriteShim}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.sinks.TxnTable
import graft.sinks.TxnTable.Snapshot

/** SQL UPDATE / MERGE / subquery-DELETE as POSITION DELTAS — the
  * merge-on-read half of the row-level cost model, through Spark's
  * DELTA-based row-level framework ([[org.apache.spark.sql.connector
  * .write.SupportsDelta]], the API Iceberg's position-delta writes
  * ride):
  *
  *  1. The operation identifies rows by POSITION: `rowId = (_file,
  *     _pos)`, served by the table's metadata columns
  *     ([[GraftMetaCols]]). Spark rewrites the statement into a
  *     `WriteDelta` plan — read matching rows WITH their ids, split
  *     updates into delete+insert (`representUpdateAsDeleteAndInsert`),
  *     hand each op to the [[DeltaWriter]].
  *  2. The scan ([[GraftPosScan]]) plans ONE partition per data file
  *     and counts row ordinals in file order, so `_pos` is exact by
  *     construction. Nothing is pushed into parquet (row-group or page
  *     skipping would corrupt the ordinals — the statement's condition
  *     evaluates ABOVE the scan); file-LEVEL pruning still fires, from
  *     the pushed predicates against manifest stats and from the
  *     runtime group filter, so a clustered `UPDATE … WHERE id = 7`
  *     reads the one file that can hold id 7.
  *  3. The write stages inserted rows as data parquet (hidden-
  *     partitioning fan-out preserved, [[GraftFanout]]) and deleted ids
  *     as POSITION-DELETE parquet (`_file` STRING root-relative, `_pos`
  *     BIGINT), and commits both through [[TxnTable.commitDelta]]:
  *     every prior data file carries BY REFERENCE — a 10-row UPDATE
  *     against a 1 GB file commits a kilobyte tombstone, not a
  *     rewrite. Serializable: a moved head refuses (tombstone
  *     positions were computed against the planned snapshot).
  *
  * Mode selection is the table property `write.rowlevel.mode`
  * (`merge-on-read` → this; default `copy-on-write` →
  * [[GraftRowLevelOperation]]). Readers merge the tombstones
  * ([[TxnTable.readAsOf]] / the DSv2 scan via [[GraftPosScan]]'s
  * in-reader mask) until `compactDeletes` folds them. */
class GraftPosDeltaOperation(spark: SparkSession, root: String,
                             val snap: Snapshot, cmd: Command,
                             tableSchema: StructType)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  private[sources] def opTag: String = cmd match {
    case Command.DELETE => "delete-mor"
    case Command.UPDATE => "update-mor"
    case Command.MERGE  => "merge-mor"
  }

  override def command(): Command = cmd

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(GraftMetaCols.File),
      Expressions.column(GraftMetaCols.Pos))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftPosScanBuilder(spark, root, snap, tableSchema,
      // the rewrite scan must not serve already-deleted rows (an UPDATE
      // of a tombstoned row would re-insert its updated copy)
      maskLive = true)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        val writeSchema = GraftRowLevelOperation.physicalize(info.schema(), snap)
        val relDir = s"data/${UUID.randomUUID().toString.take(8)}"
        // each schema needs its OWN conf: prepareWrite embeds the
        // write schema into the job configuration
        val (dataF, dataConf) = ParquetWriteShim.prepare(spark, writeSchema)
        val (posF, posConf) =
          ParquetWriteShim.prepare(spark, GraftMetaCols.posDeleteSchema)
        val fanout = GraftFanout.specs(spark, snap, writeSchema)
        new GraftPosDeltaWrite(spark, root, GraftPosDeltaOperation.this,
          relDir, dataF, posF, dataConf, posConf, writeSchema, fanout)
      }
    }
}

/** The table's metadata columns: `_file` (root-relative data file path)
  * and `_pos` (row ordinal within the file) — Iceberg's position
  * metadata, the row identity position deltas key on, and a queryable
  * observability surface (`SELECT _file, _pos FROM t` routes the scan
  * through [[GraftPosScan]]). */
object GraftMetaCols {
  val File = "_file"
  val Pos = "_pos"
  val names: Seq[String] = Seq(File, Pos)

  val posDeleteSchema: StructType = StructType(Seq(
    StructField(File, StringType, nullable = false),
    StructField(Pos, LongType, nullable = false)))

  val columns: Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = File
      override def dataType(): org.apache.spark.sql.types.DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "root-relative data file path"
    },
    new MetadataColumn {
      override def name(): String = Pos
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row ordinal within the data file"
    })
}

/** Scan builder for position-aware reads: required-column pruning
  * (metadata columns arrive as ordinary requested fields), catalyst
  * filter "pushdown" that is consumed ONLY for manifest file skipping
  * (every filter reports back as a residual — parquet sees none, see
  * [[GraftPosScan]]'s ordinal contract). */
class GraftPosScanBuilder(spark: SparkSession, root: String, snap: Snapshot,
                          tableSchema: StructType, maskLive: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  import graft.sinks.ColumnMapping

  private var required: StructType = tableSchema
  private var cons: Map[String, GraftTxnFileIndex.Constraint] = Map.empty

  private val l2p: Map[String, String] =
    snap.schema.filter(ColumnMapping.hasMapping).fold(Map.empty[String, String])(sc =>
      sc.fields.filterNot(ColumnMapping.isDropped)
        .map(f => f.name -> ColumnMapping.physOf(f)).toMap)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val phys = filters.map(_.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
          if l2p.contains(a.name) => a.withName(l2p(a.name))
    })
    cons = GraftTxnFileIndex.constraints(phys)
    filters // ALL residual: the scan applies none row-wise
  }

  override def pushedFilters: Array[Predicate] = Array.empty

  override def build(): Scan =
    new GraftPosScan(spark, root, snap, required, cons, maskLive)
}

/** One-partition-per-file, row-based scan that joins each data row with
  * its `(_file, _pos)` identity and (optionally) masks live
  * position-delete tombstones in the reader. Used by the delta rewrite
  * scan, by DSv2 batch reads of position-delete-live tables, and by any
  * query that references the metadata columns. Slower than the
  * vectorized path by design — the price of exact ordinals — and only
  * ever planned where ordinals or masking are REQUIRED. */
class GraftPosScan(spark: SparkSession, root: String, snap: Snapshot,
                   required: StructType,
                   cons: Map[String, GraftTxnFileIndex.Constraint],
                   maskLive: Boolean,
                   streamable: Boolean = false,
                   options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  import graft.sinks.ColumnMapping

  private val base = root.stripSuffix("/")

  // data columns (logical) and requested metadata columns, meta last
  private val (dataCols, metaCols) =
    required.fields.partition(f => !GraftMetaCols.names.contains(f.name))
  require(required.fields.drop(dataCols.length).forall(f =>
    GraftMetaCols.names.contains(f.name)),
    s"metadata columns must trail the data columns, got ${required.simpleString}")

  private val physData: StructType = GraftRowLevelOperation.physicalize(
    StructType(dataCols.toSeq), snap)

  /** Static manifest pruning from the pushed predicates, then narrowed
    * further by the runtime group filter. */
  @volatile private var files: Seq[String] =
    if (cons.isEmpty) snap.files
    else snap.files.filter(GraftTxnFileIndex.mayMatch(snap, _, cons))

  // -- runtime group filtering on the primary stats column (the CoW
  // scan's contract, reused) ------------------------------------------
  private def statsCol: Option[(String, String)] =
    snap.statsCols.headOption.flatMap { p =>
      val logical = snap.schema.fold(p)(sc => ColumnMapping.logicalName(sc, p))
      if (required.fieldNames.contains(logical)) Some((logical, p)) else None
    }

  override def filterAttributes(): Array[NamedReference] =
    statsCol.map { case (l, _) => Expressions.column(l) }.toArray

  override def filter(predicates: Array[Predicate]): Unit =
    for {
      (logical, phys) <- statsCol
      vs <- predicates.iterator
              .flatMap(GraftRowLevelScan.pointValues(_, logical)).nextOption()
    } {
      val c = GraftTxnFileIndex.Constraint(
        lo = if (vs.isEmpty) Long.MinValue else vs.min,
        hi = if (vs.isEmpty) Long.MaxValue else vs.max,
        points = Some(vs))
      files = files.filter(rel =>
        GraftTxnFileIndex.mayMatch(snap, rel, Map(phys -> c)))
    }

  override def readSchema(): StructType = required

  override def toBatch: Batch = {
    require(!options.getBoolean("readChangeFeed", false),
      "readChangeFeed is a STREAMING option (spark.readStream); for a " +
        "batch change window use TxnTable.changesBetween(root, v1, v2)")
    this
  }

  /** Streaming stays available on a position-delete-live table: the
    * micro-batch source reads COMMIT WINDOWS (added files), never the
    * masked head, so the tombstones are irrelevant to it. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(streamable,
      s"graft-txn:$root was not resolved through the catalog; stream by name")
    new GraftTxnMicroBatchStream(spark, root, snap, physData, options)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // grouped listStatus — one driver call per parent dir, same batching
    // as GraftTxnFileIndex
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byDir = files.groupBy(f => f.take(f.lastIndexOf('/').max(0)))
    val sizes: Map[String, Long] = byDir.toSeq.flatMap { case (dir, rels) =>
      val names = rels.map(r => new Path(s"$base/$r").getName -> r).toMap
      fs.listStatus(new Path(s"$base/$dir")).toSeq
        .filter(st => st.isFile && names.contains(st.getPath.getName))
        .map(st => names(st.getPath.getName) -> st.getLen)
    }.toMap
    files.zipWithIndex.map { case (rel, i) =>
      FilePartition(i, Array(PartitionedFile(InternalRow.empty,
        SparkPath.fromPathString(s"$base/$rel"), 0, sizes(rel))))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val delegate = ParquetScanBuilder(spark,
      new GraftTxnFileIndex(spark, root, snap, physData, Some(files)),
      physData, physData, CaseInsensitiveStringMap.empty())
      .build().toBatch.createReaderFactory()
    val masked: Map[String, Array[Long]] =
      if (maskLive) TxnTable.posDeleteMap(spark, root, snap, files)
      else Map.empty
    new GraftPosReaderFactory(delegate, metaCols.map(_.name).toSeq, masked)
  }

  override def description(): String =
    s"graft-txn position scan of $root@v${snap.version} " +
      s"(${files.size}/${snap.files.size} files, mask=$maskLive)"
}

/** Row-based reader factory: wraps the vectorized parquet factory's
  * row interface, counts ordinals in file order (the partition is ONE
  * whole file and nothing was pushed into parquet, so reader order IS
  * file order), joins the requested metadata columns, and skips
  * tombstoned ordinals. */
class GraftPosReaderFactory(delegate: PartitionReaderFactory,
                            metaCols: Seq[String],
                            masked: Map[String, Array[Long]])
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val fp = partition.asInstanceOf[FilePartition]
    require(fp.files.length == 1 && fp.files.head.start == 0,
      s"position scan plans one whole file per partition, got $fp")
    val abs = fp.files.head.urlEncodedPath
    val rel = GraftPosReaderFactory.RelRe.findFirstMatchIn(abs)
      .map(_.group(1)).getOrElse(
        throw new IllegalStateException(s"not a staged data path: $abs"))
    val relU = UTF8String.fromString(rel)
    val dead: Array[Long] = masked.getOrElse(rel, Array.emptyLongArray)
    val inner = delegate.createReader(partition)
    val meta = new GenericInternalRow(metaCols.length)
    val joined = new JoinedRow
    new PartitionReader[InternalRow] {
      private var pos = -1L
      override def next(): Boolean = {
        while (inner.next()) {
          pos += 1
          if (java.util.Arrays.binarySearch(dead, pos) < 0) return true
        }
        false
      }
      override def get(): InternalRow = {
        var i = 0
        while (i < metaCols.length) {
          meta.update(i,
            if (metaCols(i) == GraftMetaCols.File) relU else pos)
          i += 1
        }
        joined(inner.get(), meta)
      }
      override def close(): Unit = inner.close()
    }
  }
}

object GraftPosReaderFactory {
  /** Greedy prefix pins the LAST `/data/` segment — see
    * [[TxnTable.relFileCol]]'s rationale. Decoded: urlEncodedPath is
    * a URI path; staged rel paths contain no chars that url-encode. */
  private[sources] val RelRe = "^.*/(data/.*)$".r
}

/** Driver-side delta write: collects staged data + position-delete
  * files and commits one version through [[TxnTable.commitDelta]]. */
class GraftPosDeltaWrite(spark: SparkSession, root: String,
                         op: GraftPosDeltaOperation, relDir: String,
                         dataFactory: OutputWriterFactory,
                         posFactory: OutputWriterFactory,
                         dataConf: SerializableConfiguration,
                         posConf: SerializableConfiguration,
                         dataSchema: StructType,
                         fanout: Seq[GraftFanout])
    extends DeltaWrite with DeltaBatchWrite {

  override def toBatch: DeltaBatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftPosDeltaWriterFactory(root.stripSuffix("/"), relDir,
      dataFactory, posFactory, dataConf, posConf, dataSchema, fanout)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case m: GraftDeltaStaged => m }
    TxnTable.commitDelta(spark, root, op.snap.version,
      staged.flatMap(_.dataRels).toSeq, staged.flatMap(_.posRels).toSeq,
      op.opTag)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val basePath = new Path(root.stripSuffix("/"))
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case m: GraftDeltaStaged => m }
      .flatMap(m => m.dataRels ++ m.posRels)
      .foreach(rel => fs.delete(new Path(basePath, rel), false))
  }
}

case class GraftDeltaStaged(dataRels: Seq[String], posRels: Seq[String])
    extends WriterCommitMessage

class GraftPosDeltaWriterFactory(base: String, relDir: String,
                                 dataFactory: OutputWriterFactory,
                                 posFactory: OutputWriterFactory,
                                 dataConf: SerializableConfiguration,
                                 posConf: SerializableConfiguration,
                                 dataSchema: StructType,
                                 fanout: Seq[GraftFanout])
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftPosDeltaWriter(base, relDir,
      s"part-$partitionId-$taskId.parquet", dataFactory, posFactory,
      dataConf, posConf, dataSchema, fanout, partitionId, taskId)
}

/** One task's delta writer: inserted rows fan into per-transform-value
  * data parquet (the [[GraftRowLevelDataWriter]] layout), deleted row
  * ids append to ONE position-delete parquet per task (`del-` prefix
  * distinguishes the shape in the staging dir listing; all files open
  * lazily so an all-insert or all-delete task stages only what it
  * used). The framework projects rows for us: `delete` receives the
  * rowId projection `(_file, _pos)`, `insert`/`reinsert` the data
  * projection — updates arrive pre-split
  * (`representUpdateAsDeleteAndInsert`). */
class GraftPosDeltaWriter(base: String, relDir: String, fileName: String,
                          dataFactory: OutputWriterFactory,
                          posFactory: OutputWriterFactory,
                          dataConf: SerializableConfiguration,
                          posConf: SerializableConfiguration,
                          dataSchema: StructType,
                          fanout: Seq[GraftFanout],
                          partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {

  private val dataWriters = scala.collection.mutable.LinkedHashMap
    .empty[String, ParquetRowWriter]
  private var posWriter: ParquetRowWriter = _
  private val posRel = s"$relDir/del-$fileName"

  private def rel(dirs: String): String =
    if (dirs.isEmpty) s"$relDir/$fileName" else s"$relDir/$dirs/$fileName"

  private def dataWriterFor(row: InternalRow): ParquetRowWriter = {
    val dirs = fanout.map(_.dirOf(row)).mkString("/")
    dataWriters.getOrElseUpdate(dirs,
      ParquetWriteShim.open(dataFactory, dataConf, dataSchema,
        s"$base/${rel(dirs)}", partitionId, taskId))
  }

  override def insert(data: InternalRow): Unit = dataWriterFor(data).write(data)

  override def reinsert(meta: InternalRow, data: InternalRow): Unit = insert(data)

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    if (posWriter == null)
      posWriter = ParquetWriteShim.open(posFactory, posConf,
        GraftMetaCols.posDeleteSchema, s"$base/$posRel", partitionId, taskId)
    posWriter.write(id)
  }

  override def update(meta: InternalRow, id: InternalRow, data: InternalRow): Unit = {
    delete(meta, id); insert(data)
  }

  override def write(row: InternalRow): Unit = throw new IllegalStateException(
    "delta writer receives typed ops (insert/delete/update), never raw rows")

  override def commit(): WriterCommitMessage = {
    dataWriters.values.foreach(_.close())
    val dataRels = dataWriters.keys.map(rel).toSeq
    dataWriters.clear()
    val posRels = if (posWriter == null) Nil else { posWriter.close(); Seq(posRel) }
    posWriter = null
    GraftDeltaStaged(dataRels, posRels)
  }

  override def abort(): Unit = {
    val fs = new Path(base).getFileSystem(ParquetWriteShim.hadoopConf(dataConf))
    dataWriters.foreach { case (dirs, w) =>
      try w.close() catch { case _: Throwable => () }
      fs.delete(new Path(s"$base/${rel(dirs)}"), false)
    }
    dataWriters.clear()
    if (posWriter != null) {
      try posWriter.close() catch { case _: Throwable => () }
      fs.delete(new Path(s"$base/$posRel"), false)
      posWriter = null
    }
  }

  override def close(): Unit = {
    dataWriters.values.foreach(_.close())
    dataWriters.clear()
    if (posWriter != null) { posWriter.close(); posWriter = null }
  }
}
