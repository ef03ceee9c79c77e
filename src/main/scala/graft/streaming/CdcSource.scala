package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sinks.TxnTable

/** The txn table's change feed as a first-class Structured Streaming
  * SOURCE — `spark.readStream.format(CdcSource.Format).option("root",
  * tableRoot).load()` — the Delta/Iceberg `readChangeFeed` streaming
  * surface. Offsets ARE table versions: the engine's offset log pins
  * `(v1, v2]` windows, each batch is the per-version
  * [[TxnTable.changesBetween]] feed with a `_commit_version` column, so
  * a consumer sees every commit's effective row changes — inserts,
  * keyed MoR deletes with pre-images, restore resurrections — in commit
  * order, exactly once across restarts (the checkpoint replays the same
  * version window, and a version-pinned feed is deterministic).
  *
  * Options: `root` (required) — the table path; `startVersion` —
  * 0 replays history from the first commit (version 1's full content
  * emits as inserts, then per-commit diffs), N starts after version N;
  * default = the latest version at stream start (new changes only);
  * `maxVersionsPerBatch` — bound each micro-batch to at most N commit
  * windows, so a stream catching up over a long backlog (a fresh
  * startVersion=0 replay of years of commits) paces itself instead of
  * planning one giant batch — the admission-control knob every real
  * source ships (maxFilesPerTrigger / maxOffsetsPerTrigger).
  *
  * Scale posture is [[TxnTable.changesBetween]]'s: each version window
  * reads only the files that entered or left that manifest, so a
  * steady-state stream over a 100 TB table costs per-commit deltas,
  * never table scans; compactions cancel to empty feeds. The schema is
  * pinned at stream start (batches cast up to it, so lossless widening
  * mid-stream is transparent); an incompatible evolution fails the
  * stream, and a restart re-pins — the semantics real CDF streams ship.
  * Replay needs the checkpointed window's manifests: retention
  * ([[TxnTable.vacuum]]) must outlive checkpoint lag.
  */
class CdcSourceProvider extends StreamSourceProvider {
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (CdcSource.Format,
      CdcSource.feedSchema(ctx.sparkSession, CdcSource.root(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new CdcSource(ctx.sparkSession, CdcSource.root(parameters),
      parameters.get("startVersion").map(_.toLong),
      parameters.get("maxVersionsPerBatch").map(_.toLong))
}

object CdcSource {
  val Format: String = classOf[CdcSourceProvider].getName

  private[streaming] def root(parameters: Map[String, String]): String =
    parameters.getOrElse("root",
      throw new IllegalArgumentException(s"$Format needs option 'root'"))

  /** Stream schema: the table's columns (pinned from the latest
    * snapshot at stream start, everything nullable — feed rows can
    * carry nulls any file allows) + the feed's `_change_type` / `_n` +
    * this source's `_commit_version`. */
  def feedSchema(s: SparkSession, root: String): StructType = {
    val snap = TxnTable.latest(s, root).getOrElse(throw new IllegalStateException(
      s"no committed snapshot at $root — create the table before streaming it"))
    // logical view: the feed is user-facing (changesBetween aliases each
    // batch to the versions' logical names). A rename DURING the stream
    // changes the feed's column names and fails the pinned schema loud —
    // restart the stream past the rename, the standard schema-change rule.
    val base = snap.schema.map(graft.sinks.ColumnMapping.logicalView)
      .getOrElse(TxnTable.read(s, root).schema)
    StructType(base.fields.map(_.copy(nullable = true)))
      .add("_change_type", StringType).add("_n", LongType)
      .add("_commit_version", LongType)
  }
}

class CdcSource(s: SparkSession, tableRoot: String,
                startVersion: Option[Long],
                maxVersionsPerBatch: Option[Long] = None) extends Source {
  maxVersionsPerBatch.foreach(m =>
    require(m >= 1, s"maxVersionsPerBatch must be >= 1, got $m"))

  private val pinned: StructType = CdcSource.feedSchema(s, tableRoot)
  /** Versions <= startV are never emitted. Re-resolves to the RESTART-
    * time head when no explicit startVersion was given, so it must not
    * floor the pacing cursor after restart (see [[served]]). */
  private val startV: Long = startVersion.getOrElse(
    TxnTable.latest(s, tableRoot).map(_.version).getOrElse(0L))
  /** Highest version already handed to getBatch — the pacing cursor for
    * [[maxVersionsPerBatch]]. None until the first getBatch: a fresh
    * stream anchors batch 0 at startV (empty — see getOffset), and on
    * restart the engine replays the last checkpointed batch through
    * getBatch before asking for new offsets (the v1 recovery contract),
    * which re-seeds this from the CHECKPOINT, never the restart-time
    * startV — flooring at a re-resolved startV would withhold commits
    * made while the query was down until a future commit moved the head
    * (forever, on a quiescent table). */
  private var served: Option[Long] = None

  override def schema: StructType = pinned

  override def getOffset: Option[Offset] = {
    // fresh stream: empty anchor batch at startV, so every data-bearing
    // batch has a checkpoint-persisted start offset (see
    // [[TxnStreamSource.getOffset]] for the recovery rationale)
    if (served.isEmpty) return Some(LongOffset(startV))
    val head = TxnTable.latest(s, tableRoot).map(_.version).getOrElse(0L)
    val floor = served.get
    val capped = maxVersionsPerBatch.fold(head)(m => math.min(head, floor + m))
    if (capped <= floor) None else Some(LongOffset(capped))
  }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset     => l.offset
    case so: SerializedOffset => LongOffset(so).offset
  }

  /** One feed window per commit so `_commit_version` attribution is
    * exact even when the engine batches several commits into one
    * trigger. Version 1 has no predecessor manifest: its window is the
    * initial snapshot's content as inserts (multiplicity in `_n`, the
    * feed's own duplicate encoding). */
  private def perVersion(v: Long): DataFrame = {
    val feed =
      if (v == 1L) {
        val full = TxnTable.readAsOf(s, tableRoot, 1L)
        full.groupBy(full.columns.map(col): _*)
          .agg(count(lit(1)).as("_n"))
          .withColumn("_change_type", lit("insert"))
      } else TxnTable.changesBetween(s, tableRoot, v - 1, v)
    feed.withColumn("_commit_version", lit(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val v1 = start.map(ver).getOrElse(startV)
    val v2 = ver(end)
    served = Some(served.fold(v2)(math.max(_, v2)))
    val windows = ((v1 + 1) to v2).map(perVersion)
    val out = windows.reduceOption(_.unionByName(_)).getOrElse(
      s.createDataFrame(s.sparkContext.emptyRDD[Row], pinned))
    // pin to the stream-start schema (lossless widening casts up; an
    // incompatible evolution fails here, loudly), then tag the batch
    // streaming for MicroBatchExecution's v1 contract
    org.apache.spark.sql.graft.StreamingShim.asStreamingBatch(
      out.select(pinned.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
        .toIndexedSeq: _*))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
