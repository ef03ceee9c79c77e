package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** TxnTable as a streaming sink: foreachBatch + [[TxnTable.appendBatch]]
  * gives exactly-once table content under foreachBatch's at-least-once
  * contract — each micro-batch lands as one atomic, batch-id-tagged
  * commit, a restart from the checkpoint that replays a committed batch
  * no-ops, and a concurrent BATCH writer interleaves commits with the
  * stream without corrupting either (snapshot isolation). */
class TxnStreamSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streamed micro-batches land as atomic versioned commits, replay-safe") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val base = Files.createTempDirectory("txn_stream").toString
    val (root, ckpt) = (s"$base/tbl", s"$base/ckpt")

    val input = MemoryStream[Long]
    val query = input.toDS().toDF("id").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        TxnTable.appendBatch(batch.sparkSession, root, batch, batchId): Unit
      }
      .start()
    try {
      input.addData(1L, 2L)
      query.processAllAvailable()
      input.addData(3L)
      query.processAllAvailable()
      assert(TxnTable.read(spark, root).as[Long].collect().toSet === Set(1L, 2L, 3L))
      val ops = TxnTable.versions(spark, root)
        .map(v => TxnTable.snapshot(spark, root, v).op)
      assert(ops === Seq("append-batch:0", "append-batch:1"))

      // a batch job commits between micro-batches — versions interleave
      TxnTable.append(spark, root, Seq(100L).toDF("id"))

      // driver-side replay of an already-committed micro-batch (the
      // at-least-once case a checkpoint-lagged restart produces): no-op
      assert(TxnTable.appendBatch(spark, root, Seq(1L, 2L).toDF("id"), 0L).isEmpty)
      assert(TxnTable.read(spark, root).as[Long].collect().toSet ===
        Set(1L, 2L, 3L, 100L))
    } finally query.stop()
  }
}
