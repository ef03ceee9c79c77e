package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming index maintenance: embedding arrivals land in the dataset
  * dir per micro-batch (foreachBatch append) and `ivfMaintain` folds
  * exactly the delta into the live index — the serving loop of a
  * continuously-ingesting ANN system, built from the same two pieces
  * the batch path uses (append-shaped source + delta assignment). */
object StreamingIvfSpec {
  final case class NewVec(vec_id: Long, embedding: Seq[Float], label: Int)
}

class StreamingIvfSpec extends AnyFunSuite {
  import StreamingIvfSpec.NewVec
  private lazy val spark = SparkTestSession.spark
  private val srcSf = "/root/testdata/sf0.001"

  test("streamed arrivals are searchable after their batch commits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val all = graft.Tables.t(spark, srcSf, "embeddings")
    val dir = Files.createTempDirectory("ivf_stream").toString
    all.filter($"vec_id" < 300).write.parquet(s"$dir/embeddings.parquet")
    val table = LlmOps.ivfMaintain(spark, dir)
    assert(spark.table(table).count() === 300)

    val arrivals = all.filter($"vec_id" >= 300)
      .select($"vec_id", $"embedding", $"label")
      .as[NewVec].collect()
    val (wave1, wave2) = arrivals.splitAt(arrivals.length / 2)

    val input = MemoryStream[NewVec]
    val query = input.toDS()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[NewVec], _: Long) =>
        batch.write.mode("append").parquet(s"$dir/embeddings.parquet")
        LlmOps.ivfMaintain(spark, dir): Unit
      }
      .start()
    try {
      input.addData(wave1.toIndexedSeq: _*)
      query.processAllAvailable()
      assert(spark.table(table).count() === 300L + wave1.length)

      input.addData(wave2.toIndexedSeq: _*)
      query.processAllAvailable()
      assert(spark.table(table).count() === 500L)

      // a second-wave vector is immediately searchable (self top-1)
      val probe = wave2.last.embedding
        .map(x => math.round(x.toDouble * 1000000)).toArray
      val hit = LlmOps.ivfSearch(spark, dir, probe, 1)
        .collect().map(_.getLong(0)).toSeq
      assert(hit === Seq(wave2.last.vec_id), s"got $hit")
    } finally query.stop()
  }
}
