package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Incremental IVF maintenance: delta files are assigned to the fixed
  * first-build centroids and appended; indexed files keep their paths
  * (no rewrite, no rescan); search over the maintained index equals
  * search over a from-scratch rebuild of the full corpus. */
class IvfMaintainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val srcSf = "/root/testdata/sf0.001"

  private def quantLocal(xs: Seq[Float]): Array[Long] =
    xs.map(x => math.round(x.toDouble * 1000000)).toArray

  test("delta append maintains the index in place; search == full rebuild") {
    val s = spark
    import s.implicits._
    val all = graft.Tables.t(spark, srcSf, "embeddings")

    // dataset A: an append-shaped copy (embeddings.parquet is a DIR of
    // part files, so arrivals are new files) with vec_id < 300 —
    // includes centroids 1..8 and the probe row 0
    val dirA = Files.createTempDirectory("ivf_maint").toString
    all.filter($"vec_id" < 300).write.parquet(s"$dirA/embeddings.parquet")
    val table = LlmOps.ivfMaintain(spark, dirA) // absent -> full build
    val filesBefore = spark.table(table).inputFiles.toSet
    assert(spark.table(table).count() === 300)

    // the delta arrives as NEW part files in the same dataset dir
    all.filter($"vec_id" >= 300).write.mode("append")
      .parquet(s"$dirA/embeddings.parquet")
    LlmOps.ivfMaintain(spark, dirA)
    val after = spark.table(table)
    assert(after.count() === 500, "maintenance must index exactly the delta")
    // incremental means APPEND: every pre-existing index file survives
    // by path identity
    val filesAfter = after.inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter),
      "maintenance rewrote indexed files instead of appending")
    // a second maintain with no new arrivals is a no-op
    LlmOps.ivfMaintain(spark, dirA)
    assert(spark.table(table).count() === 500)

    // equivalence: a from-scratch index over the SAME full corpus
    val dirB = Files.createTempDirectory("ivf_full").toString
    all.write.parquet(s"$dirB/embeddings.parquet")
    LlmOps.ivfMaintain(spark, dirB) // full build
    val probe = quantLocal(all.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0))
    val got = LlmOps.ivfSearch(spark, dirA, probe, 5, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = LlmOps.ivfSearch(spark, dirB, probe, 5, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want, "maintained index must answer like a full rebuild")
    // the delta actually reaches results: neighbors include a vec >= 300
    // OR the two indexes agree that none ranks top-5 — assert agreement
    // covers both; additionally check the maintained index can SEE a
    // delta vector at all
    val deltaProbe = quantLocal(all.filter($"vec_id" === 400)
      .select($"embedding").head().getSeq[Float](0))
    val self = LlmOps.ivfSearch(spark, dirA, deltaProbe, 1)
      .collect().map(_.getLong(0)).toSeq
    assert(self === Seq(400L), s"delta vector not indexed: $self")
  }
}
