package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Incremental IVF maintenance: delta files are assigned to the fixed
  * first-build TRAINED centroids and appended; indexed files keep their
  * paths (no rewrite, no rescan); search over the maintained index
  * equals a driver-computed reference over the full corpus USING THE
  * SAME centroids. (Serving on build-time centroids is the standard
  * IVF contract — a full retrain over the grown corpus may legitimately
  * re-shape cells, so retrain-equality is NOT the invariant; the
  * same-centroid reference is.) */
class IvfMaintainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val srcSf = "/root/testdata/sf0.001"
  private val K = 8
  private val Iters = 3
  private val NProbe = 2

  private def quantLocal(xs: Seq[Float]): Array[Long] =
    xs.map(x => math.round(x.toDouble * 1000000)).toArray

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  // the index's planning/assignment key: ‖c‖² − 2·p·c, ties to smaller id
  private def l2Key(c: Array[Long], p: Array[Long]): Long = {
    var c2 = 0L; var dot = 0L; var i = 0
    while (i < c.length) { c2 += c(i) * c(i); dot += p(i) * c(i); i += 1 }
    c2 - 2L * dot
  }

  /** Exact IVF search over `vecs` with the given centroids — the
    * same-centroid oracle for ivfSearch. */
  private def reference(vecs: Map[Long, Array[Long]],
                        cents: Seq[(Int, Array[Long])],
                        probe: Array[Long], k: Int,
                        excludeId: Long): Seq[(Long, Double)] = {
    val cells = vecs.map { case (id, e) =>
      id -> cents.map { case (cid, ce) => (l2Key(ce, e), cid) }.min._2 }
    val planned = cents.map { case (cid, ce) => (l2Key(ce, probe), cid) }
      .sorted.take(NProbe).map(_._2).toSet
    vecs.toSeq
      .filter { case (id, _) => planned(cells(id)) && id != excludeId }
      .map { case (id, e) => (id, cos(e, probe)) }
      .sortBy { case (id, sim) => (-sim, id) }.take(k)
  }

  test("delta append maintains the index in place; search == same-centroid reference") {
    val s = spark
    import s.implicits._
    val all = graft.Tables.t(spark, srcSf, "embeddings")
    def quantDf(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", transform($"embedding",
        x => round(x.cast("double") * lit(1000000)).cast("long")).as("e"))

    // dataset A: an append-shaped copy (embeddings.parquet is a DIR of
    // part files, so arrivals are new files) with vec_id < 300 —
    // includes the kmeans seeds 0..K-1 and the probe row 0
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

    val vecs = all.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> quantLocal(r.getSeq[Float](1))).toMap
    val probe = vecs(0L)

    // maintained index == reference with the FIRST-BUILD centroids
    // (trained on A's initial 300 rows; maintenance must not retrain)
    val centsA = LlmOps.kmeansCentroids(
      quantDf(all.filter($"vec_id" < 300)), K, Iters)
    val got = LlmOps.ivfSearch(spark, dirA, probe, 5, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === reference(vecs, centsA, probe, 5, excludeId = 0L),
      "maintained index must serve on its build-time centroids")

    // a from-scratch build over the full corpus RETRAINS on all 500 —
    // its serving matches the reference with the RETRAINED centroids
    val dirB = Files.createTempDirectory("ivf_full").toString
    all.write.parquet(s"$dirB/embeddings.parquet")
    LlmOps.ivfMaintain(spark, dirB) // full build
    val centsB = LlmOps.kmeansCentroids(quantDf(all), K, Iters)
    val want = LlmOps.ivfSearch(spark, dirB, probe, 5, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(want === reference(vecs, centsB, probe, 5, excludeId = 0L),
      "full rebuild must retrain on the grown corpus")

    // the maintained index can SEE a delta vector (self top-1)
    val deltaProbe = vecs(400L)
    val self = LlmOps.ivfSearch(spark, dirA, deltaProbe, 1)
      .collect().map(_.getLong(0)).toSeq
    assert(self === Seq(400L), s"delta vector not indexed: $self")
  }
}
