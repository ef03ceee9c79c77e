package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Connected components (Clusters.connectedComponents): correctness on
  * known component structures, and the pointer-jumping convergence bound
  * (a long path must resolve within the default iteration budget — the
  * property naive neighbor flooding would fail at depth > maxIter). */
class ClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Clusters.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
  }

  test("labels every node with its component's min id") {
    // path 1-2-3-4, triangle 10-11-12 (with a chord), isolated edge 20-21
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got === want)
  }

  test("a 64-node path converges (pointer jumping beats the diameter)") {
    // worst case for flooding: a chain, min id at one end. 63 edges,
    // diameter 63 > would-be naive budget; pointer jumping needs O(log).
    val got = cc((0L until 63L).map(i => (i, i + 1)))
    assert(got.size === 64)
    assert(got.values.toSet === Set(0L))
  }

  test("label order is insensitive to which side the min id enters from") {
    // same chain but edges listed high-to-low and shuffled
    val edges = (0L until 63L).map(i => (i + 1, i)).reverse
    val got = cc(edges)
    assert(got.values.toSet === Set(0L))
  }

  test("empty pair set yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("exhausting maxIter without the fixpoint throws instead of returning") {
    val s = spark
    import s.implicits._
    // a 64-node path cannot settle in 1 round; silent return here would
    // hand q60/q67 wrong labels
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Clusters.connectedComponents(pairs, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("reliable checkpointing converges to the same labeling") {
    val s = spark
    import s.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Clusters.connectedComponents(pairs, checkpointDir = Some(ckpt))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // the reliable checkpoint actually wrote state into the given dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "no checkpoint files written")
  }

  test("q60 on the testdata: clusters cover exactly the candidate-pair docs") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val pairs = LlmOps.bucketPairs(LlmOps.bandRows(LlmOps.signatures(s, dir)._2))
    val pairDocs = pairs.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.array($"doc_a", $"doc_b"))).distinct().count()
    val out = Clusters.q60(s, dir).cache()
    assert(out.count() === pairDocs)
    // every cluster id is a member of its own cluster, and cluster sizes
    // sum back to the node count
    assert(out.filter($"doc_id" === $"cluster_id").count() ===
      out.select($"cluster_id").distinct().count())
    val sizes = out.groupBy($"cluster_id").count()
      .join(out.filter($"doc_id" === $"cluster_id"), "cluster_id")
      .filter($"count" =!= $"n_docs").count()
    assert(sizes === 0)
    out.unpersist()
  }
}
