package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Recall floor for the IVF index: q46's oracle proves the IVF PLAN is
  * computed exactly, but says nothing about how much of the TRUE
  * neighborhood an nProbe=2-of-8 sweep surfaces. This spec measures
  * recall@5 against exact brute force (computed driver-side over the
  * small corpus with the same quantized-cosine arithmetic) across
  * several probes and pins a floor — the quality metric an ANN index is
  * actually judged by, same role LshRecallSpec plays for q31. */
class IvfRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val srcSf = "/root/testdata/sf0.001"

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  test("recall@5 vs exact brute force clears the floor across probes") {
    val s = spark
    import s.implicits._
    val vecs = graft.Tables.t(spark, srcSf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000000)).toArray)
      .toMap
    val probes = Seq(0L, 10L, 20L, 30L)
    val recalls = probes.map { pid =>
      val pe = vecs(pid)
      val brute = vecs.toSeq.filter(_._1 != pid)
        .map { case (id, e) => (id, cos(e, pe)) }
        .sortBy { case (id, sim) => (-sim, id) }
        .take(5).map(_._1).toSet
      val ivf = LlmOps.ivfSearch(spark, srcSf, pe, 5, excludeId = pid)
        .collect().map(_.getLong(0)).toSet
      val recall = (brute & ivf).size
      assert(recall >= 2, s"probe $pid: recall@5 = $recall/5 (ivf=$ivf brute=$brute)")
      recall
    }
    // average across probes must clear a stricter floor than any single one
    assert(recalls.sum >= probes.size * 3,
      s"mean recall@5 below 3/5: $recalls")
  }
}
