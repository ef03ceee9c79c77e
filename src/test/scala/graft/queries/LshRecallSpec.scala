package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Recall property of the multi-probe LSH (q31): probing the primary
  * bucket plus all Hamming-distance-1 buckets must recover at least the
  * single-probe recall against the brute-force ground truth (q24), and a
  * pinned absolute floor on the testdata. The candidate superset relation
  * holds by construction (flip set {0} ⊂ {0, 1<<p}); this spec pins the
  * OUTPUT-level consequence so a probe-set regression fails loudly.
  */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def top5(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().take(5).map(_.getLong(0)).toSeq

  // Deterministic pipeline (literal planes, exact integer dots), so the
  // observed recalls are reproducible and pinned as floors. Measured:
  // single-probe 1/5 -> multi-probe 4/5 at sf0.001; 0/5 -> 2/5 at sf0.01
  // (uniform random embeddings are LSH's worst case — neighbors are
  // barely more similar than the bulk, so buckets carry little signal;
  // the multi-probe lift is the property worth guarding).
  private val recallFloor = Map(
    "/root/testdata/sf0.001" -> 4,
    "/root/testdata/sf0.01" -> 2)

  for ((sfDir, floor) <- recallFloor) {
    test(s"multi-probe recall >= single-probe recall vs brute force ($sfDir)") {
      val truth = top5(LlmOps.q24(spark, sfDir)).toSet
      val single = top5(LlmOps.lshAnn(spark, sfDir, multiProbe = false)).toSet
      val multi = top5(LlmOps.lshAnn(spark, sfDir, multiProbe = true)).toSet
      val singleRecall = (single & truth).size
      val multiRecall = (multi & truth).size
      info(s"$sfDir: single=$singleRecall/5 multi=$multiRecall/5")
      assert(multiRecall >= singleRecall,
        s"multi-probe recall $multiRecall < single-probe $singleRecall (truth $truth)")
      assert(multiRecall >= floor,
        s"multi-probe recall floor: got $multiRecall/5, expected >= $floor (multi $multi, truth $truth)")
    }
  }
}
