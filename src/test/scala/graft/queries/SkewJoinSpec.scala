package graft.queries

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** AQE skew-join, demonstrated instead of asserted: every session in the
  * repo sets spark.sql.adaptive.enabled, and this spec proves the claim —
  * a join with one pathologically hot key actually gets its skewed
  * partition SPLIT by OptimizeSkewedJoin at runtime (the final adaptive
  * plan's SortMergeJoin carries isSkewJoin=true). Thresholds are lowered
  * to test scale (the defaults trigger at 256 MB partitions); the
  * MECHANISM is identical at 100 TB — this, plus the salted two-phase
  * cap in LshSkewSpec, is the engine's skew story: AQE for join skew,
  * salting for aggregation skew.
  *
  * The payload is sha2-derived (incompressible): skew detection reads
  * COMPRESSED shuffle partition sizes, so a constant-padded payload
  * would vanish under lz4 and mask the skew.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated() // mutates session confs

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("one hot key splits via OptimizeSkewedJoin in the final adaptive plan") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m") {
      val s = spark
      import s.implicits._
      // 300k rows on key 0 (~19 MB of incompressible payload) vs ~1k rows
      // on each of 99 other keys: the key-0 partition exceeds both the
      // 1 MB threshold and 2x the median partition size.
      val left = spark.range(0, 400000)
        .select(
          when($"id" < 300000, 0L).otherwise(pmod($"id", lit(100))).as("k"),
          sha2(conv($"id", 10, 16), 256).as("payload"))
      val right = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution so its adaptive plan finalizes
      joined.queryExecution.toRdd.foreachPartition(_ => ())
      val finalPlan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      // (string-matched: the final plan nests the join inside query
      // stages, which TreeNode.collect does not descend into)
      assert(finalPlan.contains("SortMergeJoin(skew=true)"),
        "expected OptimizeSkewedJoin to mark the join skewed:\n" + finalPlan.take(2000))
      assert(finalPlan.contains("AQEShuffleRead skewed"),
        "expected the hot partition to be split into skewed reads:\n" + finalPlan.take(2000))
    }
  }
}
