package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Runtime bloom-filter join pruning, demonstrated like DppSpec does for
  * partition pruning: a shuffle join whose build side is selectively
  * filtered must inject a `bloom_filter_agg` on the build side and a
  * `might_contain` probe into the stream side's scan stage — at 100 TB
  * this is the row-level cut that keeps non-matching fact rows from ever
  * entering the shuffle (DPP prunes whole partitions; the bloom filter
  * prunes inside them). */
class BloomJoinSpec extends AnyFunSuite {
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

  test("a filtered build side injects a bloom filter into the probe scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the tiny test tables defeat the size heuristics; zero them so the
      // DECISION path fires and the injection mechanism is what's tested
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: with a broadcast the stream side is already
      // probed by the build's hash table and no bloom filter is needed
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val s = spark
      import s.implicits._
      val fact = graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      val dim = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val q = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("qty"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") && plan.contains("might_contain"),
        "expected bloom_filter_agg + might_contain in the optimized plan:\n" +
          plan.take(2500))
      // and the probe must actually execute: physical plan carries the
      // scalar-subquery bloom build on the fact side
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("might_contain"),
        "expected might_contain in the physical plan:\n" + phys.take(2500))
    }
  }

  test("an unfiltered build side injects nothing (no wasted bloom build)") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val s = spark
      import s.implicits._
      val fact = graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      val dim = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      val q = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("qty"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("bloom_filter_agg"),
        "a join with no selective build-side filter must not pay for a bloom build")
    }
  }
}
