package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Dynamic partition pruning, demonstrated like SkewJoinSpec does for
  * skew: a date-partitioned fact joined to a filtered dimension must
  * plan the fact scan with a dynamicpruning subquery on the partition
  * column — at 100 TB this is the difference between scanning every
  * daily partition and only the days the dimension selects, when the
  * selected days are not known until runtime. (Static pruning is
  * separately plan-asserted for q46's IVF index scan.) */
class DppSpec extends AnyFunSuite {
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

  test("date-partitioned fact scan carries a dynamicpruning filter") {
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // the tiny test tables defeat DPP's benefit heuristics; force the
      // DECISION path, not the mechanism (which is what's under test)
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100.0") {
      val s = spark
      import s.implicits._
      val base = Files.createTempDirectory("dpp").toString
      // fact: events written partitioned by day (the reference's daily
      // layout); dim: a day attribute table filtered at query time
      graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
        .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(s"$base/events_by_day")
      val fact = spark.read.parquet(s"$base/events_by_day")
      // day_kind is a STRING equality target: DPP only fires behind a
      // "likely selective" dim predicate (equality/IN/LIKE — a bare
      // boolean attribute does not qualify)
      val dim = fact.select($"day").distinct()
        .withColumn("day_kind",
          when(dayofweek(to_date($"day")).isin(1, 7), "weekend").otherwise("weekday"))
        .select($"day".as("d_day"), $"day_kind")
      dim.write.mode("overwrite").parquet(s"$base/day_dim")
      val dimT = spark.read.parquet(s"$base/day_dim")

      val q = fact.join(dimT, $"day" === $"d_day")
        .filter($"day_kind" === "weekend")
        .groupBy($"day")
        .agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        "expected a dynamicpruning subquery on the partitioned scan:\n" + plan.take(2000))
    }
  }
}
