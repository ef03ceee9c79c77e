package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The bucketed layout's whole point: a fact⋈fact join on the bucket key
  * must plan as a SortMergeJoin with NO exchange on either side. AQE and
  * auto-broadcast are disabled inside the test so tiny test SFs can't
  * mask the layout with a broadcast plan. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated() // mutates session confs
  private val sfDir = "/root/testdata/sf0.001"

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed fact-fact join is exchange-free SortMergeJoin") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = Bucketed.orders(spark, sfDir)
        .join(Bucketed.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"), plan.take(2000))
    }
  }

  /** The orderkey SortMergeJoin subtree of a query plan, if any. */
  private def orderkeySmj(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("o_orderkey")) => j
    }

  test("q04's orderkey join runs exchange-free over the bucketed layout") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val smj = orderkeySmj(Relational.q04(spark, sfDir))
      assert(smj.nonEmpty, "expected a SortMergeJoin on o_orderkey")
      assert(!smj.head.toString.contains("Exchange"), smj.head.toString.take(2000))
    }
  }

  test("q05's orderkey join runs exchange-free over the bucketed layout") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val smj = orderkeySmj(Relational.q05(spark, sfDir))
      assert(smj.nonEmpty, "expected a SortMergeJoin on o_orderkey")
      assert(!smj.head.toString.contains("Exchange"), smj.head.toString.take(2000))
    }
  }

  test("the window family runs exchange-free over the events layout") {
    // the round-6 layout extension: q17/q69/q81's windows, q52's
    // sessionization, and q47's dedup+window all read hash(user_id)
    // straight off the bucketed events scan — zero ShuffleExchange in
    // the whole benched plan (the verify-only global sorts are split
    // into the q*Bench variants, so nothing here needs one)
    val zeroShuffle: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "q17" -> Relational.q17Bench,
      "q69" -> Relational.q69Bench,
      "q81" -> Relational.q81Bench,
      "q52" -> Sessions.q52Bench)
    zeroShuffle.foreach { case (name, q) =>
      val plan = graft.PlanSig.initialPlan(q(spark, sfDir))
      val shuffles = plan.collectWithSubqueries {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"$name must be exchange-free over the events layout:\n$plan")
    }
  }

  test("q02 over the events layout matches the raw-parquet plan's rows") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.Det._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val plain = graft.Tables.t(spark, sfDir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", tsUs($"ts").as("ts_us"), $"value")
      .orderBy($"user_id")
    assert(Relational.q02(spark, sfDir).collect().toSeq === plain.collect().toSeq)
  }

  test("q41 matches the plain-parquet join result") {
    val viaBuckets = Bucketed.q41(spark, sfDir)
    val plain = {
      import spark.implicits._
      import graft.Det._
      graft.Tables.t(spark, sfDir, "orders")
        .join(graft.Tables.t(spark, sfDir, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          money(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    }
    assert(viaBuckets.collect().toSeq === plain.collect().toSeq)
  }
}
