package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q118's two-pass frontier refine: row-identical to the straight
  * single-window form it production-shapes, and the exact-rank window
  * really runs over the broadcast-bounded sliver, not the corpus. */
class ClusterSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** The reference single-window form (the oracle's shape). */
  private def windowForm(cap: Int) = {
    val s = spark
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster").orderBy($"k".asc, $"vec_id".asc)
    val wc = org.apache.spark.sql.expressions.Window.partitionBy($"cluster")
    s.table(LlmOps.ensureIvfIndex(s, sfDir))
      .select($"vec_id", $"cell".cast("int").as("cluster"))
      .withColumn("k", conv(substring(md5(concat(lit("cb:"), $"vec_id")), 1, 8),
        16, 10).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_cluster", count(lit(1)).over(wc))
      .filter($"rn" <= cap)
      .select($"vec_id", $"cluster", $"rn", $"n_cluster")
  }

  test("frontier refine == single-window form, row for row") {
    val got = LlmOps.q118Bench(spark, sfDir).collect().map(_.toSeq).toSet
    val want = windowForm(40).collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got === want)
    // both the capped and the survives-whole regimes are exercised
    val byCluster = got.groupBy(_(1)).map { case (c, rows) => c -> rows.size }
    assert(byCluster.values.exists(_ == 40), s"no capped cluster: $byCluster")
  }

  test("the exact-rank window runs over the frontier sliver, not the corpus") {
    val plan = graft.PlanSig.initialPlan(LlmOps.q118Bench(spark, sfDir))
    val windows = plan.collectWithSubqueries {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size === 1, s"expected one exact-rank window, got $windows")
    // below the window: the broadcast frontier join that bounds its
    // input to ≤ K·(cap+ties) rows — the shape that holds at 100 TB
    val joinBelow = windows.head.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(joinBelow.nonEmpty,
      s"window input is not frontier-bounded:\n${windows.head}")
    // and pass 1 is the bounded map-side aggregate, not a window
    val objAgg = plan.collectWithSubqueries {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAgg.nonEmpty, "frontier pass must be the TopKByScore aggregate")
  }
}
