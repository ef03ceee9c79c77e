package graft.queries

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q61 decontamination / q62 unigram scoring / q63 rebalancing: the
  * semantic and plan properties the DuckDB oracle can't see — eval-set
  * exclusion, broadcast topology, aggregate-not-window ranking. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def initialPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  test("q61 never flags an eval-set doc, and ratios are sane") {
    val s = spark
    import s.implicits._
    val out = TextOps.q61(s, sfDir).cache()
    assert(out.filter($"doc_id" % 97 === 0).count() === 0)
    assert(out.filter($"hit_ratio" <= 0 || $"hit_ratio" > 1).count() === 0)
    assert(out.filter($"n_hit" > $"n_sh").count() === 0)
    out.unpersist()
  }

  test("q61 flags exactly the docs sharing a shingle with the eval set") {
    val s = spark
    import s.implicits._
    // independent recompute: distinct shingles per doc via the plain
    // composition (not the signature artifact), then an exact semi join
    val sh = graft.Tables.t(s, sfDir, "documents")
      .withColumn("tk", split($"text", " "))
      .filter(size($"tk") >= 3)
      .select($"doc_id", explode(array_distinct(LlmOps.shingles3($"tk"))).as("sh"))
    val ev = sh.filter($"doc_id" % 97 === 0).select($"sh").distinct()
    val expect = sh.filter($"doc_id" % 97 =!= 0)
      .join(ev, "sh").select($"doc_id").distinct()
      .as[Long].collect().toSet
    val got = TextOps.q61(s, sfDir).select($"doc_id").as[Long].collect().toSet
    assert(got === expect)
  }

  test("q61's eval side broadcasts (corpus side never shuffles to join)") {
    val plan = initialPlan(TextOps.q61Bench(spark, sfDir))
    val bcast = plan.collectWithSubqueries { case b: BroadcastExchangeExec => b }
    assert(bcast.nonEmpty, "expected the eval shingle set on a BroadcastExchange")
  }

  test("q62 scores are bounded by the corpus tf range") {
    val s = spark
    import s.implicits._
    val out = TextOps.q62(s, sfDir).cache()
    // every token occurs at least once, so mean_tf >= 1; and a doc's
    // mean cannot exceed the corpus max tf
    val maxTf = graft.Tables.t(s, sfDir, "documents")
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").count().agg(max($"count")).first().getLong(0)
    assert(out.filter($"mean_tf" < 1.0 || $"mean_tf" > maxTf).count() === 0)
    assert(out.filter($"sum_tf" < $"n_tokens").count() === 0)
    out.unpersist()
  }

  test("q63 equals the ranking-window form (aggregate is a pure rewrite)") {
    val s = spark
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"h".asc, $"doc_id".asc)
    val windowForm = graft.Tables.t(s, sfDir, "documents")
      .select($"lang", $"doc_id", LlmOps.hashKey($"doc_id").as("h"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 40)
      .select($"lang", $"rnk".cast("int").as("rnk"), $"doc_id")
    val agg = TextOps.q63(s, sfDir)
    assert(agg.exceptAll(windowForm).count() === 0)
    assert(windowForm.exceptAll(agg).count() === 0)
  }

  test("q63 plans as a bounded aggregate, not a ranking window") {
    val plan = initialPlan(TextOps.q63(spark, sfDir))
    val windows = plan.collectWithSubqueries { case w: WindowExec => w }
    assert(windows.isEmpty, "expected no WindowExec in the rebalance plan")
    assert(plan.toString.contains("topk_by_score"),
      "expected the TopKByScore aggregate in the plan")
  }
}
