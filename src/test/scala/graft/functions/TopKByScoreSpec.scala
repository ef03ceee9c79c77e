package graft.functions

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.TopKByScore.topKByScore

/** TopKByScore: the bounded grouped top-k aggregate. Semantics are
  * pinned to the ranking-window form it replaces (row_number over
  * score DESC, id ASC), including exact score ties; the plan claim —
  * partial/final ObjectHashAggregate, i.e. map-side combine — is
  * asserted against the physical plan. */
class TopKByScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Adversarial fixture: ties across groups and within groups (score
    * collisions via i%7), one group with fewer rows than k, ids out of
    * order relative to scores. */
  private def fixture = {
    val s = spark
    import s.implicits._
    (0 until 400)
      .map(i => (s"g${i % 5}", (i % 7).toDouble / 7.0, (997L * i) % 1000))
      .toDF("g", "score", "id")
      .union(Seq(("tiny", 0.5, 1L), ("tiny", 0.5, 0L)).toDF("g", "score", "id"))
      .repartition(8) // force multiple map-side partial buffers
  }

  test("agg equals the ranking-window form, ties included") {
    val s = spark
    import s.implicits._
    val k = 3
    val viaAgg = fixture.groupBy($"g")
      .agg(topKByScore($"score", $"id", k).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", ($"pos" + 1).cast("long").as("rank"), $"t.id", $"t.score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val viaWindow = fixture.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"g", $"rank".cast("long"), $"id", $"score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(viaAgg === viaWindow)
    // the short group returns all its rows, ordered, not k
    val tiny = fixture.filter($"g" === "tiny").groupBy($"g")
      .agg(topKByScore($"score", $"id", k).as("top")).head().getSeq[Any](1)
    assert(tiny.size === 2)
  }

  test("null scores/ids are skipped; empty group yields empty array") {
    val s = spark
    import s.implicits._
    val df = Seq[(String, Option[Double], Option[Long])](
      ("a", Some(1.0), Some(1L)), ("a", None, Some(2L)), ("a", Some(2.0), None))
      .toDF("g", "score", "id")
    val top = df.groupBy($"g").agg(topKByScore($"score", $"id", 5).as("top"))
      .head().getSeq[org.apache.spark.sql.Row](1)
    assert(top.map(r => (r.getLong(0), r.getDouble(1))) === Seq((1L, 1.0)))
    val empty = df.filter($"score" < 0).groupBy($"g")
      .agg(topKByScore($"score", $"id", 5).as("top"))
    assert(empty.collect().forall(_.getSeq[Any](1).isEmpty))
  }

  test("plans as partial+final ObjectHashAggregate (map-side combine)") {
    val s = spark
    import s.implicits._
    val df = fixture.groupBy($"g").agg(topKByScore($"score", $"id", 3).as("top"))
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val aggs = plan.collect { case o: ObjectHashAggregateExec => o }
    assert(aggs.size === 2, s"expected partial+final ObjectHashAggregate:\n$plan")
    val modes = aggs.flatMap(_.aggregateExpressions.map(_.mode.toString)).distinct
    assert(modes.sorted === Seq("Final", "Partial"), s"modes: $modes\n$plan")
  }

  test("SQL registration: topk_by_score with literal k; non-literal rejected") {
    val base = SparkTestSession.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val rows = s.sql(
        """SELECT g, topk_by_score(score, id, 2) AS top FROM VALUES
          |  ('a', 1.0D, 10L), ('a', 3.0D, 11L), ('a', 2.0D, 12L),
          |  ('b', 5.0D, 20L)
          |AS t(g, score, id) GROUP BY g ORDER BY g""".stripMargin).collect()
      assert(rows.map(_.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)).toList)
        .toList === List(List(11L, 12L), List(20L)))
      val err = intercept[Exception](
        s.sql("SELECT topk_by_score(score, id, CAST(rand()*3 AS INT)) FROM VALUES ('a', 1.0D, 1L) AS t(g, score, id) GROUP BY g").collect())
      assert(err.getMessage.contains("literal int k"), err.getMessage)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
