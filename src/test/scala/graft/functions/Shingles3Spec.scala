package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.Shingles3.shingles3

/** Shingles3 must be result-identical to the transform/element_at lambda
  * composition it replaces (and so to the oracle's list-comprehension
  * form) — that identity is what lets the DuckDB oracle SQL stay as-is. */
class Shingles3Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def lambdaForm(tk: org.apache.spark.sql.Column) =
    transform(sequence(lit(1), size(tk) - 2), i =>
      concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))

  test("equals the lambda composition on the documents corpus") {
    val s = spark
    import s.implicits._
    val df = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("tk", split($"text", " "))
      .filter(size($"tk") >= 3)
    val bad = df
      .select(shingles3($"tk").as("fast"), lambdaForm($"tk").as("ref"))
      .filter($"fast" =!= $"ref")
      .count()
    assert(bad === 0)
  }

  test("edge shapes: exactly 3 tokens, short arrays, null in -> null out") {
    val s = spark
    import s.implicits._
    val three = Seq(Seq("a", "b", "c")).toDF("tk").select(shingles3($"tk")).head().getSeq[String](0)
    assert(three === Seq("a b c"))
    val short = Seq(Seq("a", "b")).toDF("tk").select(shingles3($"tk")).head().getSeq[String](0)
    assert(short === Seq.empty)
    val n = Seq(Option.empty[Seq[String]]).toDF("tk").select(shingles3($"tk")).head()
    assert(n.isNullAt(0))
  }

  test("stays codegen: no CodegenFallback lambda in a shingling plan") {
    val s = spark
    import s.implicits._
    val plan = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("tk", split($"text", " "))
      .filter(size($"tk") >= 3)
      .select(explode(array_distinct(shingles3($"tk"))).as("sh"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"), plan.take(1500))
  }
}
