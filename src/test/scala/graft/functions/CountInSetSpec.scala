package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.CountInSet.countInSet

/** CountInSet must match the aggregate() lambda composition it replaces
  * (multiplicity-preserving membership count) — that identity is what
  * lets the DuckDB oracle SQL stay in the list_sum form. */
class CountInSetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val words = Seq("the", "a", "of", "and", "dup")

  private def lambdaForm(tk: org.apache.spark.sql.Column) =
    aggregate(tk, lit(0L), (acc, x) => acc + when(x.isin(words: _*), 1L).otherwise(0L))

  test("equals the aggregate() lambda on the documents corpus") {
    val s = spark
    import s.implicits._
    val bad = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("tk", split($"text", " "))
      .select(countInSet($"tk", words).as("fast"), lambdaForm($"tk").as("ref"))
      .filter($"fast" =!= $"ref")
      .count()
    assert(bad === 0)
  }

  test("duplicates count with multiplicity; null array -> null; null elements skip") {
    val s = spark
    import s.implicits._
    val dup = Seq(Seq("the", "the", "x", "dup")).toDF("tk")
      .select(countInSet($"tk", words)).head().getLong(0)
    assert(dup === 3L)
    val n = Seq(Option.empty[Seq[String]]).toDF("tk").select(countInSet($"tk", words)).head()
    assert(n.isNullAt(0))
    val withNulls = Seq(Seq(Some("the"), None, Some("a"))).toDF("tk")
      .select(countInSet($"tk", words)).head().getLong(0)
    assert(withNulls === 2L)
  }
}
