package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.GraftFunctions.dotLong

/** The custom codegen'd expression must agree exactly with the built-in
  * lambda composition it replaces, and go loudly NULL on bad input. */
class LongArrayDotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def lambdaDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  test("matches the zip_with/aggregate composition on random-ish arrays") {
    val s = spark
    import s.implicits._
    val df = (1 to 200).map { i =>
      val a = (0 until 64).map(j => ((i * 31 + j * 17) % 2001 - 1000).toLong)
      val b = (0 until 64).map(j => ((i * 13 + j * 7) % 2001 - 1000).toLong)
      (a, b)
    }.toDF("a", "b")
    val diff = df.select(
      (dotLong($"a", $"b") - lambdaDot($"a", $"b")).as("d"))
      .filter($"d" =!= 0L).count()
    assert(diff === 0)
  }

  test("interpreted and codegen paths agree") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(dotLong($"a", $"b")).head().getLong(0) === 32L)
    // interpreted path: evaluate via a filter that can't fold
    assert(df.filter(dotLong($"a", $"b") === 32L).count() === 1)
  }

  test("NULL on width mismatch and on null input") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(1L, 2L, 3L))),
      (None: Option[Seq[Long]], Some(Seq(1L)))).toDF("a", "b")
    val out = df.select(dotLong($"a", $"b").as("d")).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
