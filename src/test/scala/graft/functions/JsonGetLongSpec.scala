package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.JsonGetLong.jsonGetLong

/** JsonGetLong must match `from_json(col, 'k BIGINT').k` row for row —
  * that identity is what lets q20 swap the CodegenFallback JsonToStructs
  * for the codegen'd streaming extractor without touching its oracle. */
class JsonGetLongSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def refForm(c: org.apache.spark.sql.Column) =
    from_json(c, StructType.fromDDL("k BIGINT")).getField("k")

  private def mismatches(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("props"), jsonGetLong(col("props"), "k").as("fast"),
        refForm(col("props")).as("ref"))
      .filter(!(col("fast") <=> col("ref")))
      .collect().map(_.toString).toSeq

  test("equals from_json on the events corpus") {
    val corpus = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
    assert(mismatches(corpus).isEmpty)
  }

  test("equals from_json on edge shapes") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      """{"k": 42}""",
      """{"k": -7, "x": 1}""",
      """{"x": 1}""",                          // missing field
      """{"k": 12.5}""",                       // non-integral
      """{"k": "12"}""",                       // string value
      """{"k": null}""",
      """{"k": true}""",
      """{"a": {"k": 5}}""",                   // nested k is NOT top-level
      """{"a": [1, {"k": 5}], "k": 9}""",      // skip arrays/objects, find k
      """{"k": 99999999999999999999999999}""", // BIGINT overflow
      """not json at all""",
      """[1, 2, 3]""",                         // non-object root
      """{"k": 1""",                           // truncated
      """{"k": 1} trailing""",                 // trailing garbage
      """{}""",
      """{"k": 1, "k": 2}""",                  // duplicate key: last wins
      """{"k": 1, "k": "x"}""")                // duplicate key poisoned
    val diff = mismatches(edges.toDF("props"))
    assert(diff.isEmpty, diff.mkString("\n"))
  }

  test("null in -> null out") {
    val s = spark
    import s.implicits._
    val r = Seq(Option.empty[String]).toDF("props")
      .select(jsonGetLong(col("props"), "k")).head()
    assert(r.isNullAt(0))
  }
}
