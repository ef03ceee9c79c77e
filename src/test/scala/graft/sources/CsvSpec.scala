package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CSV round-trip: events (timestamps at micro precision, doubles,
  * strings with nulls) written and re-read must be value-identical to
  * the parquet original — including the lossy corners CSV is known for
  * (timestamp truncation, null-vs-empty ambiguity). */
class CsvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("events round-trip CSV exactly, including micros and nulls") {
    val src = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      // exercise the null-vs-empty split explicitly
      .withColumn("props",
        when(col("event_id") % 7 === 0, lit(null))
          .when(col("event_id") % 7 === 1, lit(""))
          .otherwise(col("props")))
    val dir = Files.createTempDirectory("graft_csv").toString
    Csv.write(src, dir)
    val back = Csv.read(spark, dir, src.schema)
    assert(back.count() === src.count())
    // exact value equality, both directions (timestamps via epoch micros)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", unix_micros(col("ts")))
    assert(canon(back).except(canon(src)).isEmpty)
    assert(canon(src).except(canon(back)).isEmpty)
    // null and empty string survived as distinct values
    assert(back.filter(col("props").isNull).count() ===
      src.filter(col("props").isNull).count())
    assert(back.filter(col("props") === "").count() ===
      src.filter(col("props") === "").count())
  }
}
