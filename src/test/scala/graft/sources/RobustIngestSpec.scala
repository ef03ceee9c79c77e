package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ingest-robustness edges a production lake hits weekly: malformed
  * JSON rows must quarantine (not kill the job), parquet schema
  * evolution must merge, and nested projections must prune to the leaf
  * at the scan. */
class RobustIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("malformed JSON rows quarantine into _corrupt_record, valid rows parse") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("jsonl").toString
    Files.writeString(Paths.get(s"$dir/data.jsonl"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 BROKEN
        |{"id": 3, "v": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val df = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    assert(df.count() === 3)
    assert(df.filter($"_corrupt_record".isNotNull).count() === 1)
    assert(df.filter($"_corrupt_record".isNull).select(sum($"id")).first().getLong(0) === 4L)
    df.unpersist()
  }

  test("parquet schema evolution merges old and new batches") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("evolve").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$dir/t/batch=2")
    val merged = s.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet === Set("id", "v", "score", "batch"))
    // the old batch surfaces the new column as null, not an error
    assert(merged.filter($"id" === 1 && $"score".isNull).count() === 1)
    assert(merged.filter($"id" === 2 && $"score" === 9.5).count() === 1)
  }

  test("a nested-leaf projection prunes the parquet read schema to the leaf") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("nested").toString
    Seq((1L, ("x", 3.5, 42L)), (2L, ("y", 4.5, 43L)))
      .toDF("id", "payload")
      .select($"id", $"payload".cast("struct<name:string,temp:double,n:bigint>"))
      .write.parquet(s"$dir/t")
    val q = s.read.parquet(s"$dir/t").select($"payload.temp")
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val scan = plan.collect { case sc: FileSourceScanExec => sc }.head
    val read = scan.requiredSchema.catalogString
    assert(read.contains("temp") && !read.contains("name") && !read.contains("n:"),
      s"nested pruning failed, read schema: $read")
  }
}
