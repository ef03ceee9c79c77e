package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q68's semantic guarantees (its Verify form carries a BRACKET oracle — DataSketches HLL state
  * is engine-specific): union-of-daily-sketches must be LOSSLESS vs
  * sketching the raw data once, and estimates must sit within HLL error
  * of the exact distinct counts. */
class SketchRollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("two-level sketch union equals direct one-level sketching") {
    val s = spark
    import s.implicits._
    val ev = graft.Tables.t(s, sfDir, "events")
    val twoLevel = ev
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val oneLevel = ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
    val joined = twoLevel.withColumnRenamed("est", "est2")
      .join(oneLevel, "event_type")
    assert(joined.filter($"est2" =!= $"est").count() === 0,
      "sketch union must be lossless: daily-rollup estimate == direct estimate")
  }

  test("sketches survive a parquet round-trip (the persisted daily cube)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    val ev = graft.Tables.t(s, sfDir, "events")
    ev.groupBy($"event_type", to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .write.mode("overwrite").parquet(s"$dir/daily_sketches")
    val fromDisk = s.read.parquet(s"$dir/daily_sketches")
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val direct = ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
    val diff = fromDisk.withColumnRenamed("est", "est2")
      .join(direct, "event_type")
      .filter($"est2" =!= $"est").count()
    assert(diff === 0,
      "persisted sketches must union to the same estimate as direct sketching")
  }

  test("estimates are within HLL error of exact distinct counts") {
    val s = spark
    import s.implicits._
    val est = Relational.q68Bench(s, sfDir)
      .select($"event_type", $"approx_users").as[(String, Long)].collect().toMap
    val exact = graft.Tables.t(s, sfDir, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val e = est(k)
      // default lgConfigK=12 → relative error ~1.6%; 5% is a safe floor
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: estimate $e vs exact $n")
    }
  }
}
