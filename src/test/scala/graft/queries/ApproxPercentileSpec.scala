package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q49's sketch shape (its Verify form carries a BRACKET oracle; quantile sketches differ across engines by
  * design); its correctness contract is semantic: each approximate
  * percentile must land inside a bracket of EXACT percentiles around its
  * target rank. approx_percentile at accuracy=10000 bounds rank error at
  * n/10000 — far tighter than the ±5-percentile bracket asserted here —
  * so the loose bound keeps the test stable across Spark versions. */
class ApproxPercentileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q49 approx percentiles sit inside exact-percentile brackets per group") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val approx = Relational.q49Bench(spark, "/root/testdata/sf0.01")
    val bounds = graft.Tables.t(spark, "/root/testdata/sf0.01", "events")
      .groupBy($"event_type")
      .agg(
        expr("percentile(value, 0.45)").as("p45"),
        expr("percentile(value, 0.55)").as("p55"),
        expr("percentile(value, 0.85)").as("p85"),
        expr("percentile(value, 0.95)").as("p95"))
    val rows = approx.join(bounds, "event_type").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (med, p90) = (r.getDouble(1), r.getDouble(2))
      val (p45, p55, p85, p95) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(med >= p45 && med <= p55,
        s"${r.getString(0)}: approx med $med outside [$p45, $p55]")
      assert(p90 >= p85 && p90 <= p95,
        s"${r.getString(0)}: approx p90 $p90 outside [$p85, $p95]")
    }
  }
}
