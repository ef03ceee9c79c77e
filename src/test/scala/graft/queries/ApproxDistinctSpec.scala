package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q39's sketch shape (its Verify form carries a BRACKET oracle; HLL sketches differ across engines by
  * design); its correctness contract is semantic: the approximate
  * cardinality must sit within a small relative error of the exact count
  * per group. HLL++ at rsd=0.02 is far tighter than the 10% asserted
  * here — the loose bound keeps the test stable across Spark versions. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q39 approx_count_distinct within 10% of exact per group") {
    val rows = Relational.q39Bench(spark, "/root/testdata/sf0.01")
      .select("event_type", "approx_users", "exact_users").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(exact > 0)
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.10,
        s"${r.getString(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
  }
}
