package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `Dataset.observe` — in-flight pipeline metrics collected DURING the
  * job (q73's audit table costs its own scans; observe rides the write
  * for free — the production pattern for row-count/null-count counters
  * on every load). */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("observe collects audit metrics during the write, no extra scan") {
    val s = spark
    import s.implicits._
    val obs = Observation("load_audit")
    val df = graft.Tables.t(s, "/root/testdata/sf0.001", "orders")
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when($"o_totalprice".isNull, 1L).otherwise(0L)).as("null_price"),
        max($"o_orderkey").as("max_key"))
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val expectRows = graft.Tables.t(s, "/root/testdata/sf0.001", "orders").count()
    assert(m("rows") === expectRows)
    assert(m("null_price") === 0L)
    assert(m("max_key").asInstanceOf[Long] > 0L)
  }
}
