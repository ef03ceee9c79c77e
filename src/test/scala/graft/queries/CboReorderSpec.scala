package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Cost-based join reordering, demonstrated like DppSpec/BloomJoinSpec
  * demonstrate their optimizations: with table/column stats available,
  * Catalyst's DP-based reorder must rewrite a join written
  * fact-⋈-dim1-⋈-dim2 so the selective dim1⋈dim2 reduction happens
  * FIRST — at 100 TB the difference between shrinking the fact stream
  * early and dragging the full fact through two shuffles. (AQE handles
  * runtime sizes; CBO handles what's knowable before execution — both
  * are part of the "let Catalyst optimize" contract.) */
class CboReorderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated() // mutates session confs

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("stats-driven reorder joins the selective dims before the fact") {
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val s = spark
      import s.implicits._
      val sfDir = "/root/testdata/sf0.01"
      // catalog tables (ANALYZE needs the catalog, not bare parquet).
      // A fresh JVM forgets the in-memory catalog but the managed
      // LOCATION survives in spark-warehouse/ — clear both, or
      // saveAsTable fails with LOCATION_ALREADY_EXISTS on the 2nd run.
      Seq("orders", "customer", "nation").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS cbo_$t")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + s"/cbo_$t")
        loc.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(loc, true)
        graft.Tables.t(s, sfDir, t).write.mode("overwrite")
          .saveAsTable(s"cbo_$t")
      }
      s.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
      s.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS")
      s.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")

      // written WORST-first: the 15k-row fact joins the 1.5k customer
      // before the 1-row nation selection is applied
      val q = s.table("cbo_orders")
        .join(s.table("cbo_customer"), $"o_custkey" === $"c_custkey")
        .join(s.table("cbo_nation").filter($"n_name" === "FRANCE"),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name").agg(count(lit(1)).as("n"))

      val joins = q.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.size === 2)
      // the INNERMOST join (deepest in the tree) must be customer⋈nation,
      // i.e. neither side of it touches the orders relation
      val innermost = joins.last
      val touchesOrders = innermost.collectLeaves()
        .exists(_.toString.contains("cbo_orders"))
      assert(!touchesOrders,
        "expected customer⋈nation first under CBO, got:\n" +
          q.queryExecution.optimizedPlan.toString.take(2500))

      // control: with reorder off, the written (worst) order survives
      withConf("spark.sql.cbo.joinReorder.enabled" -> "false") {
        val q2 = s.table("cbo_orders")
          .join(s.table("cbo_customer"), $"o_custkey" === $"c_custkey")
          .join(s.table("cbo_nation").filter($"n_name" === "FRANCE"),
            $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name").agg(count(lit(1)).as("n"))
        val inner2 = q2.queryExecution.optimizedPlan
          .collect { case j: Join => j }.last
        assert(inner2.collectLeaves().exists(_.toString.contains("cbo_orders")),
          "control: without joinReorder the written order should keep the fact innermost")
      }
    }
  }
}
