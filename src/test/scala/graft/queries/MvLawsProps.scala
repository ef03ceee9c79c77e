package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.Det._
import graft.SparkTestSession
import graft.plans.Mv

/** Algebraic law of the MV rewriter: for ANY query in the supported
  * space — a grouping drawn from {day, event_type, month(day)}, any
  * subset of the supported aggregates, an optional day-range filter —
  * the rewritten plan returns exactly the raw plan's rows. Each case
  * runs real Spark jobs, so the success count is small (laws, not load
  * tests); the FIXED q93/q94 shapes are the driver-checked oracles, this
  * closes the combinatorial space between them. */
object MvLawsProps extends Properties("graft.mv") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val groupingGen: Gen[Seq[String]] =
    Gen.someOf(Seq("day", "event_type", "month")).map(_.toSeq)
      .suchThat(_.nonEmpty)

  private val aggsGen: Gen[Seq[String]] =
    Gen.someOf(Seq("n", "sum_cents", "max_cents")).map(_.toSeq)
      .suchThat(_.nonEmpty)

  private val filterGen: Gen[Option[String]] =
    Gen.oneOf(None, Some("2024-01-05"), Some("2024-01-20"))

  property("rewritten == raw over the supported query space") =
    Prop.forAll(groupingGen, aggsGen, filterGen) { (gs, as, f) =>
      val s = spark
      import s.implicits._
      Materialized.ensureMv(s, sfDir)
      val base0 = graft.Tables.t(s, sfDir, "events")
        .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      val base = f.fold(base0)(d => base0.filter($"day" >= d))
      val gcols = gs.map {
        case "month" => substring($"day", 1, 7).as("month")
        case g       => col(g)
      }
      val acols = as.map {
        case "n"         => count(lit(1)).as("n")
        case "sum_cents" => sum(cents($"value")).as("sum_cents")
        case "max_cents" => max(cents($"value")).as("max_cents")
      }
      val raw = base.groupBy(gcols: _*).agg(acols.head, acols.tail: _*)
      val rewritten = Mv.rewrite(s, raw)
      val scans = graft.PlanSig.initialPlan(rewritten).collectWithSubqueries {
        case fs: org.apache.spark.sql.execution.FileSourceScanExec =>
          fs.relation.location.rootPaths.mkString(",")
      }
      val substituted = scans.nonEmpty && scans.forall(_.contains("graft_mv"))
      val same = rewritten.collect().map(_.toSeq).toSet ==
        raw.collect().map(_.toSeq).toSet
      Prop.collect(s"gs=${gs.sorted.mkString("+")} f=${f.isDefined}") {
        substituted && same
      }
    }
}
