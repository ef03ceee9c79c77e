package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Det._
import graft.plans.Mv

/** Materialized-view demo surface: the daily events pre-aggregate as a
  * REGISTERED view ([[graft.plans.Mv]]), plus two queries written
  * against the RAW events table that the rewriter answers from the
  * artifact instead.
  *
  * The artifact keeps values in EXACT integer cents (graft.Det), not
  * money doubles: a roll-up re-aggregates materialized values, and only
  * integer sums are associative — the same reasoning that makes every
  * oracle-checked aggregate in this repo integer-exact, applied to the
  * stored form of the view.
  *
  *  - q93 (EXACT hit): the query IS the view's shape → the plan becomes
  *    a pure projection of the artifact, no aggregation at all.
  *  - q94 (ROLL-UP): coarser grouping (month = a FUNCTION of the view's
  *    day grouping), a day-range filter (pushed onto the artifact), and
  *    count/sum/max re-aggregated per the distributive algebra
  *    (count→sum(n), sum→sum(sum_x), max→max(max_x)).
  *
  * Both run through [[Mv.rewrite]] (the explicit mode), so the DuckDB
  * oracle — which recomputes from RAW events — certifies the rewrite's
  * semantics end-to-end, and the plan-signature snapshot pins that the
  * certified plan really reads the artifact (one tiny scan, no raw
  * scan). At 100 TB this is the difference between a dashboard query
  * scanning 100 TB and scanning megabytes.
  */
object Materialized {

  type Q = (SparkSession, String) => DataFrame

  private def tag(dir: String): String = graft.Tables.dirTag(dir)

  private[queries] def mvPath(s: SparkSession, dir: String): String =
    s.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
      s"/graft_mv/daily_${tag(dir)}"

  /** The view's defining query — the daily pre-aggregate in exact cents. */
  private[graft] def defining(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.t(s, dir, "events")
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(cents($"value")).as("sum_cents"),
        max(cents($"value")).as("max_cents"))
  }

  /** Build (once, source-stamped) and register the view. Maintenance at
    * scale is [[Incremental]]'s per-day dynamic-overwrite contract; here
    * the build is one overwrite because registration, not maintenance,
    * is what this module adds. */
  def ensureMv(s: SparkSession, dir: String): String = synchronized {
    val path = mvPath(s, dir)
    val loc = new org.apache.hadoop.fs.Path(path)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = graft.SourceStamp.table(s, dir, "events")
    if (!fs.exists(loc) || !graft.SourceStamp.isCurrent(s, path, st)) {
      if (fs.exists(loc)) fs.delete(loc, true)
      defining(s, dir).write.mode("overwrite").parquet(path)
      graft.SourceStamp.write(s, path, st)
    }
    Mv.register(s, s"daily_events_${tag(dir)}", defining(s, dir), path)
    path
  }

  // ---------------------------------------------------------------------
  // q93: exact hit — the raw-table query matches the view's full shape;
  // the rewritten plan is a projection of the artifact (no aggregation).
  // ---------------------------------------------------------------------
  val q93Bench: Q = (s, dir) => {
    ensureMv(s, dir)
    Mv.rewrite(s, defining(s, dir))
  }
  val q93: Q = (s, dir) => {
    import s.implicits._
    q93Bench(s, dir).orderBy($"day", $"event_type")
  }
  val q93Sql: String =
    s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       |  COUNT(*) AS n,
       |  CAST(SUM(${sqlCents("value")}) AS BIGINT) AS sum_cents,
       |  MAX(${sqlCents("value")}) AS max_cents
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY day, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q94: roll-up — month (a function of the view's day grouping), a
  // day-range filter moved onto the artifact, distributive re-aggregation.
  // ---------------------------------------------------------------------
  private val FromDay = "2024-01-08"

  val q94Bench: Q = (s, dir) => {
    import s.implicits._
    ensureMv(s, dir)
    val raw = graft.Tables.t(s, dir, "events")
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .filter($"day" >= FromDay)
      .groupBy(substring($"day", 1, 7).as("month"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(cents($"value")).as("sum_cents"),
        max(cents($"value")).as("max_cents"))
    Mv.rewrite(s, raw)
  }
  val q94: Q = (s, dir) => {
    import s.implicits._
    q94Bench(s, dir).orderBy($"month", $"event_type")
  }
  val q94Sql: String =
    s"""SELECT substr(strftime(date_trunc('day', ts), '%Y-%m-%d'), 1, 7) AS month,
       |  event_type,
       |  COUNT(*) AS n,
       |  CAST(SUM(${sqlCents("value")}) AS BIGINT) AS sum_cents,
       |  MAX(${sqlCents("value")}) AS max_cents
       |FROM events
       |WHERE strftime(date_trunc('day', ts), '%Y-%m-%d') >= '$FromDay'
       |GROUP BY 1, 2
       |ORDER BY month, event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q93_mv_exact"  -> q93,
    "q94_mv_rollup" -> q94)
  val oracles: Map[String, String] = Map(
    "q93_mv_exact"  -> q93Sql,
    "q94_mv_rollup" -> q94Sql)

  /** Bench-time override minus the determinism-only global sort. */
  val benchVariants: Map[String, Q] = Map(
    "q93_mv_exact"  -> q93Bench,
    "q94_mv_rollup" -> q94Bench)
}
