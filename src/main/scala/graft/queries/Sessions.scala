package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det._
import graft.Tables.t

/** Batch sessionization over the `events` stream table — the batch twin
  * of [[graft.streaming.Sessionize]] (reference analog: the daily-batch
  * side of the pipeline's event analytics; the streaming side is
  * flatMapGroupsWithState).
  *
  * Gap-based session semantics (industry default, e.g. GA4): a user's
  * events belong to one session while consecutive gaps are <= 1 h; the
  * first event (or a gap > 1 h) opens a new session.
  */
object Sessions {

  type Q = (SparkSession, String) => DataFrame

  /** Session gap in microseconds (1 hour). Exact integer comparison on
    * epoch micros — no interval arithmetic to diverge across engines. */
  private[queries] val GapUs: Long = 3600L * 1000000L

  // ---------------------------------------------------------------------
  // q52: gap sessionization = two stacked window functions + one agg.
  //   lag(us)          -> gap to previous event        (window 1)
  //   sum(is_new) asc  -> running session ordinal      (window 2)
  //   groupBy(user_id, session_seq) -> per-session stats
  //
  // Scale: both windows share PARTITION BY user_id ORDER BY (us,
  // event_id), so Catalyst plans ONE Exchange + ONE Sort feeding both
  // Window operators — and the final aggregate reuses that layout too
  // (hash(user_id) satisfies the (user_id, session_seq) clustering:
  // equal keys co-locate), so the WHOLE query is a single-shuffle plan
  // (asserted in SessionsBatchSpec). Nothing here is all-pairs and
  // session state never leaves the user's partition — at 100 TB the only
  // skew risk is a single hyperactive user_id, the same bound as any
  // per-user window, and the agg's map-side partials absorb it.
  //
  // Determinism: epoch-micro longs end-to-end (tsUs == DuckDB epoch_us
  // after Tables.t's nanos->micros truncation), exact integer gap
  // compare, cents-quantized value sum, (us, event_id) tie-break.
  // ---------------------------------------------------------------------
  val q52Bench: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select($"user_id", $"event_id", tsUs($"ts").as("us"),
        cents($"value").as("value_c"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("is_new",
        when($"prev_us".isNull || $"us" - $"prev_us" > GapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum($"is_new").over(running))
      .groupBy($"user_id", $"session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min($"us").as("start_us"),
        max($"us").as("end_us"),
        money(sum($"value_c")).as("total_value"))
      .withColumn("duration_sec", expr("(end_us - start_us) div 1000000"))
  }
  val q52: Q = (s, dir) => {
    import s.implicits._
    q52Bench(s, dir).orderBy($"user_id", $"session_seq")
  }
  val q52Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    ${sqlCents("value")} AS value_c
       |  FROM events),
       |gaps AS (
       |  SELECT *, lag(us, 1) OVER w AS prev_us,
       |    CASE WHEN lag(us, 1) OVER w IS NULL
       |              OR us - lag(us, 1) OVER w > $GapUs
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |sessions AS (
       |  SELECT *, SUM(is_new) OVER
       |    (PARTITION BY user_id ORDER BY us, event_id
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM gaps)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |  COUNT(*) AS n_events,
       |  MIN(us) AS start_us, MAX(us) AS end_us,
       |  SUM(value_c) / 100.0 AS total_value,
       |  (MAX(us) - MIN(us)) // 1000000 AS duration_sec
       |FROM sessions
       |GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin

  val queries: Map[String, Q] = Map("q52_sessionize" -> q52)
  val oracles: Map[String, String] = Map("q52_sessionize" -> q52Sql)

  /** The benched plan drops only the determinism-only global sort
    * (same split as [[Relational.benchVariants]]). */
  val benchVariants: Map[String, Q] = Map("q52_sessionize" -> q52Bench)
}
