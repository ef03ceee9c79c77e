package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Spark's built-in `session_window` must agree with q52's manual
  * two-window sessionization on the testdata — same gap rule, same
  * session boundaries. (The built-in closes a session when the next
  * event is >= gap after the last; q52's rule is gap > 1h opens a new
  * session — these differ only for a gap of EXACTLY one hour, which the
  * first assertion rules out on this data.) */
class SessionWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("no gap in the data sits exactly on the 1h boundary (guard)") {
    val s = spark
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us", $"event_id")
    val exact = graft.Tables.t(s, sfDir, "events")
      .select($"user_id", $"event_id", graft.Det.tsUs($"ts").as("us"))
      .withColumn("gap", $"us" - lag($"us", 1).over(w))
      .filter($"gap" === Sessions.GapUs.toLong)
      .count()
    assert(exact === 0, "boundary-gap rows would make the two forms diverge")
  }

  test("session_window sessions == q52's manual sessions") {
    val s = spark
    import s.implicits._
    val builtin = graft.Tables.t(s, sfDir, "events")
      .groupBy(session_window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        min(graft.Det.tsUs($"ts")).as("start_us"),
        max(graft.Det.tsUs($"ts")).as("end_us"))
      .select($"user_id", $"n_events", $"start_us", $"end_us")
    val manual = Sessions.q52(s, sfDir)
      .select($"user_id", $"n_events", $"start_us", $"end_us")
    assert(builtin.exceptAll(manual).count() === 0 &&
      manual.exceptAll(builtin).count() === 0,
      "built-in session_window and the manual two-window plan must agree")
  }
}
