package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main. Emits ONE JSON line
  * `{"queries":{...},"errors":{...},"sf":...,"metric":"total","unit":"sec","value":N}`.
  *
  * Round-comparable by construction: a warmup pass (absorbs JVM/codegen/
  * session init, not billed to any query), then per query the MIN of
  * three timed runs in fixed sorted name order — one-shot timing noise
  * (GC, page cache) can only inflate, so min-of-3 is the stable estimator.
  * Determinism-only global sorts are excluded via
  * [[graft.queries.Relational.benchVariants]]; the verified (sorted)
  * plans still run in graft.Verify. A failing query is reported as `-1`
  * with its error recorded and a nonzero exit code.
  *
  * The timed action is a `noop`-sink write, NOT `count()`: under a count
  * aggregate Catalyst prunes every operator that doesn't affect
  * cardinality (windows, projections, sorts), so counting would bench
  * several queries as bare parquet scans. The noop sink consumes every
  * output row (full plan executes, nothing is persisted or collected).
  */
object Bench {
  // min-of-5: timing noise on this host is one-sided (GC, scheduling,
  // neighbor load can only inflate) and was observed at ±30% run-to-run
  // on unchanged sub-second queries — two extra runs per query buy a
  // visibly more stable minimum at ~1 min of extra wall clock.
  private val timedRuns = 5

  /** Execute the full physical plan, discarding rows executor-side. */
  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** JSON string escape covering every control char — an exception
    * message with \b or NUL must not break the one-line protocol. */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev loop: SPARK_GRAFT_ONLY=q25,q30 times just the named queries
    // (substring match). The driver sets no filter and benches everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val ordered = (SparkEntry.queries ++
        graft.queries.Relational.benchVariants ++
        graft.queries.LlmOps.benchVariants ++
        graft.queries.TextOps.benchVariants ++
        graft.queries.Sessions.benchVariants ++
        graft.queries.ZOrder.benchVariants ++
        graft.queries.Txn.benchVariants ++
        graft.queries.Materialized.benchVariants ++
        graft.multimodal.Multimodal.benchVariants)
      .toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
    // Warmup: one untimed pass over every query (catches codegen + scan
    // setup; failures here are also failures in the timed pass and are
    // reported there). NonFatal only — an OOM must crash, not mis-report.
    // The guard-rail gate runs here too: a plan with a cluster-melter
    // hazard (graft.plans.GuardRails, minus the justified allowlist) is
    // REFUSED — reported as an error, never timed — so a future query
    // cannot get benched un-audited.
    val gated = scala.collection.mutable.LinkedHashMap[String, String]()
    ordered.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val hz = graft.plans.GuardRails.gate(name, df)
        if (hz.nonEmpty)
          gated(name) = hz.map(h => s"[${h.kind}] ${h.detail}")
            .mkString("guard-rail refusal: ", "; ", "")
        else materialize(df)
      } catch { case NonFatal(_) => () }
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = ordered.map { case (name, fn) =>
      val times = (1 to timedRuns).map { _ =>
        if (gated.contains(name)) {
          errors.getOrElseUpdate(name, gated(name).take(200))
          -1.0
        } else {
          val t0 = System.nanoTime()
          try { materialize(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
          catch { case NonFatal(e) =>
            errors.getOrElseUpdate(name,
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
            -1.0
          }
        }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    // Headline fields LAST: the driver stores only the tail of a long
    // line, so the per-query dict goes first and the total/errors/sf
    // survive any front-truncation (round-8 artifact lost the total).
    println(s"""{"queries":$qs,"errors":$errJson,"sf":"$sfDir","metric":"total","unit":"sec","value":$total}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
