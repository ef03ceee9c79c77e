package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    // The STATIC oracle SQL pins the IVF/kmeans defaults (q46/q58/q110/
    // q118 interpolate them at compile time) while the DataFrame paths
    // read session confs — a session that re-tunes the knobs would make
    // this gate compare plans built with DIFFERENT parameters and fail
    // for a non-bug reason. Refuse to certify under non-default knobs.
    Seq("graft.ivf.k", "graft.ivf.nprobe", "graft.kmeans.iters").foreach { k =>
      require(spark.conf.getOption(k).isEmpty,
        s"$k is set: the pinned oracles assume the defaults — unset it " +
          "(production sessions may re-tune, but then own the divergence " +
          "from the test oracle)")
    }
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_ONLY=q107 dumps just the named queries (the
    // driver sets no filter); oracle_sql.json still carries every entry.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // advisory here (correctness must still be measured); Bench is
        // the gate that refuses outright
        graft.plans.GuardRails.gate(name, df).foreach(h =>
          System.err.println(s"[guard-rails] $name: [${h.kind}] ${h.detail}"))
        // Default (the driver's gate): ONE ordered output file — the
        // compare is row-order-sensitive. SPARK_GRAFT_VERIFY_PARALLEL=1
        // writes with full parallelism instead (coalesce(1) collapses
        // every pre-shuffle stage into one task — at sf10 that turns a
        // 32-core run into a single-threaded one); the companion
        // check.py --setop mode then compares as multisets in DuckDB.
        if (sys.env.contains("SPARK_GRAFT_VERIFY_PARALLEL"))
          df.write.mode("overwrite").parquet(s"$outDir/$name")
        else
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
