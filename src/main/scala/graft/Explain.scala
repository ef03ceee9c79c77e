package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of one query (or
  * all). Usage: tools/run.sh graft.Explain [queryName] [sfDir] [--bench]
  * `--bench` explains the BENCH-variant plan (the one Bench times —
  * semantic plan without determinism-only output sorts) instead of the
  * verified plan. Used to check scale posture: broadcast sides,
  * PushedFilters, ReadSchema, WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val bench = args.contains("--bench")
    val rest = args.filterNot(_ == "--bench")
    val name = rest.headOption.getOrElse("all")
    val sfDir = if (rest.length > 1) rest(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (bench) PlanSig.benchPlans else SparkEntry.queries.toSeq.sortBy(_._1)
    val qs =
      if (name == "all") base
      else base.filter(_._1 == name)
    if (qs.isEmpty) {
      System.err.println(s"unknown query '$name'; available:\n  " +
        SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      spark.stop()
      sys.exit(1)
    }
    qs.foreach { case (n, fn) =>
      println(s"===== $n =====")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
