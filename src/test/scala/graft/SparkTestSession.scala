package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM (Test/fork := true
  * gives all suites a single forked JVM, so getOrCreate dedups). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** A suite-private session: same SparkContext and warehouse, OWN
    * SQLConf / catalog registry / temp views. Any suite that mutates a
    * session conf — even inside try/finally — must run on one of
    * these: sbt executes suites IN PARALLEL inside the single forked
    * JVM, so a conf window on the shared session bleeds into whatever
    * other suite is mid-flight (the round-14 flake: a concurrent
    * suite's window defeated a SQL DELETE's file pruning). */
  def isolated(): SparkSession = spark.newSession()
}
