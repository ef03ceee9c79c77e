package graft

import java.nio.file.{Files, Paths}

/** Dev-loop utility: write each oracleSql entry to `<outDir>/<name>.sql`
  * without starting Spark or running any query — lets tools/check.py-style
  * DuckDB iteration validate oracle SQL in seconds. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/oracle_sql")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      Files.writeString(Paths.get(s"$outDir/$name.sql"), sql)
    }
    println(s"wrote ${SparkEntry.oracleSql.size} oracle SQL files to $outDir")
  }
}
