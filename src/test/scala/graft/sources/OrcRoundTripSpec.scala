package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** ORC source/sink round-trip (built into Spark, zero extra deps):
  * schema and every value — timestamps included — must survive
  * parquet→ORC→read exactly, widening the format edge beside the CSV
  * and JSON paths. */
class OrcRoundTripSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("events survive an ORC round-trip bit-for-bit") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    val src = graft.Tables.t(s, "/root/testdata/sf0.001", "events")
    src.write.mode("overwrite").orc(s"$dir/events_orc")
    val back = s.read.orc(s"$dir/events_orc")
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }
}
