package graft.functions

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** FreqSketch inside a STREAMING aggregation — the trending-terms
  * shape: the sketch buffer lives in the state store across
  * micro-batches (serialize/deserialize exercised for real), and the
  * membership guarantee must hold over the UNION of all batches, not
  * per batch. */
class StreamingFreqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sketch state accumulates across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[String]
    val query = input.toDF().toDF("item")
      .groupBy()
      .agg(FreqSketch.freqSketch($"item", 5).as("sk"))
      .writeStream
      .format("memory").queryName("freq_out")
      .outputMode("complete").start()
    try {
      // batch 1: hot1 frequent among noise
      input.addData(Seq.fill(40)("hot1") ++ (0 until 30).map(i => s"a$i"): _*)
      query.processAllAvailable()
      // batch 2: hot2 becomes frequent only when batches combine
      input.addData(Seq.fill(40)("hot2") ++ (30 until 60).map(i => s"a$i"): _*)
      query.processAllAvailable()
      val items = s.table("freq_out")
        .selectExpr("explode(sk) AS e").select($"e.item")
        .as[String].collect().toSet
      // n=140, k=5 → guarantee threshold n/6 ≈ 23; both hots are 40
      assert(items.contains("hot1"), s"hot1 missing from $items")
      assert(items.contains("hot2"), s"hot2 missing from $items")
    } finally query.stop()
  }
}
