package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Misra-Gries FreqSketch: the membership guarantee (every item above
  * n/(k+1) survives any partitioning), the counter error bound, and the
  * SQL registration — the properties q71's exact-verify composition
  * depends on. */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Skewed stream: two genuinely heavy items among unique noise. */
  private def stream: Seq[String] = {
    val hot1 = Seq.fill(300)("hot1") // 30%
    val hot2 = Seq.fill(120)("hot2") // 12%
    val noise = (0 until 580).map(i => s"noise$i")
    // deterministic interleave, worst-ish case for MG (noise between hits)
    (hot1 ++ hot2 ++ noise).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000 }.map(_._1)
  }

  private def sketchOf(parts: Int, k: Int): Map[String, Long] = {
    val s = spark
    import s.implicits._
    stream.toDF("item").repartition(parts)
      .agg(FreqSketch.freqSketch($"item", k).as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.item", $"e.count_lb")
      .as[(String, Long)].collect().toMap
  }

  test("items above n/(k+1) survive any partitioning") {
    for (parts <- Seq(1, 4, 13)) {
      val got = sketchOf(parts, k = 10) // n/(k+1) = 1000/11 ≈ 91
      assert(got.contains("hot1"), s"hot1 missing at $parts partitions")
      assert(got.contains("hot2"), s"hot2 missing at $parts partitions")
    }
  }

  test("surviving counters are lower bounds within n/(k+1) of truth") {
    val k = 10
    val got = sketchOf(4, k)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slack = stream.size / (k + 1)
    got.foreach { case (item, c) =>
      val truth = exact(item)
      assert(c <= truth, s"$item: counter $c exceeds true count $truth")
      assert(c >= truth - slack, s"$item: counter $c below $truth - $slack")
    }
  }

  test("sketch never exceeds k entries") {
    assert(sketchOf(7, 10).size <= 10)
  }
}
