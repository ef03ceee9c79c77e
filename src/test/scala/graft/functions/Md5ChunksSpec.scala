package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.Md5Chunks.md5Chunks

/** Md5Chunks must be bit-identical to the conv(substring(md5_hex))
  * composition it replaces — that identity is what lets the DuckDB
  * oracle SQL stay in the hex form. */
class Md5ChunksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("chunks equal conv(substring(md5_hex, 8h+1, 8), 16, 10) for h=0..3") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => s"shingle $i payload é中").toDF("t")
    val cols = (0 until 4).flatMap { h =>
      Seq(
        element_at(md5Chunks($"t"), h + 1).as(s"c$h"),
        conv(substring(md5($"t"), h * 8 + 1, 8), 16, 10).cast("long").as(s"e$h"))
    }
    val bad = df.select(cols: _*)
      .filter((0 until 4).map(h => col(s"c$h") =!= col(s"e$h")).reduce(_ || _))
      .count()
    assert(bad === 0)
  }

  test("matches a JVM-side digest, null in -> null out") {
    val s = spark
    import s.implicits._
    val d = MessageDigest.getInstance("MD5").digest("abc".getBytes("UTF-8"))
    val expected = (0 until 4).map(h =>
      ((d(4 * h) & 0xffL) << 24) | ((d(4 * h + 1) & 0xffL) << 16) |
        ((d(4 * h + 2) & 0xffL) << 8) | (d(4 * h + 3) & 0xffL))
    val got = Seq("abc").toDF("t").select(md5Chunks($"t")).head().getSeq[Long](0)
    assert(got === expected)
    val n = Seq(Option.empty[String]).toDF("t").select(md5Chunks($"t")).head()
    assert(n.isNullAt(0))
  }
}
