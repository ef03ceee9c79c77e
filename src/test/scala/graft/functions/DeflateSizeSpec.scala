package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The compression-ratio signal's verification home (q113 is rows-only
  * at the driver gate): deterministic sizes, the repetitive ≪ prose ≪
  * random ordering that makes the signal useful, SQL registration, and
  * the within-corpus sanity of q113 itself. */
class DeflateSizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("deterministic across calls; pinned knobs give stable sizes") {
    val text = "the quick brown fox jumps over the lazy dog " * 20
    val a = DeflateSize.compressedSize(text.getBytes("UTF-8"))
    val b = DeflateSize.compressedSize(text.getBytes("UTF-8"))
    assert(a === b && a > 0)
    // a repeated phrase must compress far below its raw size
    assert(a < text.length / 5, s"compressed $a vs raw ${text.length}")
  }

  test("repetitive << prose << random — the ordering the signal relies on") {
    val n = 4096
    val repetitive = "abc " * (n / 4)
    val prose = ("the quality of training data determines model behaviour " +
      "more than architecture does and cleaning pipelines matter ") * 40
    val rnd = new scala.util.Random(42)
    val random = Array.fill(n)((rnd.nextInt(94) + 33).toChar).mkString
    def ratio(s: String): Double =
      DeflateSize.compressedSize(s.getBytes("UTF-8")).toDouble / s.length
    assert(ratio(repetitive) < ratio(prose),
      s"${ratio(repetitive)} !< ${ratio(prose)}")
    assert(ratio(prose) < ratio(random),
      s"${ratio(prose)} !< ${ratio(random)}")
    assert(ratio(random) > 0.8, s"random text should barely compress")
  }

  test("expression evaluates in a plan; NULL in, NULL out") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("aaaa" * 100), Some("z"), None).toDF("t")
      .select(DeflateSize.deflateSize($"t").as("n"))
    val rows = df.collect()
    assert(rows(0).getLong(0) > 0 && rows(0).getLong(0) < 50)
    assert(rows(1).getLong(0) > 0)
    assert(rows(2).isNullAt(0))
  }

  test("q113 over the corpus: ratios populated, ordered, in-range") {
    val s = spark
    val rows = graft.queries.TextOps.q113(s, "/root/testdata/sf0.001").collect()
    assert(rows.length === 50)
    val ratios = rows.map(_.getLong(2))
    assert(ratios.sameElements(ratios.sorted), "must be ascending")
    // synthetic docs are word-salad from a 31-word vocab: repetitive
    // enough to compress well below raw, but never to nothing
    assert(ratios.head > 0 && ratios.last < 1000000)
  }
}
