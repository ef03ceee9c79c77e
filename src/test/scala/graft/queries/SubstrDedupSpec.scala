package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics guards for q121 (exact substring dedup) beyond the oracle:
  * the oracle certifies cross-engine equality of the plan, these pin the
  * REDUCTION itself — first occurrence wins (across docs AND within a
  * doc), overlapping/adjacent duplicated windows merge into maximal
  * spans, short docs pass through — and check the whole query against a
  * brute-force single-machine reference on sf0.001. */
class SubstrDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val K = 8

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("substrdedup").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    TextOps.q121(s, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    }.toMap
  }

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("first occurrence kept; later doc loses the span; short docs pass") {
    val p = toks("p", K)
    val got = run(Seq(
      1L -> s"${toks("a", 4)} $p a5 a6",
      2L -> s"b1 b2 $p b3 b4 b5 b6",
      3L -> "c1 c2 c3"))
    assert(got(1L) === ((14L, 0L, 0L, s"${toks("a", 4)} $p a5 a6")))
    assert(got(2L) === ((14L, 1L, K.toLong, "b1 b2 b3 b4 b5 b6")))
    assert(got(3L) === ((3L, 0L, 0L, "c1 c2 c3")))
  }

  test("self-repetition within one doc: second copy removed, first kept") {
    val q = toks("q", K)
    val got = run(Seq(4L -> s"$q x1 $q"))
    assert(got(4L) === ((17L, 1L, K.toLong, s"$q x1")))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    val r = toks("r", K + 2) // 10-token shared run = 3 overlapping 8-grams
    val got = run(Seq(
      5L -> s"z1 z2 $r z3",
      6L -> s"w1 $r w2 w3"))
    assert(got(5L)._2 === 0L)
    assert(got(6L) === ((13L, 1L, (K + 2).toLong, "w1 w2 w3")))
  }

  test("adjacent duplicated spans merge (gap zero) and can cover a whole doc") {
    val p = toks("p", K)
    val q = toks("q", K)
    val got = run(Seq(
      1L -> s"${toks("a", 4)} $p a5 a6", // P's first occurrence
      4L -> s"$q x1 $q",                 // Q's first occurrence
      7L -> s"$p $q"))                   // both spans, adjacent
    assert(got(7L) === ((16L, 1L, 16L, "")))
  }

  test("q121 == brute-force reference on sf0.001") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.t(s, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // global first occurrence per gram text
    val first = scala.collection.mutable.Map[String, (Long, Int)]()
    for ((id, text) <- docs) {
      val t = text.split(" ")
      for (i <- 0 to t.length - K) {
        val g = t.slice(i, i + K).mkString(" ")
        if (!first.contains(g)) first(g) = (id, i)
      }
    }
    val expected = docs.map { case (id, text) =>
      val t = text.split(" ")
      val dupStarts = (0 to t.length - K)
        .filter(i => first(t.slice(i, i + K).mkString(" ")) != ((id, i)))
      // merge overlapping/adjacent [i, i+K-1] windows
      val spans = dupStarts.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, i) if i <= e0 + 1 => (s0, math.max(e0, i + K - 1)) :: rest
        case (acc, i)                             => (i, i + K - 1) :: acc
      }.reverse
      val covered = spans.flatMap { case (a, b) => a to b }.toSet
      val clean = t.zipWithIndex.collect { case (w, i) if !covered(i) => w }.mkString(" ")
      id -> ((t.length.toLong, spans.length.toLong, covered.size.toLong, clean))
    }.toMap
    val got = TextOps.q121(s, "/root/testdata/sf0.001").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    }.toMap
    assert(got === expected)
    // non-degenerate: the corpus actually contains duplicated spans
    assert(expected.values.map(_._3).sum > 0)
  }
}
