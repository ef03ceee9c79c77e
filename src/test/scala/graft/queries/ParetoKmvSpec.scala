package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics guards for q107/q108 beyond the oracle (which certifies
  * cross-engine equality, not that the REDUCTION itself is right):
  * q107's two-window skyline must equal the brute-force all-pairs
  * dominance filter, and q108's KMV estimates must be close to the
  * exact cardinalities they approximate. */
class ParetoKmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q107 frontier == brute-force dominance filter (incl. ties/dups)") {
    val s = spark
    import s.implicits._
    val got = TextOps.q107(s, sfDir)
      .select($"doc_id", $"len", $"qi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = graft.Tables.t(s, sfDir, "documents")
      .select($"doc_id", $"n_chars".as("len"),
        expr("size(array_distinct(split(text, ' '))) * CAST(1000000 AS BIGINT)" +
          " div size(split(text, ' '))").as("qi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (_, l, q) =>
      !pts.exists { case (_, l2, q2) =>
        l2 >= l && q2 >= q && (l2 > l || q2 > q)
      }
    }.map { case (id, l, q) => (id, l, q) }.toSet
    assert(got === brute)
  }

  test("q107 on a handcrafted grid: equal points both survive") {
    val s = spark
    import s.implicits._
    // (len, qi): (10,5) dominated by (10,7); (9,7) dominated by (10,7);
    // two copies of (10,7) both on the frontier; (12,3) frontier by len
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 7L), (3L, 10L, 7L),
      (4L, 9L, 7L), (5L, 12L, 3L)).toDF("doc_id", "len", "qi")
    val cand = pts.withColumn("m2", max($"qi").over(
      org.apache.spark.sql.expressions.Window.partitionBy($"len")))
      .filter($"qi" === $"m2")
    val wG = org.apache.spark.sql.expressions.Window.orderBy($"len".desc)
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = cand.withColumn("m1", max($"qi").over(wG))
      .filter($"m1".isNull || $"m1" < $"qi")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 3L, 5L))
  }

  test("q108 KMV union/intersection estimates track exact cardinalities") {
    val s = spark
    import s.implicits._
    val est = TextOps.q108(s, "/root/testdata/sf0.01")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // exact per-pair distinct-shingle cardinalities
    val sh = graft.Tables.t(s, "/root/testdata/sf0.01", "documents")
      .where(size(split($"text", " ")) >= 3)
      .select($"source",
        explode(array_distinct(LlmOps.shingles3(split($"text", " ")))).as("sh"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = sh.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var checked = 0
    for (((a, b), (jEst, uEst, iEst)) <- est) {
      val (sa, sb) = (bySrc(a), bySrc(b))
      val (u, i) = ((sa ++ sb).size.toDouble, (sa & sb).size.toDouble)
      // K=64 KMV: relative standard error ~ 1/sqrt(K-1) ≈ 0.126; allow 4σ
      assert(math.abs(uEst - u) / u < 0.5, s"union est $uEst vs exact $u ($a,$b)")
      assert(math.abs(jEst - i / u) < 0.35, s"jaccard est $jEst vs ${i / u} ($a,$b)")
      assert(math.abs(iEst - i) < 0.5 * u, s"inter est $iEst vs $i ($a,$b)")
      checked += 1
    }
    assert(checked === est.size && checked > 100)
  }

  test("q108 under-full merged sketch degrades to EXACT estimates") {
    val s = spark
    import s.implicits._
    // two tiny sources whose distinct shingles both fit in K=64: the
    // merged sketch IS the union, so j/union/inter must be exact
    val dir = java.nio.file.Files.createTempDirectory("kmv_small").toString
    Seq(
      (1L, "a b c d e", "en", "s1", 9L),   // shingles: abc bcd cde
      (2L, "a b c x y", "en", "s2", 9L),   // shingles: abc bcx cxy
      (3L, "a b c d y", "en", "s2", 9L)    // shingles: abc bcd cdy
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = TextOps.q108(s, dir).collect()
    assert(r.length === 1)
    val (j, u, i) = (r(0).getDouble(2), r(0).getDouble(3), r(0).getDouble(4))
    // s1 = {abc,bcd,cde}, s2 = {abc,bcx,cxy,bcd,cdy}: union 6, inter 2
    assert(u === 6.0, s"union_est $u")
    assert(j === 2.0 / 6.0, s"j_est $j")
    assert(i === (2.0 / 6.0) * 6.0, s"inter_est $i")
  }

  test("q106 zero-variance dimension yields z = 0, not NaN") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zvar").toString
    Seq(
      (0L, Seq(0.5f, 1.0f), 0),
      (1L, Seq(0.5f, 2.0f), 0),
      (2L, Seq(0.5f, 3.0f), 0) // dim 0 constant, dim 1 varies
    ).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val z = LlmOps.q106(s, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(z((0L, 0)) === 0.0 && z((1L, 0)) === 0.0 && z((2L, 0)) === 0.0)
    assert(!z.values.exists(_.isNaN))
    assert(z((2L, 1)) > 0.0) // the varying dim still standardizes
  }
}
