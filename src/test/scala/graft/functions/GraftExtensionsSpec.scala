package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The SparkSessionExtensions registration: a session built with
  * GraftExtensions can call the custom expressions from SQL. The extra
  * session shares the test SparkContext (never stopped here) and the
  * shared default session is restored afterwards. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("all custom expressions and aggregates are callable from SQL") {
    val base = SparkTestSession.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base) // really a new session, with the extensions applied
      assert(s.sql("SELECT long_array_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d")
        .head().getLong(0) === 32L)
      // md5_chunks == conv(substring(md5_hex)) — same identity the specs pin
      val r = s.sql(
        """SELECT md5_chunks('abc')[0] AS c0,
          |       CAST(conv(substring(md5('abc'), 1, 8), 16, 10) AS BIGINT) AS e0""".stripMargin)
        .head()
      assert(r.getLong(0) === r.getLong(1))
      assert(s.sql("SELECT shingles3(array('a','b','c','d')) AS sh")
        .head().getSeq[String](0) === Seq("a b c", "b c d"))
      assert(s.sql("""SELECT json_get_long('{"k": 7}', 'k') AS k""")
        .head().getLong(0) === 7L)
      assert(s.sql("SELECT count_in_set(array('a','b','a','x'), array('a','b')) AS n")
        .head().getLong(0) === 3L)
      // deflate_size: same pinned-knob compressor as the Scala API
      assert(s.sql("SELECT deflate_size('aaaaaaaaaaaaaaaaaaaa') AS n")
        .head().getLong(0) ===
        DeflateSize.compressedSize("a" * 20 getBytes "UTF-8"))
      // freq_sketch: single heavy item must be present with its count
      assert(s.sql(
        """SELECT filter(freq_sketch(x, 2), e -> e.item = 'a')[0].count_lb AS c
          |FROM VALUES ('a'),('a'),('a'),('b') AS t(x)""".stripMargin)
        .head().getLong(0) > 0L)
      // bloom_agg: the serialized filter must answer membership
      val bfBytes = s.sql(
        """SELECT bloom_agg(x, 100, 0.03) AS bf
          |FROM VALUES (1L),(2L),(3L) AS t(x)""".stripMargin)
        .head().getAs[Array[Byte]](0)
      val bf = BloomAgg.fromBytes(bfBytes)
      assert(bf.mightContainLong(2L))
      assert(!bf.mightContainLong(424242L) || bf.mightContainLong(2L))
      // non-literal field name must be rejected loudly
      val err = intercept[Exception](
        s.sql("SELECT json_get_long('{}', concat('k', ''))").collect())
      assert(err.getMessage.contains("literal field name"), err.getMessage)
      // the MV rewrite rule rides the same extensions (conf-gated): a
      // matching aggregate on this session substitutes the artifact
      val sfDir = "/root/testdata/sf0.001"
      graft.queries.Materialized.ensureMv(s, sfDir)
      s.conf.set("graft.mv.rewrite", "true")
      try {
        val plan = graft.PlanSig
          .initialPlan(graft.queries.Materialized.defining(s, sfDir))
          .collectWithSubqueries {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.relation.location.rootPaths.mkString(",")
          }
        assert(plan.nonEmpty && plan.forall(_.contains("graft_mv")),
          s"extension-injected MV rule must substitute the artifact: $plan")
      } finally s.conf.set("graft.mv.rewrite", "false")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
