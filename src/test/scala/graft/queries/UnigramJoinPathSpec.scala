package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** q62's scale contract: the tf-table join degrades from broadcast to
  * shuffle when the vocabulary outgrows the threshold — and both paths
  * produce identical results. The shuffle path is forced the way a
  * too-big runtime table would: autoBroadcastJoinThreshold = -1. */
class UnigramJoinPathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.isolated() // mutates session confs
  private val sfDir = "/root/testdata/sf0.001"

  test("q62 is row-identical on the broadcast and the forced-shuffle path") {
    val s = spark
    val viaDefault = TextOps.q62(s, sfDir).collect().toSeq
    assert(viaDefault.nonEmpty)

    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = s.conf.get(key)
    val viaShuffle =
      try {
        s.conf.set(key, "-1")
        val df = TextOps.q62(s, sfDir)
        val rows = df.collect().toSeq
        // the fallback must actually BE the shuffle path
        val joins = df.queryExecution.executedPlan.toString()
        assert(!joins.contains("BroadcastHashJoin"),
          s"threshold -1 must force the shuffle join:\n${joins.take(1500)}")
        rows
      } finally s.conf.set(key, saved)

    assert(viaShuffle === viaDefault,
      "broadcast and shuffle join paths must be row-identical")
  }
}
