package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDupStream
import graft.streaming.NearDupStream.Doc

/** Incremental near-dedup at ingest: a duplicate arriving in a LATER
  * micro-batch must be flagged against the persisted signature store
  * (not just against its own batch), and in-batch duplicates flag with
  * the keep-min-id convention. */
class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("later-batch duplicate is flagged against the stored signatures") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val base = Files.createTempDirectory("neardup").toString
    val (store, flags, ckpt) = (s"$base/store", s"$base/flags", s"$base/ckpt")

    val input = MemoryStream[Doc]
    val query = NearDupStream.start(input.toDS(), store, flags, ckpt)
    try {
      // batch 0: two distinct docs -> no flags, signatures stored
      input.addData(
        Doc(1, "alpha beta gamma delta epsilon"),
        Doc(2, "one two three four five six"))
      query.processAllAvailable()
      // no flags yet -> the (empty) flag dataset was not even written
      assert(!new java.io.File(flags).exists())
      // 2 docs x 4 bands in the store
      assert(spark.read.parquet(store).count() === 8)

      // batch 1: doc 3 duplicates doc 1 (flag vs the STORE), doc 4 is
      // fresh, docs 5+6 duplicate each other IN-batch (keep-min-id)
      input.addData(
        Doc(3, "alpha beta gamma delta epsilon"),
        Doc(4, "seven eight nine ten eleven"),
        Doc(5, "red green blue cyan magenta"),
        Doc(6, "red green blue cyan magenta"))
      query.processAllAvailable()
      val flagged = spark.read.parquet(flags)
        .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
      assert(flagged === Set((3L, 1L), (6L, 5L)), s"got $flagged")
      assert(spark.read.parquet(store).count() === 24)
    } finally query.stop()
  }
}
