package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable

/** SCD-2 over the transactional log: each merge is one atomic commit,
  * pre-merge versions stay time-travelable, and a replayed merge
  * no-ops instead of double-closing versions. (The merge ALGEBRA —
  * changed/unchanged/untouched/insert arms — is pinned by ScdSpec and
  * the q64 oracle; this spec pins the commit semantics around it.) */
class TxnScdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("merge commits, travels, and replays idempotently") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("txn_scd").toString + "/dim"

    // v1: initial dimension — two open versions
    TxnTable.overwrite(spark, root, Seq(
      (1L, "A"), (2L, "B")).toDF("k", "seg")
      .select($"k", $"seg", to_date(lit("2024-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current")))

    // merge batch 0: key 1 changes A→X, key 3 is a pure insert
    val upd0 = Seq((1L, "X"), (3L, "C")).toDF("k", "v")
    assert(Scd.scd2MergeTxn(spark, root, upd0, "k", "seg",
      lit("2024-06-01"), batchId = 0L).isDefined)

    val cur = TxnTable.read(spark, root)
      .select($"k", $"seg", $"is_current").as[(Long, String, Boolean)]
      .collect().toSet
    assert(cur === Set((1L, "A", false), (1L, "X", true),
      (2L, "B", true), (3L, "C", true)))

    // snapshot isolation / time travel: v1 is the pre-merge dimension
    val v1 = TxnTable.readAsOf(spark, root, 1)
      .select($"k", $"seg", $"is_current").as[(Long, String, Boolean)]
      .collect().toSet
    assert(v1 === Set((1L, "A", true), (2L, "B", true)))

    // replayed merge (same batch id): no-op, no double-closed versions
    assert(Scd.scd2MergeTxn(spark, root, upd0, "k", "seg",
      lit("2024-06-01"), batchId = 0L).isEmpty)
    assert(TxnTable.versions(spark, root).size === 2)

    // next batch: key 1 changes again X→Y — history accumulates
    assert(Scd.scd2MergeTxn(spark, root, Seq((1L, "Y")).toDF("k", "v"),
      "k", "seg", lit("2024-09-01"), batchId = 1L).isDefined)
    val hist = TxnTable.read(spark, root)
      .filter($"k" === 1L)
      .select($"seg", $"is_current", $"valid_to".cast("string"))
      .as[(String, Boolean, String)].collect().toSet
    assert(hist === Set(("A", false, "2024-06-01"),
      ("X", false, "2024-09-01"), ("Y", true, null)))
  }
}
