package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable

/** SQL UPDATE / MERGE INTO / subquery DELETE through the group-based
  * row-level-operation framework: copy-on-write at FILE granularity,
  * runtime group filtering on the primary stats column deciding the
  * rewrite set, untouched files carried by reference, refuse-loud
  * conflict and MoR boundaries. */
class GraftRowLevelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cat = "graft_rlw_test"
  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_rlw").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    w
  }

  /** Two stats-disjoint files: ids 1-100 and 101-200, v = id. */
  private def freshTable(name: String): String = {
    val root = s"$warehouse/db/$name"
    val s = spark; import s.implicits._
    TxnTable.append(spark, root,
      (1L to 100L).toDF("id").withColumn("v", col("id")).coalesce(1),
      statsCols = Seq("id"))
    TxnTable.append(spark, root,
      (101L to 200L).toDF("id").withColumn("v", col("id")).coalesce(1))
    root
  }

  private def rows(sql: String): Seq[(Long, Long)] = {
    val s = spark; import s.implicits._
    spark.sql(sql).as[(Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("SQL UPDATE rewrites only the files the group filter keeps") {
    val root = freshTable("u")
    val pre = TxnTable.latest(spark, root).get
    spark.sql(s"UPDATE $cat.db.u SET v = v + 1000 WHERE id = 5")
    assert(rows(s"SELECT id, v FROM $cat.db.u") ===
      (1L to 200L).map(i => (i, if (i == 5) i + 1000 else i)))
    val post = TxnTable.latest(spark, root).get
    assert(post.op === "update")
    // id=5 lives in the 1-100 file; the 101-200 file's recorded range is
    // disjoint from the runtime filter's value set, so it must carry BY
    // REFERENCE (same file name), while the matched file is replaced
    val hi = pre.files.find(f => pre.stats(f)("id")._1 === 101L).get
    val lo = pre.files.find(_ != hi).get
    assert(post.files.contains(hi))
    assert(!post.files.contains(lo))
    // stats machinery intact: the staged replacement recorded ranges
    assert(post.files.filterNot(_ == hi)
      .forall(f => post.stats.get(f).exists(_.contains("id"))))
    // snapshot isolation: pre-update version unchanged
    val s = spark; import s.implicits._
    assert(spark.sql(s"SELECT v FROM $cat.db.u VERSION AS OF ${pre.version} " +
      "WHERE id = 5").as[Long].head() === 5L)
  }

  test("runtime group filtering prunes on SECONDARY and STRING stats " +
      "columns too: the rewrite set is decided by whichever recorded " +
      "column the statement keys on") {
    val root = s"$warehouse/db/mc"
    val s = spark; import s.implicits._
    // two files disjoint in BOTH the secondary long column and the
    // string column; the PRIMARY stats column (id) deliberately does
    // not appear in the statements
    TxnTable.append(spark, root,
      (1L to 100L).toDF("id").withColumn("grp", lit(1L))
        .withColumn("lang", lit("de")).withColumn("v", col("id")).coalesce(1),
      statsCols = Seq("id", "grp", "lang"))
    TxnTable.append(spark, root,
      (101L to 200L).toDF("id").withColumn("grp", lit(2L))
        .withColumn("lang", lit("en")).withColumn("v", col("id")).coalesce(1))
    val pre = TxnTable.latest(spark, root).get
    val deFile = pre.files.find(f => pre.stats(f)("grp") === ((1L, 1L))).get
    val enFile = pre.files.find(_ != deFile).get

    // secondary LONG column keys the statement: only grp=2's file rewrites
    spark.sql(s"UPDATE $cat.db.mc SET v = v + 1000 WHERE grp = 2")
    val p1 = TxnTable.latest(spark, root).get
    assert(p1.files.contains(deFile) && !p1.files.contains(enFile))

    // STRING column keys the statement: only lang='de''s file rewrites
    // (prefix bounds + xxhash64 blooms decide the carve-out)
    val deCarried = p1.files.find(_ == deFile).get
    spark.sql(s"UPDATE $cat.db.mc SET v = v + 100000 WHERE lang = 'de'")
    val p2 = TxnTable.latest(spark, root).get
    assert(!p2.files.contains(deCarried),
      "the matching string-keyed file must be rewritten")
    assert(p1.files.filterNot(_ == deCarried).forall(p2.files.contains),
      "every string-disjoint file must carry by path identity")

    // content exact after both statements
    assert(rows(s"SELECT id, v FROM $cat.db.mc") === (1L to 200L).map(i =>
      (i, if (i <= 100) i + 100000 else i + 1000)))
  }

  test("SQL MERGE INTO upserts through the same rewrite") {
    val root = freshTable("m")
    val s = spark; import s.implicits._
    Seq((5L, 500L), (105L, 10500L), (300L, 30000L))
      .toDF("id", "v").createOrReplaceTempView("rlw_src")
    spark.sql(
      s"""MERGE INTO $cat.db.m t USING rlw_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val expect = (1L to 200L).map(i =>
      (i, if (i == 5) 500L else if (i == 105) 10500L else i)) :+ (300L, 30000L)
    assert(rows(s"SELECT id, v FROM $cat.db.m") === expect)
    assert(TxnTable.latest(spark, root).get.op === "merge")
  }

  test("DELETE with a subquery takes the group-based path; simple DELETE stays metadata-planned") {
    val root = freshTable("d")
    spark.sql(s"DELETE FROM $cat.db.d WHERE id IN " +
      s"(SELECT id FROM $cat.db.d WHERE v < 4)")
    assert(rows(s"SELECT id, v FROM $cat.db.d") ===
      (4L to 200L).map(i => (i, i)))
    assert(TxnTable.latest(spark, root).get.op === "delete")
    // simple translatable DELETE converts back to the SupportsDelete
    // fast path (no scan, no staged rewrite of the surviving rows'
    // files beyond the bounded CoW) — both paths produce op "delete";
    // correctness of the fast path is pinned in GraftCatalogSpec
    spark.sql(s"DELETE FROM $cat.db.d WHERE id > 150")
    assert(rows(s"SELECT id, v FROM $cat.db.d") ===
      (4L to 150L).map(i => (i, i)))
  }

  test("rewritten files keep the hidden-partitioning fan-out and its pruning") {
    val root = s"$warehouse/db/f" // touches the lazy catalog registration
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.f (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id)) TBLPROPERTIES ('statsCols' = 'id')")
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id FROM range(1, 51)")
    val pre = TxnTable.latest(spark, root).get
    assert(pre.files.forall(_.contains("bucket4_id=")))
    spark.sql(s"UPDATE $cat.db.f SET v = 0 WHERE id = 5")
    assert(rows(s"SELECT id, v FROM $cat.db.f") ===
      (1L to 50L).map(i => (i, if (i == 5) 0L else i)))
    val post = TxnTable.latest(spark, root).get
    // the manifest's bucket point math narrowed the rewrite to id=5's
    // bucket: every OTHER bucket's files carried by reference
    val b5 = {
      val s = spark; import s.implicits._
      spark.range(1).select(pmod(xxhash64(lit(5L)), lit(4L))).as[Long].head()
    }
    val otherBuckets = pre.files.filterNot(_.contains(s"bucket4_id=$b5"))
    assert(otherBuckets.nonEmpty && otherBuckets.forall(post.files.contains))
    // within bucket b5, only the file(s) whose id RANGE can hold 5 are
    // rewritten (range + bucket proofs compose); at least one must be
    val replaced = pre.files
      .filter(_.contains(s"bucket4_id=$b5")).filterNot(post.files.contains)
    assert(replaced.nonEmpty)
    assert(replaced.forall(f => { val (lo, hi) = pre.stats(f)("id"); lo <= 5 && 5 <= hi }))
    // the REPLACEMENT file landed in the same bucket dir with the
    // transform stats recorded — post-update pruning as good as append
    val staged = post.files.filterNot(pre.files.contains)
    assert(staged.nonEmpty && staged.forall(_.contains(s"bucket4_id=$b5")))
    assert(staged.forall(f => post.stats(f).get("bucket4_id")
      .contains((b5, b5))))
  }

  test("row-level ops refuse on MoR-live snapshots") {
    val root = freshTable("r")
    val s = spark; import s.implicits._
    TxnTable.deleteKeysMor(spark, root, "id", Seq(7L).toDF("id"))
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.db.r SET v = 0 WHERE id = 8")
    }
    assert(e.getMessage.contains("merge-on-read") ||
      Option(e.getCause).exists(_.getMessage.contains("merge-on-read")))
    // the API path still merges and the table recovers via compaction
    TxnTable.compactDeletes(spark, root)
    spark.sql(s"UPDATE $cat.db.r SET v = 0 WHERE id = 8")
    assert(rows(s"SELECT id, v FROM $cat.db.r")
      .find(_._1 == 8L).get._2 === 0L)
  }
}
