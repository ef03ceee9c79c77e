package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable

/** RENAME/DROP COLUMN through the SQL surface: ALTER TABLE DDL, reads
  * by name and by format under the logical names, manifest file
  * skipping with pushed filters TRANSLATED to the frozen physical
  * names, SQL writes through the mapping, and the refuse-loud edges
  * (row-level rewrites, streaming). The Scala-API laws live in
  * [[graft.sinks.TxnRenameSpec]]; this spec pins the DSv2 plumbing. */
class RenameDsv2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cat = "graft_cat_ren"
  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_cat_rename").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    w
  }

  /** Planned parquet scan + its files, reaching through the mapped
    * wrapper when present. */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): (ParquetScan, Seq[String]) = {
    val raw = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    val scan = raw match {
      case w: GraftStreamCapableScan => w.delegate.asInstanceOf[ParquetScan]
      case p: ParquetScan => p
    }
    val files = scan.toBatch.planInputPartitions().toSeq.collect {
      case fp: FilePartition => fp.files.map(_.urlEncodedPath).toSeq
    }.flatten.distinct
    (scan, files)
  }

  private def seed(name: String): String = {
    val root = s"$warehouse/db/$name"
    val s = spark; import s.implicits._
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    TxnTable.append(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1),
      statsCols = Seq("id"))
    TxnTable.append(spark, root,
      Seq((100L, 1000L), (101L, 1010L)).toDF("id", "v").coalesce(1))
    root
  }

  test("ALTER TABLE RENAME COLUMN: SQL reads the new name, old files by position") {
    seed("t_ren")
    spark.sql(s"ALTER TABLE $cat.db.t_ren RENAME COLUMN id TO doc_id")
    val got = spark.sql(s"SELECT doc_id, v FROM $cat.db.t_ren ORDER BY doc_id")
    assert(got.columns.toSeq === Seq("doc_id", "v"))
    assert(got.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 100L, 101L))
    // format-path read agrees
    val byPath = spark.read.format("graft-txn").load(s"$warehouse/db/t_ren")
    assert(byPath.columns.toSeq === Seq("doc_id", "v"))
    // time travel: the pre-rename version keeps its names
    assert(spark.sql(s"SELECT * FROM $cat.db.t_ren VERSION AS OF 2")
      .columns.toSeq === Seq("id", "v"))
  }

  test("pushed filters translate: manifest skipping fires on the renamed column") {
    val root = seed("t_prune")
    spark.sql(s"ALTER TABLE $cat.db.t_prune RENAME COLUMN id TO doc_id")
    val df = spark.sql(s"SELECT doc_id FROM $cat.db.t_prune WHERE doc_id >= 100")
    val (scan, files) = plannedFiles(df)
    val total = TxnTable.latest(spark, root).get.files.size
    assert(files.size === 1, s"expected 1 of $total files after range skip")
    // the filter pushed to parquet under the PHYSICAL name
    assert(scan.pushedFilters.map(_.toString).exists(_.contains("id")))
    // and the result is right
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(100L, 101L))
  }

  test("SQL INSERT, DELETE, and row-level UPDATE work through the mapping") {
    val root = seed("t_dml")
    spark.sql(s"ALTER TABLE $cat.db.t_dml RENAME COLUMN id TO k")
    spark.sql(s"INSERT INTO $cat.db.t_dml VALUES (7, 70)")
    assert(spark.sql(s"SELECT k FROM $cat.db.t_dml").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 7L, 100L, 101L))
    // the inserted file stores the frozen physical name
    val snap = TxnTable.latest(spark, root).get
    snap.files.foreach { f =>
      assert(spark.read.parquet(s"$root/$f").columns.toSeq.contains("id")) }
    // DELETE pushes the translated predicate + derives bounds
    spark.sql(s"DELETE FROM $cat.db.t_dml WHERE k >= 100")
    assert(spark.sql(s"SELECT k FROM $cat.db.t_dml").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 7L))
    // group-based row-level rewrite: the scan reads physical names, the
    // replacement files are written under them, the carry set is pruned
    // by the runtime group filter on the translated stats column
    val before = TxnTable.latest(spark, root).get
    spark.sql(s"UPDATE $cat.db.t_dml SET v = 0 WHERE k = 1")
    val after = TxnTable.latest(spark, root).get
    assert(spark.sql(s"SELECT k, v FROM $cat.db.t_dml ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 0L), (2L, 20L), (7L, 70L)))
    // rewritten files carry the physical name too
    after.files.foreach { f =>
      assert(spark.read.parquet(s"$root/$f").columns.toSeq.contains("id")) }
    // and at least one pre-update file was carried by reference when the
    // group filter pruned (k=1 lives in one clustered file)
    assert(after.files.exists(before.files.toSet), "expected a carried file")
  }

  test("ALTER TABLE DROP COLUMN hides it from SQL; re-ADD reads null") {
    seed("t_drop")
    spark.sql(s"ALTER TABLE $cat.db.t_drop DROP COLUMN v")
    assert(spark.sql(s"SELECT * FROM $cat.db.t_drop").columns.toSeq === Seq("id"))
    spark.sql(s"ALTER TABLE $cat.db.t_drop ADD COLUMNS (v BIGINT)")
    val got = spark.sql(s"SELECT * FROM $cat.db.t_drop WHERE id = 1").collect()
    assert(got.length === 1 && got.head.isNullAt(1)) // never the old bytes
  }

  test("writeStream.toTable appends into a renamed table under the frozen physical names") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = s"$warehouse/db/t_sink"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(
      s"""CREATE TABLE $cat.db.t_sink (id BIGINT, v BIGINT)
         |PARTITIONED BY (bucket(4, id))
         |TBLPROPERTIES ('statsCols' = 'id')""".stripMargin)
    TxnTable.append(spark, root, Seq((1L, 10L)).toDF("id", "v").coalesce(1))
    spark.sql(s"ALTER TABLE $cat.db.t_sink RENAME COLUMN id TO k")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = in.toDS().toDF("k").withColumn("v", col("k") * 10)
      .writeStream.option("checkpointLocation", s"$root-ckpt")
      .toTable(s"$cat.db.t_sink")
    try { in.addData(2L, 3L); q.processAllAvailable() } finally q.stop()
    assert(spark.sql(s"SELECT k FROM $cat.db.t_sink").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    val snap = TxnTable.latest(spark, root).get
    // streamed files carry the PHYSICAL name, the fan-out, and stats
    assert(snap.files.forall(_.contains("bucket4_id=")))
    snap.files.foreach { f =>
      assert(spark.read.parquet(s"$root/$f").columns.toSeq.contains("id")) }
    assert(snap.files.forall(f => snap.stats.get(f).exists(_.contains("id"))))
  }

  test("DESCRIBE surfaces logical metadata columns") {
    seed("t_desc")
    spark.sql(s"ALTER TABLE $cat.db.t_desc RENAME COLUMN id TO doc_id")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.t_desc")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("statsCols").exists(_.contains("doc_id")), props.toString)
  }

  test("streams flow through renames: subscribed names survive a mid-stream rename") {
    val root = seed("t_stream")
    val s = spark; import s.implicits._
    spark.sql(s"ALTER TABLE $cat.db.t_stream RENAME COLUMN id TO doc_id")
    // path-based v1 source over the already-renamed table
    val q = spark.readStream.format("graft-txn")
      .option("startVersion", "0").load(root)
      .writeStream.format("memory").queryName("ren_stream")
      .option("checkpointLocation", s"$root-ckpt").start()
    try {
      q.processAllAvailable()
      val seen = spark.table("ren_stream")
      assert(seen.columns.toSeq === Seq("doc_id", "v"))
      assert(seen.select("doc_id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L, 100L, 101L))
      // mid-stream rename + append under the NEWEST name: the frozen
      // physical identity keeps the subscriber's pinned names flowing
      spark.sql(s"ALTER TABLE $cat.db.t_stream RENAME COLUMN doc_id TO d2")
      spark.sql(s"INSERT INTO $cat.db.t_stream VALUES (7, 70)")
      q.processAllAvailable()
      assert(spark.table("ren_stream").select("doc_id").as[Long]
        .collect().sorted.toSeq === Seq(1L, 2L, 7L, 100L, 101L))
    } finally q.stop()
    // by-name DSv2 micro-batch stream over the mapped table
    val q2 = spark.readStream.option("startVersion", "0")
      .table(s"$cat.db.t_stream")
      .writeStream.format("memory").queryName("ren_stream2")
      .option("checkpointLocation", s"$root-ckpt2").start()
    try {
      q2.processAllAvailable()
      val seen2 = spark.table("ren_stream2")
      assert(seen2.columns.toSeq === Seq("d2", "v"))
      assert(seen2.select("d2").as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L, 7L, 100L, 101L))
    } finally q2.stop()
  }
}
