package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable

/** SIDECAR-mode tombstone resolution ([[GraftSidecarPartition]]): past
  * `spark.graft.posDeletes.driverResolveMaxEntries` the driver
  * materializes NO positions — tombstoned files' partitions carry the
  * delete sidecars whose footer `_file` bounds cover them, and each
  * TASK resolves its own file's ordinals. Contract under test: the two
  * modes are result-identical on every read surface (columnar batch
  * read, metadata-column row regime, the SQL UPDATE rewrite scan),
  * footer-bound pruning routes each file to its own sidecar, and a
  * bound-ambiguous sidecar (one file referencing several data files)
  * still masks exactly. The old tombstone-scale refuse-loud driver cap
  * is gone — this is what replaces it. */
class GraftPosSidecarSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cat = "graft_psc_cat"
  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_possc").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    w
  }

  /** Run `body` with the driver-resolution threshold forced to 0 —
    * every pos-delete-live scan inside takes the sidecar mode. */
  private def sidecarMode[A](body: => A): A = {
    spark.conf.set(GraftSidecars.DriverResolveMaxKey, "0")
    try body
    finally spark.conf.unset(GraftSidecars.DriverResolveMaxKey)
  }

  /** id-clustered 4-file MoR table, ids 1..200, v = id*10, s nullable
    * string — the GraftPosColumnarSpec fixture shape. */
  private def morTable(name: String): String = {
    val root = s"$warehouse/db/$name"
    TxnTable.overwrite(spark, root,
      spark.range(1, 201).toDF("id")
        .withColumn("v", col("id") * 10L)
        .withColumn("s", when(col("id") % 7 === 0, lit(null))
          .otherwise(concat(lit("doc-"), col("id"))))
        .repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    spark.sql(s"ALTER TABLE $cat.db.$name " +
      s"SET TBLPROPERTIES ('${TxnTable.RowLevelModeKey}' = 'merge-on-read')")
    root
  }

  private def posScan(df: org.apache.spark.sql.DataFrame): GraftPosScan =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head.asInstanceOf[GraftPosScan]

  test("columnar regime: sidecar mode plans GraftSidecarPartitions " +
      "pruned to their own sidecar and reads value-identically to " +
      "the exact mode") {
    val root = morTable("sc1")
    spark.sql(s"DELETE FROM $cat.db.sc1 WHERE id IN (7, 8)")
    spark.sql(s"DELETE FROM $cat.db.sc1 WHERE id = 120")
    val snap = TxnTable.latest(spark, root).get
    assert(snap.deletes.size === 2 && snap.files.size === 4)

    val exact = spark.sql(s"SELECT id, v, s FROM $cat.db.sc1")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    val expect = (1L to 200L).filterNot(i => i == 7 || i == 8 || i == 120)
      .map(i => (i, i * 10, if (i % 7 == 0) None else Some(s"doc-$i"))).toSet
    assert(exact === expect)

    sidecarMode {
      val df = spark.sql(s"SELECT id, v, s FROM $cat.db.sc1")
      val scan = posScan(df)
      val parts = scan.planInputPartitions().toSeq
      val side = parts.collect { case p: GraftSidecarPartition => p }
      assert(parts.collect { case p: GraftMaskedPartition => p }.isEmpty)
      // ids 7,8 co-locate in file 1; id 120 in file 3 — two masked files
      assert(side.size === 2)
      // the delta writer stages one sidecar per rewrite-scan partition
      // (one file each), so footer bounds pin each masked file to
      // exactly ITS sidecar — never the whole delete set
      side.foreach(p => assert(p.sidecars.length === 1))
      assert(side.map(_.sidecars.head.files.head.urlEncodedPath).distinct
        .size === 2)
      // clean files still ride plain columnar partitions
      assert(parts.collect { case f: FilePartition => f }
        .map(_.files.length).sum === 2)
      val factory = scan.createReaderFactory()
      assert(factory.isInstanceOf[GraftMaskedColumnarFactory])
      assert(factory.supportColumnarReads(side.head))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
      assert(got === exact)
    }
  }

  test("metadata-column row regime under sidecar mode: survivors keep " +
      "their exact file ordinals") {
    val root = morTable("sc2")
    spark.sql(s"DELETE FROM $cat.db.sc2 WHERE id IN (3, 5)")
    val exact = spark.sql(s"SELECT id, _file, _pos FROM $cat.db.sc2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    sidecarMode {
      val df = spark.sql(s"SELECT id, _file, _pos FROM $cat.db.sc2")
      val scan = posScan(df)
      val parts = scan.planInputPartitions().toSeq
      assert(parts.count(_.isInstanceOf[GraftSidecarPartition]) === 1)
      assert(parts.size === TxnTable.latest(spark, root).get.files.size)
      val got = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === exact)
      val byId = got.map(t => t._1 -> t._3).toMap
      assert(!byId.contains(3L) && !byId.contains(5L))
      assert(byId(4L) === byId(2L) + 2) // 3 skipped, never renumbered
    }
  }

  test("a bound-ambiguous sidecar (one delete file spanning two data " +
      "files) masks both exactly via the distinct-file fallback") {
    val root = morTable("sc3")
    val snap0 = TxnTable.latest(spark, root).get
    // first row (lowest id) of the first and last data files, by id order
    val byFile = spark.read.parquet(snap0.files.map(f => s"$root/$f"): _*)
      .withColumn("_f", regexp_extract(col("_metadata.file_path"),
        "^.*/(data/.*)$", 1))
      .groupBy("_f").agg(min("id").as("lo"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._2)
    val (fA, loA) = byFile.head
    val (fB, loB) = byFile.last
    // hand-stage ONE sidecar referencing BOTH files at ordinal 0 — the
    // shape a future sidecar compaction would produce
    val tmp = Files.createTempDirectory("graft_amb").toString
    spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(fA, 0L), org.apache.spark.sql.Row(fB, 0L)),
      GraftMetaCols.posDeleteSchema)
      .repartition(1).write.mode("overwrite").parquet(tmp)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(tmp))
      .filter(st => st.getPath.getName.startsWith("part-")).head.getPath
    val rel = "data/manual/del-span.parquet"
    fs.mkdirs(new Path(s"$root/data/manual"))
    assert(fs.rename(part, new Path(s"$root/$rel")))
    TxnTable.commitDelta(spark, root, snap0.version, Nil, Seq(rel),
      "delete-mor")

    val expect = (1L to 200L).filterNot(i => i == loA || i == loB).toSet
    assert(spark.sql(s"SELECT id FROM $cat.db.sc3").collect()
      .map(_.getLong(0)).toSet === expect)
    sidecarMode {
      val df = spark.sql(s"SELECT id FROM $cat.db.sc3")
      val side = posScan(df).planInputPartitions().toSeq
        .collect { case p: GraftSidecarPartition => p }
      assert(side.size === 2) // the one spanning sidecar covers both
      side.foreach(p => assert(p.sidecars.length === 1))
      assert(df.collect().map(_.getLong(0)).toSet === expect)
    }
  }

  test("the SQL UPDATE rewrite scan works in sidecar mode (a second " +
      "row-level op on a tombstone-heavy table needs no driver map)") {
    val root = morTable("sc4")
    spark.sql(s"DELETE FROM $cat.db.sc4 WHERE id % 10 = 0")
    sidecarMode {
      spark.sql(s"UPDATE $cat.db.sc4 SET v = -1 WHERE id IN (7, 113)")
    }
    val got = spark.sql(s"SELECT id, v FROM $cat.db.sc4")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 180)
    assert(got(7L) === -1L && got(113L) === -1L)
    assert(got(9L) === 90L && !got.contains(10L))
    assert(TxnTable.latest(spark, root).get.deletes.size >= 2)
  }
}
