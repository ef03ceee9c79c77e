package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sinks.TxnTable

/** SQL ALTER TABLE over the txn format — the DDL face of the write-path
  * evolution rules: trailing nullable ADD COLUMNS, lossless type
  * widening, statsCols/bloomCols property updates; everything else
  * refuses loud. */
class AlterTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cat = "graft_cat_alter"
  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_alter").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    w
  }

  test("ADD COLUMNS: old files read null, appends carry the column, metadata-only commit") {
    val s = spark; import s.implicits._
    val root = s"$warehouse/db/add_t"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    TxnTable.append(spark, root, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"),
      statsCols = Seq("id"))
    val before = TxnTable.latest(spark, root).get

    spark.sql(s"ALTER TABLE $cat.db.add_t ADD COLUMNS (note STRING)")
    val after = TxnTable.latest(spark, root).get
    assert(after.op === "alter")
    assert(after.files === before.files)           // metadata-only: zero data writes
    assert(after.statsCols === Seq("id"))          // inherited
    assert(after.schema.get.fieldNames.toSeq === Seq("id", "v", "note"))

    // old rows read the new column as null — through SQL, DSv2, and the API
    val rows = spark.sql(s"SELECT id, note FROM $cat.db.add_t").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows === Set((1L, None), (2L, None)))

    // an append carries the column; mixed-vintage reads are coherent
    spark.sql(s"INSERT INTO $cat.db.add_t VALUES (3, 30, 'x')")
    val mixed = TxnTable.read(spark, root).select("id", "note").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(mixed === Set((1L, None), (2L, None), (3L, Some("x"))))
  }

  test("ALTER COLUMN TYPE widens losslessly; old int32 files read as long") {
    val s = spark; import s.implicits._
    val root = s"$warehouse/db/widen_t"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    TxnTable.append(spark, root,
      Seq(1, 2).toDF("id").withColumn("v", col("id") * 10)) // id, v: INT
    spark.sql(s"ALTER TABLE $cat.db.widen_t ALTER COLUMN v TYPE BIGINT")
    val after = TxnTable.latest(spark, root).get
    assert(after.schema.get("v").dataType ===
      org.apache.spark.sql.types.LongType)
    // old INT32 pages upcast under the widened read schema
    val got = spark.sql(s"SELECT id, v FROM $cat.db.widen_t").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === Set((1, 10L), (2, 20L)))
    // narrowing refuses
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.db.widen_t ALTER COLUMN v TYPE INT"))
    assert(e.getMessage.contains("widen") || e.getMessage.contains("lossless"))
  }

  test("SET TBLPROPERTIES statsCols: future appends record stats; old files never skip") {
    val s = spark; import s.implicits._
    val root = s"$warehouse/db/props_t"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    TxnTable.append(spark, root,
      Seq(1L, 2L).toDF("id").coalesce(1))          // no stats recorded
    spark.sql(s"ALTER TABLE $cat.db.props_t SET TBLPROPERTIES ('statsCols' = 'id')")
    assert(TxnTable.latest(spark, root).get.statsCols === Seq("id"))
    spark.sql(s"INSERT INTO $cat.db.props_t VALUES (100), (101)")
    val snap = TxnTable.latest(spark, root).get
    // the new file has a recorded range; the pre-alter file has none
    val withStats = snap.files.filter(f => snap.stats.get(f).exists(_.contains("id")))
    assert(withStats.nonEmpty && withStats.size < snap.files.size)
    // pruned read stays EXACT: absent metadata never skips, so the
    // stat-less pre-alter file is kept (the caller's residual filter
    // then gives the exact answer, the coarse-index contract)
    assert(TxnTable.readPruned(spark, root, "id", 100L, 200L)
      .filter(col("id").between(100, 200))
      .select("id").as[Long].collect().sorted.toSeq === Seq(100L, 101L))
    assert(TxnTable.readPruned(spark, root, "id", 100L, 200L)
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 100L, 101L))
  }

  test("refusals: non-widening change, unknown property; rename/drop now map") {
    val s = spark; import s.implicits._
    val root = s"$warehouse/db/refuse_t"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    TxnTable.append(spark, root, Seq((1L, "a")).toDF("id", "name"))
    def refuses(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      // either our catalog refuses (graft-txn message) or Spark's own
      // analyzer already does (canUpCast check on ALTER COLUMN TYPE) —
      // both are loud statement-level failures
      assert(e.getMessage.contains("graft-txn ALTER TABLE") ||
        e.getMessage.contains("widen") || e.getMessage.contains("lossless") ||
        e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
        s"unexpected message for [$sql]: ${e.getMessage}")
    }
    refuses(s"ALTER TABLE $cat.db.refuse_t ALTER COLUMN name TYPE INT")
    refuses(s"ALTER TABLE $cat.db.refuse_t SET TBLPROPERTIES ('retention' = 'x')")
    // table unchanged by the refused statements
    assert(TxnTable.latest(spark, root).get.op !== "alter")
    // RENAME/DROP are no longer refusals: the column mapping makes them
    // metadata-only (laws in TxnRenameSpec / RenameDsv2Spec)
    spark.sql(s"ALTER TABLE $cat.db.refuse_t RENAME COLUMN name TO label")
    spark.sql(s"ALTER TABLE $cat.db.refuse_t DROP COLUMN label")
    assert(spark.sql(s"SELECT * FROM $cat.db.refuse_t").columns.toSeq === Seq("id"))
  }

  test("alterTable API: concurrent-append retry keeps both effects") {
    val s = spark; import s.implicits._
    val root = s"$warehouse/db/api_t"
    TxnTable.append(spark, root, Seq(1L).toDF("id"))
    val target = TxnTable.latest(spark, root).get.schema.get
      .add("extra", org.apache.spark.sql.types.LongType, nullable = true)
    TxnTable.alterTable(spark, root, newSchema = Some(target))
    // a later append under the OLD shape still evolves cleanly (the
    // write path unions by name against the recorded schema)
    TxnTable.append(spark, root, Seq(2L).toDF("id"))
    val read = TxnTable.read(spark, root)
    assert(read.schema.fieldNames.toSeq === Seq("id", "extra"))
    assert(read.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }
}
