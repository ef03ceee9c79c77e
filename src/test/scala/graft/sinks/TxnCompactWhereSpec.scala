package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PARTIAL compaction ([[TxnTable.compactWhere]]) — maintenance
  * proportional to the ill-maintained region: only the files a
  * stats-range / size criterion selects are rewritten, everything else
  * carries BY PATH IDENTITY with its recorded metadata; content is
  * bit-identical before/after; live MoR deletes are allowed (the
  * rewritten region sheds its dead rows physically, the delete files
  * stay for the carried region); the column mapping translates the
  * range criterion. */
class TxnCompactWhereSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshRoot(): String =
    Files.createTempDirectory("txn_compact_where").toString + "/tbl"

  private def df(ids: Long*) = {
    val s = spark
    import s.implicits._
    ids.toDF("id").withColumn("v", col("id") * 10).repartition(1)
  }

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] = {
    val s = spark
    import s.implicits._
    d.select("id").as[Long].collect().toSet
  }

  test("range-scoped: only overlapping files rewrite, the rest carry by identity") {
    val root = freshRoot()
    TxnTable.append(spark, root, df(1, 2, 3), statsCols = Seq("id"))
    TxnTable.append(spark, root, df(100, 101), statsCols = Seq("id"))
    TxnTable.append(spark, root, df(200, 205))
    val before = TxnTable.latest(spark, root).get
    val lowFile = before.files.find(f =>
      before.stats(f)("id") == (1L, 3L)).get
    val out = TxnTable.compactWhere(spark, root, targetFiles = 1,
      bounds = Seq(("id", 100L, 300L)))
    assert(out.version === before.version + 1 && out.op === "compact")
    // the out-of-range file is THE SAME file (path identity), with its
    // stats/counts carried; the two in-range files merged into one
    assert(out.files.contains(lowFile))
    assert(out.stats(lowFile) === before.stats(lowFile))
    assert(out.rowCounts.get(lowFile) === before.rowCounts.get(lowFile))
    assert(out.files.size === 2)
    // content unchanged, pruning still fires
    assert(ids(TxnTable.read(spark, root)) ===
      Set(1L, 2L, 3L, 100L, 101L, 200L, 205L))
    assert(ids(TxnTable.readPruned(spark, root, "id", 1L, 3L)) ===
      Set(1L, 2L, 3L))
  }

  test("absent stats never exempt a file from maintenance") {
    val root = freshRoot()
    // second file has NO recorded range for id (stats recorded from the
    // statsCols set at its commit; none was set on this append path)
    TxnTable.append(spark, root, df(1, 2), statsCols = Seq("id"))
    val noStats = freshRoot() // separate table with a stat-less file
    TxnTable.append(spark, noStats, df(500))
    TxnTable.append(spark, noStats, df(600))
    val before = TxnTable.latest(spark, noStats).get
    assert(before.stats.values.forall(_.isEmpty) || before.stats.isEmpty)
    // every file lacks an id range -> all selected, merged to one
    val out = TxnTable.compactWhere(spark, noStats, targetFiles = 1,
      bounds = Seq(("id", 0L, 1L)))
    assert(out.files.size === 1)
    assert(ids(TxnTable.read(spark, noStats)) === Set(500L, 600L))
  }

  test("size-scoped binpack: small files merge, the big file carries") {
    val root = freshRoot()
    TxnTable.append(spark, root, df(1000L to 1999L: _*),
      statsCols = Seq("id")) // the big file
    TxnTable.append(spark, root, df(1))
    TxnTable.append(spark, root, df(2))
    TxnTable.append(spark, root, df(3))
    val before = TxnTable.latest(spark, root).get
    val base = root.stripSuffix("/")
    val fsys = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = before.files.map(f => f ->
      fsys.getFileStatus(new org.apache.hadoop.fs.Path(s"$base/$f")).getLen)
    val bigFile = sizes.maxBy(_._2)._1
    val threshold = sizes.map(_._2).max // strictly-under keeps the big one
    val out = TxnTable.compactWhere(spark, root, targetFiles = 1,
      smallerThanBytes = Some(threshold))
    assert(out.files.contains(bigFile))
    assert(out.files.size === 2)
    assert(ids(TxnTable.read(spark, root)) ===
      (1000L to 1999L).toSet ++ Set(1L, 2L, 3L))
  }

  test("live MoR deletes: rewritten region sheds dead rows, carried region stays masked") {
    val root = freshRoot()
    val s = spark; import s.implicits._
    TxnTable.append(spark, root, df(1, 2, 3), statsCols = Seq("id"))
    TxnTable.append(spark, root, df(100, 101))
    TxnTable.append(spark, root, df(102))
    // delete one key from each region
    TxnTable.deleteKeysMor(spark, root, "id", Seq(2L, 101L).toDF("id"))
    val out = TxnTable.compactWhere(spark, root, targetFiles = 1,
      bounds = Seq(("id", 100L, 300L)))
    // delete files STAY (the carried low file still needs masking)
    assert(out.deletes.nonEmpty)
    assert(ids(TxnTable.read(spark, root)) === Set(1L, 3L, 100L, 102L))
    // the rewritten file physically shed its dead row
    val rewritten = out.files.filterNot(
      TxnTable.snapshot(spark, root, out.version - 1).files.toSet)
    val base = root.stripSuffix("/")
    assert(ids(spark.read.parquet(rewritten.map(f => s"$base/$f"): _*)) ===
      Set(100L, 102L))
    // folding afterwards still converges
    TxnTable.compactDeletes(spark, root)
    assert(ids(TxnTable.read(spark, root)) === Set(1L, 3L, 100L, 102L))
  }

  test("no-op selections return the head uncommitted; criterion-less refuses") {
    val root = freshRoot()
    TxnTable.append(spark, root, df(1, 2), statsCols = Seq("id"))
    val before = TxnTable.latest(spark, root).get
    // nothing overlaps -> no commit
    val same = TxnTable.compactWhere(spark, root, 1,
      bounds = Seq(("id", 1000L, 2000L)))
    assert(same.version === before.version)
    // one file, no reclustering -> no commit
    val one = TxnTable.compactWhere(spark, root, 1,
      bounds = Seq(("id", 1L, 2L)))
    assert(one.version === before.version)
    intercept[IllegalArgumentException] {
      TxnTable.compactWhere(spark, root, 1)
    }
  }

  test("column mapping: the range criterion addresses the renamed name") {
    val root = freshRoot()
    TxnTable.append(spark, root, df(1, 2), statsCols = Seq("id"))
    TxnTable.append(spark, root, df(100, 101))
    TxnTable.append(spark, root, df(102, 103))
    TxnTable.alterTable(spark, root, renames = Seq("id" -> "k"))
    val before = TxnTable.latest(spark, root).get
    val lowFile = before.files.find(f =>
      before.stats(f)("id") == (1L, 2L)).get
    val out = TxnTable.compactWhere(spark, root, targetFiles = 1,
      bounds = Seq(("k", 100L, 200L)), sortCols = Seq("k"))
    assert(out.files.contains(lowFile) && out.files.size === 2)
    // rewritten file stores the frozen PHYSICAL name with fresh stats
    val rewritten = (out.files.toSet -- before.files).head
    assert(out.stats(rewritten)("id") === (100L, 103L))
    assert(ids(TxnTable.read(spark, root).withColumnRenamed("k", "id")) ===
      Set(1L, 2L, 100L, 101L, 102L, 103L))
  }

  test("z-order strategy: the rewritten region prunes on both dims") {
    val root = freshRoot()
    val s = spark
    import s.implicits._
    // 16x16 grid in one ill-clustered region + one out-of-range file
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L }
      yield (x, y)).toDF("x", "y").orderBy(rand(7)).repartition(4)
    TxnTable.append(spark, root, grid, statsCols = Seq("x"))
    TxnTable.append(spark, root,
      Seq((100L, 100L)).toDF("x", "y").repartition(1))
    val before = TxnTable.latest(spark, root).get
    val farFile = before.files.find(f =>
      before.stats.get(f).exists(_.get("x").contains((100L, 100L)))).get
    val out = TxnTable.compactWhere(spark, root, targetFiles = 4,
      bounds = Seq(("x", 0L, 50L)), zorderDims = Seq("x", "y"))
    assert(out.files.contains(farFile))
    // both dims recorded on the rewritten files; y-only predicates prune
    assert(out.statsCols.contains("x") && out.statsCols.contains("y"))
    val rewritten = out.files.filterNot(before.files.toSet)
    assert(rewritten.size === 4)
    val yPruned = rewritten.count(f =>
      out.stats(f).get("y").exists { case (lo, hi) => hi < 8L || lo > 7L })
    assert(yPruned >= 2, s"z-order should bound y per file: " +
      rewritten.map(f => out.stats(f).get("y")).mkString(", "))
    // content unchanged
    assert(TxnTable.read(spark, root).count() === 257L)
    // exclusive strategies refuse
    intercept[IllegalArgumentException] {
      TxnTable.compactWhere(spark, root, 1, bounds = Seq(("x", 0L, 1L)),
        sortCols = Seq("x"), zorderDims = Seq("x", "y"))
    }
  }

  test("SQL procedure face: CALL compact_where") {
    val s = spark
    val wh = Files.createTempDirectory("graft_cw_cat").toString
    s.conf.set("spark.sql.catalog.cw_cat",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.cw_cat.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS cw_cat.db")
    val root = s"$wh/db/t"
    TxnTable.append(spark, root, df(1, 2), statsCols = Seq("id"))
    TxnTable.append(spark, root, df(100, 101))
    TxnTable.append(spark, root, df(102, 103))
    val got = s.sql("CALL cw_cat.system.compact_where('db.t', 1, " +
      "col => 'id', lo => 100, hi => 200, sort_cols => 'id')").collect()
    assert(got.head.getLong(0) === 4L) // (version, n_files)
    assert(got.head.getInt(1) === 2)
    assert(ids(TxnTable.read(spark, root)) ===
      Set(1L, 2L, 100L, 101L, 102L, 103L))
    // partial args refuse
    val e = intercept[Exception] {
      s.sql("CALL cw_cat.system.compact_where('db.t', 1, col => 'id')")
        .collect()
    }
    assert(e.getMessage.contains("together"))
  }
}
