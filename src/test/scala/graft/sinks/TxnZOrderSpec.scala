package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** OPTIMIZE ZORDER as a txn maintenance op (compactZOrderTxn): after
  * interleaved appends leave every file spanning the full range of both
  * dimensions, a z-order rewrite must make manifest pruning effective on
  * BOTH — strictly better on the second dimension than a single-key
  * clustering compaction — while preserving rows, history, and live MoR
  * deletes' fold-in semantics. */
class TxnZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshRoot(): String =
    Files.createTempDirectory("txn_zorder").toString + "/tbl"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** 32x32 grid appended in 4 interleaved slices — every slice (and so
    * every file) spans the full range of BOTH dims. */
  private def buildInterleaved(root: String): Unit = {
    val s = spark
    import s.implicits._
    val grid = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    (0 until 4).foreach { slice =>
      val part = grid.filter { case (a, b) => (a + b) % 4 == slice }
        .toDF("a", "b").withColumn("v", $"a" * 100 + $"b")
      TxnTable.append(spark, root, part.repartition(4),
        statsCols = Seq("a", "b"))
    }
  }

  test("z-order rewrite prunes on both dims; single-key sort only on one") {
    val root = freshRoot()
    buildInterleaved(root)
    val before = TxnTable.latest(spark, root).get
    val all = TxnTable.read(spark, root)
    // interleaved layout: no pruning possible on either dim
    assert(TxnTable.readPruned(spark, root, "a", 0L, 3L).inputFiles.length
      === before.files.size)
    assert(TxnTable.readPruned(spark, root, "b", 0L, 3L).inputFiles.length
      === before.files.size)

    val z = TxnTable.compactZOrderTxn(spark, root, targetFiles = 16, "a", "b")
    assert(z.files.size === 16)
    assert(rows(TxnTable.read(spark, root)) === rows(all))
    val keptA = TxnTable.readPruned(spark, root, "a", 0L, 3L).inputFiles.length
    val keptB = TxnTable.readPruned(spark, root, "b", 0L, 3L).inputFiles.length
    // a 4-wide stripe of a 32-wide dim over z-rectangles: at most half
    // the files can overlap it, on EITHER dimension
    assert(keptA <= 8, s"a-stripe kept $keptA of 16")
    assert(keptB <= 8, s"b-stripe kept $keptB of 16")
    // pruned reads stay correct
    assert(rows(TxnTable.readPruned(spark, root, "b", 0L, 3L).filter(col("b") <= 3)) ===
      rows(all.filter(col("b") <= 3)))
    // prior snapshot untouched by the rewrite
    assert(rows(TxnTable.readAsOf(spark, root, before.version)) === rows(all))

    // same data clustered by a single-key sort: b-pruning stays useless
    val root2 = freshRoot()
    buildInterleaved(root2)
    TxnTable.compactTxn(spark, root2, targetFiles = 16, sortCols = Seq("a"))
    val keptB1 = TxnTable.readPruned(spark, root2, "b", 0L, 3L).inputFiles.length
    assert(keptB < keptB1,
      s"z-order b-pruning ($keptB) must beat single-key sort ($keptB1)")
    // and the z-layout's a-pruning is still real (not traded away)
    assert(keptA <= TxnTable.readPruned(spark, root2, "a", 0L, 3L)
      .inputFiles.length * 2)
  }

  test("N-dim z-order: every one of three dims prunes after the rewrite") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    // 16x16x16 cube in 4 interleaved slices: every file spans all dims
    val cube = for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16)
      yield (a.toLong, b.toLong, c.toLong)
    (0 until 4).foreach { slice =>
      val part = cube.filter { case (a, b, c) => (a + b + c) % 4 == slice }
        .toDF("a", "b", "c")
      TxnTable.append(spark, root, part.repartition(4),
        statsCols = Seq("a", "b", "c"))
    }
    val all = rows(TxnTable.read(spark, root))
    Seq("a", "b", "c").foreach(d =>
      assert(TxnTable.readPruned(spark, root, d, 0L, 1L).inputFiles.length
        === TxnTable.latest(spark, root).get.files.size,
        s"interleaved layout must not prune on $d"))

    val z = TxnTable.compactZOrderTxn(spark, root, targetFiles = 16,
      Seq("a", "b", "c"))
    assert(z.files.size === 16)
    assert(rows(TxnTable.read(spark, root)) === all)
    // a 2-wide stripe of a 16-wide dim over z-cubes: each dim prunes
    Seq("a", "b", "c").foreach { d =>
      val kept = TxnTable.readPruned(spark, root, d, 0L, 1L).inputFiles.length
      assert(kept <= 8, s"$d-stripe kept $kept of 16")
      assert(rows(TxnTable.readPruned(spark, root, d, 0L, 1L)
        .filter(col(d) <= 1L)) === rows(
        TxnTable.read(spark, root).filter(col(d) <= 1L)))
    }
    // 2-dim zvalueN == the pairwise zvalue, bit for bit
    val two = graft.queries.ZOrder.zvalue($"a", $"b")
    val twoN = graft.queries.ZOrder.zvalueN(Seq($"a", $"b"))
    assert(TxnTable.read(spark, root)
      .filter(two =!= twoN).count() === 0L)
  }

  test("z-order folds live MoR deletes and reopens the raw-file paths") {
    val root = freshRoot()
    buildInterleaved(root)
    val expect = rows(TxnTable.read(spark, root).filter(!(col("a") === 0L && col("b") === 0L)))
    val s = spark
    import s.implicits._
    TxnTable.deleteKeysMor(spark, root, Seq("a", "b"),
      Seq((0L, 0L)).toDF("a", "b"))
    // raw-file pruned path refuses while deletes are live
    intercept[IllegalArgumentException] {
      TxnTable.readPruned(spark, root, "a", 0L, 3L).collect()
    }
    val z = TxnTable.compactZOrderTxn(spark, root, targetFiles = 8, "a", "b")
    assert(z.deletes.isEmpty)
    assert(rows(TxnTable.read(spark, root)) === expect)
    // pruned path works again and the deleted key stays gone
    assert(TxnTable.readPruned(spark, root, "a", 0L, 0L)
      .filter($"a" === 0L && $"b" === 0L).count() === 0L)
  }
}
