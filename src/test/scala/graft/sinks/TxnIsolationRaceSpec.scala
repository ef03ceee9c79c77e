package graft.sinks

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.GraftCatalog

/** REAL-CONCURRENCY stress for `write.rowlevel.isolation = snapshot`:
  * appender threads race genuine SQL UPDATEs (merge-on-read) on one
  * table. The updates target only the INITIAL id range, so the outcome
  * is deterministic regardless of interleaving: every update applies to
  * every initial row exactly once (they run sequentially on one
  * thread), every appended row survives untouched, and no commit is
  * lost — the exact guarantee the rebase path exists to provide. Under
  * the serializable default the same workload would refuse whenever an
  * append wins the race; under snapshot isolation it must converge
  * without a single statement failing. */
class TxnIsolationRaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cat = "graft_isr_cat"
  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_isr").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    w
  }

  test("appender threads race MoR UPDATEs: nothing lost, nothing " +
      "double-applied, no statement refused") {
    val root = s"$warehouse/db/race1"
    TxnTable.overwrite(spark, root,
      spark.range(1, 101).toDF("id").withColumn("v", col("id") * 10L)
        .repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    TxnTable.setTableProperty(spark, root, TxnTable.RowLevelModeKey,
      "merge-on-read")
    TxnTable.setTableProperty(spark, root, TxnTable.RowLevelIsolationKey,
      "snapshot")

    val nAppenders = 3
    val perThread = 4
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nAppenders)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until nAppenders).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until perThread).foreach { k =>
            val lo = 1000L + t * 100 + k * 10
            TxnTable.appendWithRetry(spark, root,
              spark.range(lo, lo + 5).toDF("id")
                .withColumn("v", col("id") * 10L),
              maxAttempts = 20)
          } catch { case e: Throwable => failures.add(e) }
        }
      })
    }
    start.countDown()
    // genuine SQL UPDATEs racing the appenders; each plans against
    // whatever head it happens to see and must rebase over append wins
    (1 to 5).foreach { _ =>
      spark.sql(s"UPDATE $cat.db.race1 SET v = v + 1000000 WHERE id <= 100")
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"appender failed: ${failures.peek()}")

    val got = TxnTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every initial row got all 5 updates exactly once
    (1L to 100L).foreach(i => assert(got(i) === i * 10 + 5000000L,
      s"id $i: got ${got(i)}"))
    // every appended row survived untouched
    val appended = for {
      t <- 0 until nAppenders; k <- 0 until perThread
      i <- (1000L + t * 100 + k * 10) until (1000L + t * 100 + k * 10 + 5)
    } yield i
    appended.foreach(i => assert(got(i) === i * 10, s"appended id $i"))
    assert(got.size === 100 + appended.size)
    // and the SQL-by-name read agrees with the merge path
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.race1").head.getLong(0)
      === got.size.toLong)
  }

  test("DISJOINT CoW updaters race: every statement lands via the " +
      "file-disjoint rebase — no refusal, each update applied once") {
    val root = s"$warehouse/db/race2"
    TxnTable.overwrite(spark, root,
      spark.range(1, 201).toDF("id").withColumn("v", col("id") * 10L)
        .repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    TxnTable.setTableProperty(spark, root, TxnTable.RowLevelIsolationKey,
      "snapshot")
    // per-FILE id ranges from the actual footers, so each thread's
    // BETWEEN predicate stats-prunes to exactly its own file and the
    // racing rewrites are provably disjoint
    val snap = TxnTable.latest(spark, root).get
    val ranges = snap.files.map { f =>
      val mm = spark.read.parquet(s"$root/$f")
        .agg(min(col("id")), max(col("id"))).head
      (mm.getLong(0), mm.getLong(1))
    }.sortBy(_._1)
    assert(ranges.size === 4)

    val perThread = 4
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(ranges.size)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    ranges.foreach { case (lo, hi) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until perThread).foreach { _ =>
            spark.sql(s"UPDATE $cat.db.race2 SET v = v + 1 " +
              s"WHERE id BETWEEN $lo AND $hi")
          } catch { case e: Throwable => failures.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    assert(failures.isEmpty,
      s"a disjoint updater was refused or failed: ${failures.peek()}")

    val got = TxnTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 200)
    (1L to 200L).foreach(i => assert(got(i) === i * 10 + perThread,
      s"id $i: got ${got(i)}"))
    // 16 row-level commits all landed (plus the initial overwrite)
    assert(TxnTable.latest(spark, root).get.version ===
      snap.version + ranges.size * perThread)
  }
}
