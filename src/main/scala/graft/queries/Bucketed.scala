package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.Det._

/** Bucketed co-located joins — the 100 TB layout answer to the fact⋈fact
  * shuffle (SURVEY.md §2.5; the in-code "bucket both sides on orderkey"
  * note on q04/q05 made real).
  *
  * orders and lineitem are written ONCE as parquet tables bucketed (and
  * in-bucket sorted) on the join key; every subsequent join on that key
  * plans as a SortMergeJoin with NO Exchange on either side — the
  * layout, not the query, pays the shuffle. On a cluster this is the
  * difference between re-shuffling ~100 TB per join and reading
  * co-located buckets; locally it is plan-verified (BucketedJoinSpec
  * asserts the exchange-free join subtree).
  *
  * The one-time layout build is idempotent per (session, sfDir) and
  * deliberately NOT part of the benched query cost beyond its first run
  * — exactly how a production warehouse amortizes bucketing.
  */
object Bucketed {

  type Q = (SparkSession, String) => DataFrame

  private val Buckets = 16
  private val Db = "graft_bucketed"

  private def tag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Idempotent one-time bucketed layout for (sfDir): orders + lineitem
    * bucketed/sorted on the order key. The in-memory catalog does not
    * survive JVMs but the warehouse directory does — an orphaned
    * location (ours by construction) is removed before re-creating, or
    * Spark refuses the managed-table CTAS. */
  def ensureLayout(s: SparkSession, dir: String): Unit = synchronized {
    s.sql(s"CREATE DATABASE IF NOT EXISTS $Db")
    Seq(("orders", "o_orderkey"), ("lineitem", "l_orderkey")).foreach {
      case (name, key) =>
        val table = s"$Db.${name}_${tag(dir)}"
        if (!s.catalog.tableExists(table)) {
          val loc = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir") + s"/$Db.db/${name}_${tag(dir)}")
          val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(loc)) fs.delete(loc, true)
          // repartition on the bucket key first: bucketBy writes one file
          // per (task, bucket), and the scan only reports its output as
          // SORTED when each bucket is a single file — without this, a
          // many-partition input would silently re-insert per-join Sorts
          t(s, dir, name).repartition(Buckets, col(key)).write.mode("overwrite")
            .format("parquet")
            .bucketBy(Buckets, key).sortBy(key)
            .saveAsTable(table)
        }
    }
  }

  /** The bucketed sides of the join, as catalog reads (bucket metadata
    * only flows through the catalog, not raw parquet paths). */
  def orders(s: SparkSession, dir: String): DataFrame = {
    ensureLayout(s, dir); s.table(s"$Db.orders_${tag(dir)}")
  }
  def lineitem(s: SparkSession, dir: String): DataFrame = {
    ensureLayout(s, dir); s.table(s"$Db.lineitem_${tag(dir)}")
  }

  // ---------------------------------------------------------------------
  // q41: q04's fact⋈fact join over the bucketed layout — same result,
  // exchange-free join. Only the final low-cardinality agg exchanges
  // (a few bytes per priority class).
  // ---------------------------------------------------------------------
  val q41: Q = (s, dir) => {
    import s.implicits._
    orders(s, dir).join(lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        money(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }
  val q41Sql: String =
    s"""SELECT o_orderpriority,
       |  SUM(${sqlCents("l_extendedprice * (1.0 - l_discount)")}) / 100.0 AS revenue,
       |  COUNT(*) AS n_items
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map("q41_bucketed_join" -> q41)
  val oracles: Map[String, String] = Map("q41_bucketed_join" -> q41Sql)
}
