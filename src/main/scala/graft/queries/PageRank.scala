package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank centrality — the second iterative graph operator beside
  * [[Clusters.connectedComponents]], and the one a training-data
  * pipeline reaches for when "how duplicated is this doc" (CC) becomes
  * "how CENTRAL is this node": influence scoring over interaction
  * graphs, seed selection for crawl frontiers, and graph-based quality
  * weighting of training data (rank mass ∝ how much the corpus links
  * into a node). The reference has no graph surface at all; this is
  * pure extension territory (SURVEY §8).
  *
  * Determinism (the house Det contract, applied to an ITERATIVE float
  * algorithm): classic PageRank iterates r' = (1-d)/N + d·Σ r/deg in
  * doubles, where the Σ is order-nondeterministic across engines and
  * partitionings. Here ranks live as 1e-12 FIXED-POINT BIGINTs: the
  * per-edge contribution is `rank div outdeg` (integer division), the
  * damped update is `base + (85·Σ) div 100` — every step is integer
  * arithmetic, sums are order-independent, and five rounds later the
  * ranks are bit-identical in Spark and DuckDB with no float tolerance
  * anywhere. Quantization error is ≤ outdeg ulps of 1e-12 per node per
  * round — invisible next to PageRank's own damping convergence, and a
  * price worth paying for an oracle-checkable iterative operator.
  *
  * Scale posture: each round is the classic Pregel superstep — join the
  * rank table (one row per node) to the edge list on src, aggregate
  * contributions by dst. That is 2 shuffles/round over edges + nodes,
  * never all-pairs, no driver-side graph; the one driver scalar is N
  * (node count — a control input to the base term, same class as the
  * CC label-sum witness). Per-round `localCheckpoint` truncates lineage
  * exactly as in CC (reliable-checkpoint option available the same
  * way). On a real cluster the edge list would be written once bucketed
  * by src (the [[Bucketed]] pattern) making the rank join exchange-free
  * on the edge side; rounds are fixed (Iters), so total cost is
  * Iters × (|E| shuffle) — the known PageRank bill.
  */
object PageRank {

  type Q = (SparkSession, String) => DataFrame

  private val Scale = 1000000000000L // 1e12 fixed-point
  private val Iters = 5
  // supplier node ids live above customers; testdata keys are < 1e6 at
  // any generated SF, and the offset is a constant of THIS query's
  // graph encoding, not of the operator
  private val SuppOff = 1000000000L

  /** Fixed-point PageRank over a SYMMETRIC distinct edge list
    * (src, dst) — symmetry means every node has in- and out-edges, so
    * there is no dangling-mass special case. Returns (node, rank) with
    * rank the 1e-12-scaled BIGINT after `iters` damped rounds.
    *
    * Iteration shape: the (edge ⋈ outdegree) table is materialized ONCE
    * (localCheckpoint — or a reliable checkpoint when `checkpointDir`
    * is set), then the fixed `iters` rounds chain as ONE declarative
    * plan with NO per-round checkpoint: lineage depth is `iters` (a
    * constant), every round joins the same checkpointed edge relation
    * on the same key, and Spark's ReusedExchange computes that edge
    * shuffle layout once instead of once per round. Per-round
    * checkpointing (the CC loop's posture) pays one barriered
    * materialization job per round — measured 10× slower here, and only
    * worth it when the round count is unbounded/convergence-driven;
    * `cpEvery` re-enables it for long runs (checkpoint every k rounds)
    * without changing results. */
  def pageRank(edges: DataFrame, iters: Int = Iters,
               checkpointDir: Option[String] = None,
               cpEvery: Int = 0): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    checkpointDir.foreach(s.sparkContext.setCheckpointDir)
    def cp(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(false)
      else df.localCheckpoint(false)
    // The (edges ⋈ outdegree) relation is checkpointed ONCE — every
    // round rescans it from the block manager instead of recomputing
    // the build join/distinct (measured: recomputing-with-ReusedExchange
    // was 1.6× slower — AQE's per-stage replanning defeats cross-round
    // exchange reuse). The one driver action (|V| for the base term)
    // doubles as the checkpoint materializer.
    //
    // The checkpoint is REPARTITIONED BY src AND SORTED first: the
    // captured LogicalRDD then reports hash(src) partitioning + src
    // ordering, so every round's rank⋈edges SortMergeJoin needs NO
    // exchange and NO sort on the edge side — the |E|-row shuffle+sort
    // that used to run once per round (plans/r15/q104_pagerank_*.txt:
    // the per-round `Exchange → Sort → Scan ExistingRDD` arm collapses
    // to a bare scan) now runs once at build. Guide §2.4 "remove
    // shuffles outright": the bucketed-edge layout, applied to the
    // in-session checkpoint instead of a persisted table.
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("od"))
    val ed = cp(edges.join(deg, "src")
      .repartition($"src").sortWithinPartitions($"src"))
    val n = ed.select($"src").distinct().count() // |V|, base-term control input
    require(n > 0, "pageRank on an empty graph")
    val base = 15L * Scale / (100L * n)
    var rank = ed.select($"src".as("node")).distinct()
      .select($"node", lit(Scale / n).as("rank"))
    var i = 0
    while (i < iters) {
      rank = ed
        .join(rank.select($"node".as("src"), $"rank"), "src")
        .select($"dst".as("node"), expr("rank div od").as("c"))
        .groupBy($"node").agg(sum($"c").as("sc"))
        .select($"node", (lit(base) + expr("(85 * sc) div 100")).as("rank"))
      i += 1
      if (cpEvery > 0 && i % cpEvery == 0 && i < iters) rank = cp(rank)
    }
    rank
  }

  /** PERSONALIZED PageRank: teleport mass flows only to `seeds`, so
    * rank measures graph PROXIMITY TO THE SEED SET rather than global
    * centrality — the "more like these" primitive (recommendation,
    * crawl frontier expansion, seed-based corpus selection). Same
    * fixed-point integer scheme as [[pageRank]]; the structural delta
    * is the base term: Scale·15/(100·|S|) for seed nodes, 0 elsewhere,
    * applied through a FULL outer join each round — a seed that
    * receives no contributions this round must still keep its teleport
    * mass (an inner shape would silently drop it and the mass with
    * it). Non-seed nodes start at rank 0 and only ever hold flowed
    * mass. Seeds must be graph nodes. */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
                           iters: Int = Iters,
                           checkpointDir: Option[String] = None): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    require(seeds.nonEmpty, "personalizedPageRank needs a seed set")
    checkpointDir.foreach(s.sparkContext.setCheckpointDir)
    def cp(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(false)
      else df.localCheckpoint(false)
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("od"))
    val ed = cp(edges.join(deg, "src"))
    val base = 15L * Scale / (100L * seeds.size)
    // the seed table is planning-scale data (a literal handful of ids)
    val seedBase = seeds.sorted.toDF("node")
      .select($"node".cast("long").as("node"), lit(base).as("b"))
    var rank = seedBase.select($"node", lit(Scale / seeds.size).as("rank"))
    var i = 0
    while (i < iters) {
      val contrib = ed
        .join(rank.select($"node".as("src"), $"rank"), "src")
        .select($"dst".as("node"), expr("rank div od").as("c"))
        .groupBy($"node").agg(sum($"c").as("sc"))
      rank = contrib.join(seedBase, Seq("node"), "full_outer")
        .select($"node",
          (coalesce($"b", lit(0L)) +
            expr("(85 * coalesce(sc, 0L)) div 100")).as("rank"))
      i += 1
    }
    rank
  }

  // ---------------------------------------------------------------------
  // q104: purchase-graph centrality — customers and suppliers as nodes,
  // an (undirected) edge wherever a customer's order contains a
  // supplier's part, rank after 5 damped rounds, top 50. The bipartite
  // symmetrized graph makes rank flow customer → supplier → customer:
  // central suppliers are those reached by well-connected customers,
  // not merely high-degree ones — exactly what degree (q01-style
  // counting) cannot express and iteration can.
  // ---------------------------------------------------------------------
  /** The symmetric purchase edge list as a stamp-keyed SESSION ARTIFACT
    * (the sigCache/Clusters-labeling contract): the 6M⋈1.5M join +
    * distinct that DERIVES the graph is paid once per dataset snapshot,
    * not once per query run — q104 and q114 share one persisted edge
    * table, exactly as a production graph pipeline materializes its
    * edge list once and runs many centrality/proximity queries over
    * it. Lifetime owned by [[graft.ArtifactCaches]] (cold-start resets
    * for plan snapshots; stale stamps unpersist on regeneration). */
  private val edgeCache = graft.ArtifactCaches.register(
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]())

  private def purchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val st = graft.SourceStamp.table(s, dir, "lineitem") + " " +
      graft.SourceStamp.table(s, dir, "orders")
    graft.SourceStamp.evictStale(edgeCache, s, dir, st)(_.unpersist(): Unit)
    edgeCache.computeIfAbsent((s, dir, st), { _: (SparkSession, String, String) =>
      import s.implicits._
      val pairs = graft.Tables.t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey")
        .join(graft.Tables.t(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select($"o_custkey".as("c"), $"l_suppkey".as("sp")).distinct()
      pairs
        .select($"c".as("src"), ($"sp" + SuppOff).as("dst"))
        .union(pairs.select(($"sp" + SuppOff).as("src"), $"c".as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  val q104Bench: Q = (s, dir) => {
    import s.implicits._
    pageRank(purchaseEdges(s, dir)).orderBy($"rank".desc, $"node".asc).limit(50)
  }
  val q104: Q = q104Bench // the top-50 sort is the semantics, not cosmetics

  /** DuckDB mirror: the same 5 rounds UNROLLED as chained CTEs (DuckDB
    * recursive CTEs disallow aggregation in the recursive term), integer
    * ops only — `//` there == `div` here on positive BIGINTs. */
  val q104Sql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    15000000000000 // (100 * cnt)
         |      + (85 * SUM(r${i - 1}.rank // deg.od)) // 100 AS rank
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
         |         JOIN deg ON deg.src = e.src, n
         |  GROUP BY e.dst, cnt)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (
       |  SELECT c AS src, sp + $SuppOff AS dst FROM p
       |  UNION ALL SELECT sp + $SuppOff, c FROM p),
       |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
       |n AS (SELECT COUNT(*) AS cnt FROM deg),
       |r0 AS (SELECT src AS node, $Scale // cnt AS rank FROM deg, n),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank
       |FROM r$Iters ORDER BY rank DESC, node ASC LIMIT 50""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q114: PERSONALIZED PageRank from customers {1, 2} — "which suppliers
  // (and fellow customers) are closest to these customers' purchase
  // neighborhoods": the more-like-these primitive, per-seed mass
  // flowing outward instead of global centrality. Nodes the seeds'
  // mass never reaches carry no row; integer-zero ranks filter out so
  // the result is the reached neighborhood ranked by proximity.
  // ---------------------------------------------------------------------
  private val PprSeeds = Seq(1L, 2L)

  val q114Bench: Q = (s, dir) => {
    import s.implicits._
    personalizedPageRank(purchaseEdges(s, dir), PprSeeds)
      .filter($"rank" > 0)
      .orderBy($"rank".desc, $"node".asc).limit(30)
  }
  val q114: Q = q114Bench // the top-30 sort is the semantics

  val q114Sql: String = {
    val base = 15L * Scale / (100L * PprSeeds.size)
    val init = Scale / PprSeeds.size
    val seedRows = PprSeeds.sorted
      .map(v => s"(CAST($v AS BIGINT), CAST($base AS BIGINT))").mkString(", ")
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT COALESCE(c.node, sb.node) AS node,
         |    COALESCE(sb.b, 0) + (85 * COALESCE(c.sc, 0)) // 100 AS rank
         |  FROM (SELECT e.dst AS node, SUM(r${i - 1}.rank // deg.od) AS sc
         |        FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
         |             JOIN deg ON deg.src = e.src
         |        GROUP BY e.dst) c
         |  FULL JOIN sb ON sb.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (
       |  SELECT c AS src, sp + $SuppOff AS dst FROM p
       |  UNION ALL SELECT sp + $SuppOff, c FROM p),
       |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
       |sb AS (SELECT * FROM (VALUES $seedRows) AS t(node, b)),
       |r0 AS (SELECT node, CAST($init AS BIGINT) AS rank FROM sb),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank
       |FROM r$Iters WHERE rank > 0
       |ORDER BY rank DESC, node ASC LIMIT 30""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q104_pagerank" -> q104,
    "q114_ppr"      -> q114)
  val oracles: Map[String, String] = Map(
    "q104_pagerank" -> q104Sql,
    "q114_ppr"      -> q114Sql)
}
