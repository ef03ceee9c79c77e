package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** ScalaCheck laws for the fixed-point PageRank: on arbitrary random
  * symmetric graphs, the distributed Pregel rounds must equal a
  * sequential in-memory reference running the SAME integer arithmetic
  * (rank div outdeg per edge, base + 85·Σ div 100 per node) — every
  * node, every rank bit. Plus the conservation invariant the fixed
  * point scheme implies: each rank is ≥ the damping base, and total
  * rank mass never exceeds the scale (integer floors only lose mass,
  * never create it). */
object PageRankLawsProps extends Properties("graft.pagerank.laws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Scale = 1000000000000L
  private val Iters = 5

  /** Sequential reference: same fixed-point update, plain Maps. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = out.size
    val base = 15L * Scale / (100L * n)
    var rank: Map[Long, Long] = out.map { case (k, _) => k -> Scale / n }
    for (_ <- 1 to Iters) {
      val sums = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (src, dst) =>
        sums(dst) += rank(src) / out(src)
      }
      rank = sums.map { case (node, sc) => node -> (base + 85 * sc / 100) }.toMap
    }
    rank
  }

  /** Random undirected graphs, symmetrized + distinct like q104's. */
  private val genEdges: Gen[Seq[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 20L)
      b <- Gen.choose(0L, 20L) if a != b
    } yield (a, b)).map { pairs =>
      pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    }

  property("pageRank == sequential reference, bit for bit") =
    Prop.forAll(genEdges) { edges =>
      val got = PageRank.pageRank(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      got == reference(edges)
    }

  property("each rank >= damping base; total mass <= scale") =
    Prop.forAll(genEdges) { edges =>
      val ranks = PageRank.pageRank(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect()
      val n = edges.map(_._1).distinct.size
      val base = 15L * Scale / (100L * n)
      ranks.forall(_._2 >= base) && ranks.map(_._2).sum <= Scale
    }
}
