package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** ScalaCheck law for connected components: on arbitrary random graphs,
  * the distributed min-label/pointer-jump iteration must equal a
  * sequential union-find reference — labels, membership, and component
  * structure, not just spot shapes. */
object ClustersLawsProps extends Properties("graft.clusters.laws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential union-find with min-id labels. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min root wins, so labels are component minima
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  private val genPairs: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L) if a != b
    } yield (a, b))

  property("connectedComponents == sequential union-find") =
    Prop.forAll(genPairs) { pairs =>
      val got = Clusters.connectedComponents(pairs.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      got == unionFind(pairs)
    }
}
