package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** ScalaCheck law for the fixed-point K-means: on arbitrary random
  * quantized vector sets, the distributed Lloyd rounds must equal a
  * sequential reference running the SAME integer arithmetic —
  * assignment, centroid update (offset-shifted floor mean), final
  * distances, every bit. */
object KmeansLawsProps extends Properties("graft.kmeans.laws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Off = 1000000000L

  private def reference(vs: Map[Long, Seq[Long]], k: Int,
                        iters: Int): Map[Long, (Int, Long)] = {
    def assign(cents: Map[Int, Seq[Long]]): Map[Long, (Long, Int)] =
      vs.map { case (vid, e) =>
        vid -> cents.toSeq.map { case (cid, c) =>
          (c.map(x => x * x).sum - 2 * c.zip(e).map { case (a, b) => a * b }.sum,
            cid)
        }.min
      }
    var cents: Map[Int, Seq[Long]] =
      (0 until k).map(i => i -> vs(i.toLong)).toMap
    for (_ <- 1 to iters) {
      val a = assign(cents)
      cents = a.groupBy(_._2._2).map { case (cid, members) =>
        val es = members.keys.map(vs).toSeq
        val n = es.size.toLong
        cid -> es.transpose.map { col =>
          val s = col.sum
          (s + Off * n) / n - Off // operands positive: trunc == floor
        }
      }
    }
    assign(cents).map { case (vid, (key, cid)) =>
      vid -> (cid, vs(vid).map(x => x * x).sum + key)
    }
  }

  private val genVecs: Gen[Map[Long, Seq[Long]]] = for {
    n <- Gen.choose(4, 24)
    dim <- Gen.choose(2, 6)
    rows <- Gen.listOfN(n,
      Gen.listOfN(dim, Gen.choose(-1000000L, 1000000L)))
  } yield rows.zipWithIndex.map { case (e, i) => i.toLong -> e.toSeq }.toMap

  property("kmeans == sequential reference, bit for bit") =
    Prop.forAll(genVecs) { vs =>
      val k = math.min(3, vs.size)
      val df = vs.toSeq.map { case (vid, e) => (vid, e) }.toDF("vec_id", "e")
      val got = LlmOps.kmeans(df, k, 2)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      got == reference(vs, k, 2)
    }
}
