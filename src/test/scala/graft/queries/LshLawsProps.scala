package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** ScalaCheck law for the LSH candidate topology: the salted, capped
  * collect_list pair generation (what the plans run) equals the plain
  * self-join pair generation (the shape the DuckDB oracles use) whenever
  * no bucket exceeds the cap. */
object LshLawsProps extends Properties("graft.lsh.laws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  property("bucketPairs == self-join pair generation under the cap") =
    Prop.forAll(Gen.nonEmptyListOf(for {
      id   <- Gen.choose(0L, 40L)
      band <- Gen.choose(0, 2)
      key  <- Gen.oneOf("a", "b", "c")
    } yield (id, band, key))) { rows =>
      val bands = rows.distinct.toDF("doc_id", "band", "key")
      val viaBuckets = LlmOps.bucketPairs(bands, cap = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaJoin = bands.as("x").join(bands.as("y"),
          $"x.band" === $"y.band" && $"x.key" === $"y.key" && $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("a"), $"y.doc_id".as("b")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      viaBuckets == viaJoin
    }
}
