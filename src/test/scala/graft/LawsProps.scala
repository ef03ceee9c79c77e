package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

/** ScalaCheck algebraic laws (SURVEY.md §5.2) over driver-generated
  * DataFrames. Each evaluation runs real Spark jobs, so the success count
  * is kept small — these are laws, not load tests. */
object LawsProps extends Properties("graft.laws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rowGen: Gen[(Int, Long, Double)] = for {
    key <- Gen.choose(0, 5)
    ts  <- Gen.choose(0L, 1000L)
    v   <- Gen.choose(-100.0, 100.0)
  } yield (key, ts, v)

  private val rowsGen = Gen.nonEmptyListOf(rowGen)

  // Latest-per-key (the flagship q02 shape): exactly one row per distinct
  // key, and that row carries the key's maximum timestamp.
  property("latestPerKey: one row per key, each at max ts") = Prop.forAll(rowsGen) { rows =>
    val df = rows.toDF("key", "ts", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"ts".desc, $"v".desc)
    val latest = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val expected = df.groupBy($"key").agg(max($"ts").as("max_ts"))
    val got = latest.select($"key", $"ts").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exp = expected.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    got == exp
  }

  // Union row-count additivity (J2): |a ∪all b| = |a| + |b|.
  property("unionByName: row-count additivity") = Prop.forAll(rowsGen, rowsGen) { (a, b) =>
    val da = a.toDF("key", "ts", "v")
    // swapped column order: unionByName must resolve by name
    val db = b.toDF("key", "ts", "v").select($"v", $"key", $"ts")
    da.unionByName(db).count() == (a.size + b.size)
  }

  // Dictionary encode/decode round-trip (P5/P13): decode(encode(x)) = x
  // for every x in the map's domain.
  property("map encode/decode round-trip") = Prop.forAll(
    Gen.nonEmptyListOf(Gen.oneOf("click", "error", "purchase", "signup", "view"))) { xs =>
    val enc = typedLit(Map("click" -> 1, "error" -> 2, "purchase" -> 3,
                           "signup" -> 4, "view" -> 5))
    val dec = typedLit(Map(1 -> "click", 2 -> "error", 3 -> "purchase",
                           4 -> "signup", 5 -> "view"))
    val df = xs.toDF("x")
      .withColumn("rt", element_at(dec, element_at(enc, $"x")))
    df.filter($"rt" =!= $"x").count() == 0
  }

  // Exact-dedup law (q22 shape): groups partition the input — group sizes
  // sum to the input size, and every keep_id is the min id of its group.
  property("exact dedup: groups partition the input") = Prop.forAll(rowsGen) { rows =>
    val df = rows.zipWithIndex.map { case ((k, ts, _), i) => (i.toLong, s"t$k-$ts") }
      .toDF("id", "text")
    val g = df.groupBy(md5($"text")).agg(min($"id").as("keep"), count(lit(1)).as("n"))
    g.agg(sum($"n")).head.getLong(0) == rows.size
  }

  // TopKByScore law: the bounded aggregate equals the ranking-window
  // form on arbitrary data — duplicate scores (ties broken by id),
  // duplicate (score, id) rows, any partitioning. The generator reuses
  // rowGen's coarse value grid so ties actually occur.
  property("topKByScore == ranking window") = Prop.forAll(
    rowsGen, Gen.choose(1, 4)) { (rows, k) =>
    import graft.functions.TopKByScore.topKByScore
    val df = rows.zipWithIndex
      .map { case ((key, ts, v), i) => (key, math.floor(v / 25) * 25, (ts * 7 + i) % 50) }
      .toDF("g", "score", "id")
      .repartition(5)
    val viaAgg = df.groupBy($"g")
      .agg(topKByScore($"score", $"id", k).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", ($"pos" + 1).cast("long").as("rnk"), $"t.id", $"t.score")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val viaWin = df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"g", $"rnk".cast("long"), $"id", $"score")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    viaAgg == viaWin
  }

}
