package graft.sinks

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

/** Laws for the txn table's schema-evolution rule: the properties that
  * make "read any old file under the current schema" safe — prior
  * columns keep position and type, new columns append in incoming
  * order, re-applying a schema is a no-op, and a type change on a
  * shared name is refused rather than coerced. */
object EvolveLawsProps extends Properties("graft.txn.evolve.laws") {

  private val types: Gen[DataType] =
    Gen.oneOf(LongType, IntegerType, StringType, DoubleType, BooleanType)

  private val fieldGen: Gen[StructField] = for {
    n <- Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    t <- types
  } yield StructField(n, t)

  private def dedup(fs: List[StructField]): List[StructField] =
    fs.groupBy(_.name).map(_._2.head).toList.sortBy(_.name)

  private val schemaGen: Gen[StructType] =
    Gen.listOf(fieldGen).map(fs => StructType(dedup(fs)))

  /** A compatible incoming schema: shared names keep the prior type. */
  private def compatible(prior: StructType): Gen[StructType] =
    Gen.listOf(fieldGen).map { fs =>
      StructType(dedup(fs).map { f =>
        prior.fields.find(_.name == f.name).getOrElse(f)
      })
    }

  property("prior columns keep position and type; new columns append") =
    Prop.forAll(schemaGen) { prior =>
      Prop.forAll(compatible(prior)) { incoming =>
        val out = TxnTable.evolve(Some(prior), incoming)
        val keepsPrefix = out.fields.take(prior.fields.length).toSeq ==
          prior.fields.toSeq
        val appended = out.fields.drop(prior.fields.length)
        val newOnly = appended.forall(f => !prior.fieldNames.contains(f.name))
        val complete = incoming.fields.forall(f => out.fieldNames.contains(f.name))
        keepsPrefix && newOnly && complete
      }
    }

  property("evolve is idempotent: applying the result again is a no-op") =
    Prop.forAll(schemaGen) { prior =>
      Prop.forAll(compatible(prior)) { incoming =>
        val once = TxnTable.evolve(Some(prior), incoming)
        TxnTable.evolve(Some(once), once) == once &&
          TxnTable.evolve(Some(once), incoming) == once
      }
    }

  property("an incompatible type change on a shared name is refused") =
    Prop.forAll(schemaGen.suchThat(_.fields.nonEmpty)) { prior =>
      val f = prior.fields.head
      // string<->anything is never a widening, in either direction
      val flipped = StructField(f.name,
        if (f.dataType == StringType) LongType else StringType)
      Prop.throws(classOf[IllegalArgumentException]) {
        TxnTable.evolve(Some(prior), StructType(Seq(flipped)))
      }
    }

  // ---- lossless type widening (round 10) --------------------------------
  private val widenChains: Seq[Seq[DataType]] = Seq(
    Seq(ByteType, ShortType, IntegerType, LongType),
    Seq(FloatType, DoubleType))

  property("lossless widening is accepted and widens IN PLACE") =
    Prop.forAll(Gen.oneOf(widenChains), Gen.chooseNum(0, 2)) { (chain, i0) =>
      val i = math.min(i0, chain.size - 2)
      val narrow = chain(i)
      Prop.forAll(Gen.oneOf(chain.drop(i + 1))) { wide =>
        val prior = StructType(Seq(StructField("x", narrow), StructField("k", StringType)))
        val out = TxnTable.evolve(Some(prior), StructType(Seq(StructField("x", wide))))
        // position kept, type widened, other columns untouched
        out.fieldNames.toSeq == Seq("x", "k") &&
          out.fields(0).dataType == wide && out.fields(1).dataType == StringType
      }
    }

  property("narrowing is refused (writers produce table-typed data)") =
    Prop.forAll(Gen.oneOf(widenChains)) { chain =>
      Prop.forAll(Gen.chooseNum(0, chain.size - 2)) { i =>
        val prior = StructType(Seq(StructField("x", chain.last)))
        Prop.throws(classOf[IllegalArgumentException]) {
          TxnTable.evolve(Some(prior), StructType(Seq(StructField("x", chain(i)))))
        }
      }
    }

  property("widening is idempotent and monotone along the chain") =
    Prop.forAll(Gen.oneOf(widenChains)) { chain =>
      // fold the whole chain: each step widens, re-applying any earlier
      // (narrower) shape afterwards refuses, re-applying the final shape
      // is a no-op
      val finalSchema = chain.init.foldLeft(
        StructType(Seq(StructField("x", chain.head)))) { (acc, _) =>
        val idx = chain.indexOf(acc.fields(0).dataType)
        TxnTable.evolve(Some(acc), StructType(Seq(StructField("x", chain(idx + 1)))))
      }
      finalSchema.fields(0).dataType == chain.last &&
        TxnTable.evolve(Some(finalSchema), finalSchema) == finalSchema
    }
}
