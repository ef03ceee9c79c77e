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

  property("a type change on a shared name is refused") =
    Prop.forAll(schemaGen.suchThat(_.fields.nonEmpty)) { prior =>
      val f = prior.fields.head
      val flipped = StructField(f.name,
        if (f.dataType == LongType) StringType else LongType)
      Prop.throws(classOf[IllegalArgumentException]) {
        TxnTable.evolve(Some(prior), StructType(Seq(flipped)))
      }
    }
}
