package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filter as a mergeable AGGREGATE over a long column — the
  * membership summary behind [[graft.sinks.TxnTable]]'s per-file blooms
  * (equality-predicate file skipping, the complement of min/max range
  * stats: sorted layouts make ranges prunable, blooms make PROBES
  * prunable on any column, clustered or not).
  *
  * Built on Spark's own `org.apache.spark.util.sketch.BloomFilter`
  * (the sketch the engine's runtime bloom join uses), wrapped in the
  * house TypedImperativeAggregate shape ([[TopKByScore]], [[FreqSketch]])
  * so per-file filters come out of ONE `groupBy(input_file_name)` job
  * with map-side partials — not one job per file. Determinism: the
  * sketch's hash is seed-fixed, and bloom OR-merge is commutative, so
  * the same file content yields the same filter under any merge tree.
  */
@ExpressionDescription(
  usage = "_FUNC_(col, expectedItems, fpp) - mergeable bloom filter " +
    "over a long column; evaluates to the serialized filter bytes.")
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral column, got ${t.sql}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long    => buf.putLong(l)
      case i: java.lang.Integer => buf.putLong(i.longValue())
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = BloomAgg.toBytes(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = BloomAgg.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomAgg.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {

  def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** DataFrame entry point: serialized per-group bloom filter bytes. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    ExprBridge.column(
      BloomAgg(ExprBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())
}
