package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a mergeable AGGREGATE — the
  * bounded-memory answer to "which items are frequent" that an exact
  * `GROUP BY item` can't give at 100 TB vocabulary scale: the exact
  * aggregate's hash table is vocabulary-sized PER TASK, while this
  * sketch holds at most k counters per group per map task and its
  * partials merge like any sum (SURVEY §7.3's sanctioned escalation —
  * TypedImperativeAggregate, same family as [[TopKByScore]]).
  *
  * GUARANTEE (the reason the output is usable despite being a sketch):
  * after any stream order and any merge tree over total weight n, every
  * item with true count > n/(k+1) is PRESENT in the sketch, and each
  * surviving counter c satisfies true - n/(k+1) <= c <= true. The
  * membership guarantee is order-INDEPENDENT, so the intended usage
  * pattern is deterministic end-to-end: sketch → candidate set
  * (superset of true heavy hitters) → exact second pass over the
  * candidates only (tiny broadcast join) → thresholded exact counts.
  * q71 implements exactly that and is DuckDB-oracle-checked — if the
  * sketch ever dropped a true heavy hitter the hash compare would fail.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries"): sum counters
  * pointwise; if more than k survive, subtract the (k+1)-th largest
  * count from all and drop the non-positive — content after the
  * subtraction is independent of map iteration order.
  */
@ExpressionDescription(
  usage = "_FUNC_(item, k) - Misra-Gries frequent-items sketch: " +
    "array<struct<item,count_lb>> of <= k candidates; every item with " +
    "true count > n/(k+1) is guaranteed present.")
case class FreqSketch(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.MG] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(itemExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    itemExpr.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lb", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): FreqSketch.MG = new FreqSketch.MG(k)

  override def update(buf: FreqSketch.MG, input: InternalRow): FreqSketch.MG = {
    val v = itemExpr.eval(input)
    // UTF8String may point into a reused buffer — materialize a copy
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FreqSketch.MG, other: FreqSketch.MG): FreqSketch.MG = {
    buf.mergeIn(other)
    buf
  }

  /** Sorted (count DESC, item ASC) for a deterministic presentation of
    * whatever the sketch holds; consumers needing exact semantics use
    * the candidate-verify pattern (see class doc). */
  override def eval(buf: FreqSketch.MG): Any = {
    val entries = buf.entries.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(entries.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buf: FreqSketch.MG): Array[Byte] = {
    val items = buf.entries.toArray
    val bytes = items.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.MG = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqSketch.MG(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(itemExpr = newChildren.head)
}

object FreqSketch {

  /** Misra-Gries counter set, at most k entries after any operation. */
  final class MG(val k: Int) {
    private val counts = new java.util.HashMap[String, java.lang.Long](k * 2)

    def entries: Iterator[(String, Long)] = {
      val it = counts.entrySet().iterator()
      new Iterator[(String, Long)] {
        def hasNext: Boolean = it.hasNext
        def next(): (String, Long) = {
          val e = it.next(); (e.getKey, e.getValue.longValue())
        }
      }
    }

    /** Raw insert used by deserialize (no decrement logic). */
    private[functions] def put(item: String, c: Long): Unit =
      counts.put(item, c)

    /** Classic MG update: hit increments; miss inserts if room, else
      * decrements every counter by 1 (dropping zeros) — that decrement
      * is what buys the n/(k+1) bound. */
    def add(item: String): Unit = {
      val cur = counts.get(item)
      if (cur != null) counts.put(item, cur + 1L)
      else if (counts.size < k) counts.put(item, 1L)
      else {
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }

    /** Mergeable-summaries merge: pointwise sum, then if over k entries
      * subtract the (k+1)-th largest count and drop non-positives. */
    def mergeIn(other: MG): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey,
          if (cur == null) e.getValue else cur + e.getValue)
      }
      if (counts.size > k) {
        val values = new Array[Long](counts.size)
        var i = 0
        val vit = counts.values().iterator()
        while (vit.hasNext) { values(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(values)
        val sub = values(values.length - k - 1) // (k+1)-th largest
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          if (e.getValue <= sub) eit.remove()
          else e.setValue(e.getValue - sub)
        }
      }
    }
  }

  /** DataFrame entry point: `freqSketch(col, k)` aggregates to the
    * group's candidate array<struct<item,count_lb>>. */
  def freqSketch(item: Column, k: Int): Column =
    ExprBridge.column(
      FreqSketch(ExprBridge.expression(item), k).toAggregateExpression())
}
