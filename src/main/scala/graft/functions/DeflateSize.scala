package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a text column — the compression-ratio
  * quality signal modern corpus pipelines run beside repetition
  * metrics (q65): highly repetitive/templated documents compress far
  * below natural prose, and near-random noise barely compresses at
  * all, so the ratio `deflate(text)/len(text)` separates boilerplate
  * and gibberish from trainable text with ONE pass and no
  * tokenization. This is a JVM-deterministic quantity (fixed level,
  * fixed strategy, raw stream — same zlib, same bytes) but NOT
  * SQL-expressible, so its query is a rows-only entry in the driver
  * gate and the real verification lives in DeflateSizeSpec (golden
  * sizes, the repetitive ≪ prose ≪ random ordering, determinism).
  *
  * Scale shape: pure per-row projection, no shuffle; level 6 deflate
  * of kilobyte documents is ~µs-class — decode-stage cost, not join
  * cost. CodegenFallback for the [[DecodeImage]] reason: per-row cost
  * IS the compressor.
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary input, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String  => s.getBytes
      case b: Array[Byte] => b
    }
    DeflateSize.compressedSize(bytes)
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  // one native zlib instance per executor thread, reset() between rows
  // — constructing/ending a Deflater per row is a native allocation in
  // the hot loop; reset() restarts the stream with the same pinned
  // knobs, so sizes are identical to a fresh instance. A Cleaner
  // end()s the native stream when the owning thread's ThreadLocal
  // value becomes unreachable, so thread churn (elastic pools,
  // repeated local sessions) can't pin zlib memory for the JVM's
  // lifetime.
  private val cleaner = java.lang.ref.Cleaner.create()

  private final class Slot(val d: Deflater, val buf: Array[Byte]) {
    // the cleanup lambda must not capture `this`, only the Deflater
    cleaner.register(this, { val dd = d; () => dd.end() })
  }

  private val local = new ThreadLocal[Slot] {
    override def initialValue(): Slot =
      new Slot(new Deflater(6, true), new Array[Byte](8192))
  }

  /** Deflate byte count at level 6, default strategy, raw (nowrap)
    * stream — every knob pinned so the size is a pure function of the
    * input bytes. */
  def compressedSize(bytes: Array[Byte]): Long = {
    val slot = local.get()
    val d = slot.d
    val buf = slot.buf
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflateSize(c: Column): Column =
    ExprBridge.column(DeflateSize(ExprBridge.expression(c)))
}
