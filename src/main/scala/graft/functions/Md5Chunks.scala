package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5 digest of a string as four unsigned 32-bit big-endian chunks
  * (`array<bigint>` of length 4).
  *
  * Bit-identical by construction to
  * `conv(substring(md5(s), 8h+1, 8), 16, 10)` for h = 0..3 — chunk h IS
  * digest bytes 4h..4h+3 — so DuckDB oracle SQL written against the hex
  * form verifies plans using this expression unchanged.
  *
  * Why custom (SURVEY.md §7.3): the built-in path computes the digest
  * with a fresh MessageDigest per call, hex-encodes 32 chars, then
  * re-parses substrings back to integers — per EXPLODED SHINGLE ROW in
  * the MinHash hot loop. This expression digests the raw UTF-8 bytes
  * once on a thread-local MessageDigest and packs the chunks directly;
  * the only per-row allocations are the 4-element array and the digest's
  * internal buffer. Codegen emits a static call, keeping the enclosing
  * projection/aggregate inside WholeStageCodegen.
  */
case class Md5Chunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_chunks"

  override def nullSafeEval(input: Any): Any =
    Md5Chunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Chunks.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Chunks =
    copy(child = newChild)
}

object Md5Chunks {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Digest the UTF-8 bytes, pack big-endian unsigned 32-bit chunks. */
  def compute(s: UTF8String): ArrayData = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Long](4)
    var h = 0
    while (h < 4) {
      out(h) = ((d(4 * h) & 0xffL) << 24) |
        ((d(4 * h + 1) & 0xffL) << 16) |
        ((d(4 * h + 2) & 0xffL) << 8) |
        (d(4 * h + 3) & 0xffL)
      h += 1
    }
    new GenericArrayData(out)
  }

  def md5Chunks(c: Column): Column =
    ExprBridge.column(Md5Chunks(ExprBridge.expression(c)))
}
