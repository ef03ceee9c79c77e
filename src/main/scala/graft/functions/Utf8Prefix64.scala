package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving 8-byte UTF-8 prefix of a string as BIGINT — the
  * fixed-width carrier for TRUNCATED STRING BOUNDS in the txn manifest
  * (Iceberg's lower/upper-bound semantics — truncate, and increment the
  * truncated upper so it still bounds every extension — in a numeric
  * envelope the existing `(min, max)` stats plumbing carries unchanged;
  * cite Iceberg spec §Appendix D "Single-value serialization",
  * truncate(L) lower/upper bounds).
  *
  * Encoding: the first 8 bytes of the string's UTF-8 form, big-endian,
  * zero-padded on the right, with the sign bit flipped so UNSIGNED byte
  * order equals SIGNED long order (UTF-8 byte order is code-point
  * order, so `lower(a) <= lower(b)` whenever `a <= b` as Spark compares
  * strings — both are the binary comparison on UTF-8 bytes).
  *
  *  - `lower(s)`: zero-padded prefix. Monotone, and `lower(s) <= `
  *    every value of any string extending the prefix — a sound LOWER
  *    bound for a file min.
  *  - `upper(s)`: the prefix PLUS ONE when the string was truncated
  *    (strictly greater than every string sharing the first 8 bytes —
  *    the prefix-successor argument); the exact value when it fit.
  *    Monotone, so `max(upper(s))` over a file = `upper(max)` — a sound
  *    UPPER bound. An un-incrementable all-0xFF prefix saturates to
  *    Long.MaxValue (unbounded above: never prunes, always sound).
  *
  * Soundness of pruning with the encoded range `[min lower, max upper]`
  * per file: if value `v` is in the file then `lower(v) >= fileLo` and
  * `upper(v) <= fileHi`, so a probe may skip any file where either
  * fails. 8 bytes of discrimination — prefix-heavy keys (URLs sharing
  * a scheme) degrade to "never skip", never to a wrong skip. */
case class Utf8Prefix64(child: Expression, upperBound: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "utf8_prefix64"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (upperBound) Utf8Prefix64.upper(u) else Utf8Prefix64.lower(u)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Utf8Prefix64." +
        s"${if (upperBound) "upper" else "lower"}($c);")

  override protected def withNewChildInternal(newChild: Expression): Utf8Prefix64 =
    copy(child = newChild)
}

object Utf8Prefix64 {

  /** Zero-padded big-endian first-8-UTF-8-bytes, sign-flipped. */
  def lower(u: UTF8String): Long = {
    val bytes = u.getBytes
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    v ^ Long.MinValue
  }

  /** [[lower]] plus one when the string was truncated past 8 bytes
    * (prefix-successor: strictly above every extension); saturates at
    * Long.MaxValue when the prefix is all 0xFF. */
  def upper(u: UTF8String): Long = {
    val v = lower(u)
    if (u.numBytes <= 8) v
    else if (v == Long.MaxValue) Long.MaxValue
    else v + 1
  }

  // -- driver-side probe encodings (predicate literals) -----------------

  def lower(s: String): Long = lower(UTF8String.fromString(s))
  def upper(s: String): Long = upper(UTF8String.fromString(s))

  /** The LARGEST possible [[lower]] encoding of any string starting
    * with `prefix` — the prefix's bytes padded with 0xFF: the upper end
    * of a `startsWith` probe range. (When the prefix itself fills 8
    * bytes every extension shares its exact encoding.) */
  def prefixCeil(s: String): Long = {
    val bytes = UTF8String.fromString(s).getBytes
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0xffL)
      i += 1
    }
    v ^ Long.MinValue
  }

  /** The hash a string-keyed BLOOM records and probes: Spark SQL's own
    * `xxhash64(col)` (seed 42) over the UTF-8 bytes, so the write-side
    * aggregate and the read-side probe are the same codegen'd hash. */
  def bloomHash(s: String): Long = {
    val u = UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  def lowerCol(c: Column): Column =
    ExprBridge.column(Utf8Prefix64(ExprBridge.expression(c), upperBound = false))
  def upperCol(c: Column): Column =
    ExprBridge.column(Utf8Prefix64(ExprBridge.expression(c), upperBound = true))
}
