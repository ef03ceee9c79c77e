package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd dot product of two ArrayType(LongType) columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.3; the brief's
  * preference order: compose built-ins > custom Expression > UDF): the
  * built-in composition `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`
  * is semantically right but higher-order lambdas are CodegenFallback —
  * every embedding similarity was an interpreted per-element closure
  * call plus a materialized intermediate array. This expression is a
  * tight primitive loop inside WholeStageCodegen: no closure, no
  * allocation, pairwise long multiply-add straight off the unsafe array
  * data. Used by every embedding operator (cosine in q24/q31/q36, the
  * LSH plane projections) — the hot inner loop of similarity search at
  * any scale.
  *
  * Semantics: null if either array is null OR lengths differ (loud,
  * like zip_with's null-padding propagation — a width mismatch must
  * surface as NULL output, not a silently truncated product). Null
  * elements are not expected from the quantization path and read as 0.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var s = 0L
      var i = 0
      val n = x.numElements()
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for graft's custom expressions. */
object GraftFunctions {
  /** dot(a, b) over long arrays — codegen'd; null on width mismatch. */
  def dotLong(a: Column, b: Column): Column =
    ExprBridge.column(
      LongArrayDot(ExprBridge.expression(a), ExprBridge.expression(b)))
}
