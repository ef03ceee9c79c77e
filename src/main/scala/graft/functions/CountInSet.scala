package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of elements of a string array that belong to a fixed word set
  * (with multiplicity — duplicates count every occurrence).
  *
  * Result-identical to the lambda composition
  * `aggregate(arr, 0L, (acc, x) -> acc + CASE WHEN x IN (words) THEN 1
  * ELSE 0 END)` and to the oracle's list_sum(list_transform(...)) form.
  *
  * Why custom (SURVEY.md §7.3): the aggregate() lambda is
  * CodegenFallback — interpreted per token — and the explode+sum rewrite
  * trades that for a corpus-wide per-token hash aggregate plus a shuffle
  * (measured 7x slower than the projection it replaced at sf0.1). A
  * membership count is a pure scalar over the array: this expression
  * does one hashed-set probe per element inside the projection —
  * zero shuffle, zero lambda — and defineCodeGen's static call keeps the
  * enclosing stage in WholeStageCodegen. The set rides along as a
  * codegen reference object (built once per executor, not per row).
  */
case class CountInSet(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    CountInSet.buildSet(words)

  override def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.CountInSet.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** One hashed probe per element; null elements never match. */
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val len = arr.numElements()
    var i = 0
    var n = 0L
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  def countInSet(c: Column, words: Seq[String]): Column =
    ExprBridge.column(CountInSet(ExprBridge.expression(c), words))
}
