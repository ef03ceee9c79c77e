package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word 3-gram shingles of a token array: element i is
  * `tokens(i) ++ " " ++ tokens(i+1) ++ " " ++ tokens(i+2)`, for
  * i = 0 .. n-3 (empty output when n < 3).
  *
  * Result-identical to the lambda composition
  * `transform(sequence(1, size(tk)-2), i -> concat_ws(' ',
  * element_at(tk,i), element_at(tk,i+1), element_at(tk,i+2)))` and to
  * the oracle's `[array_to_string(tk[i:i+2],' ') for i in ...]`.
  *
  * Why custom (SURVEY.md §7.3): higher-order lambdas are
  * CodegenFallback, so the transform form shingled every document
  * INTERPRETED, with a per-element `sequence` array, bound-lambda
  * variable churn, and per-shingle element_at calls — in the hot loop
  * that feeds MinHash (q25/q30) and fingerprinting (q35), i.e. every
  * token of every document in the corpus. This expression does one
  * tight sliding-window pass over the backing UTF8Strings
  * (UTF8String.concatWs copies bytes once per shingle) and, via
  * defineCodeGen's static call, keeps the enclosing projection inside
  * WholeStageCodegen.
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any =
    Shingles3.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles3.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

object Shingles3 {
  private val Space = UTF8String.fromString(" ")

  /** Sliding 3-window concat over the token array. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = UTF8String.concatWs(Space,
        tokens.getUTF8String(i),
        tokens.getUTF8String(i + 1),
        tokens.getUTF8String(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingles3(c: Column): Column =
    ExprBridge.column(Shingles3(ExprBridge.expression(c)))
}
