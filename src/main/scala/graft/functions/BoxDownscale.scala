package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._

/** REAL image RESIZE for the multimodal pipeline — the step between
  * [[DecodeImage]] and feature extraction that every vision ingest
  * stage runs (thumbnail/patch normalization before embedding): k×k
  * BOX-FILTER downscale of the 8-bit luma plane. Output pixel (ox, oy)
  * is the floor-average of the input block [ox·k, min(ox·k+k, w)) ×
  * [oy·k, min(oy·k+k, h)) — edge blocks average over their ACTUAL
  * pixel count, so odd dimensions lose no columns/rows and the output
  * is ceil(w/k) × ceil(h/k). Integer sums + one floor division per
  * output pixel: bit-exact on every engine and JVM, the same Det
  * property as [[DecodeImage]]'s integer luma.
  *
  * NULL for malformed input (plane size ≠ w·h, non-positive dims or k)
  * — corrupt assets filter out, they don't kill the job.
  *
  * CodegenFallback for the [[DecodeImage]] reason: per-row cost is the
  * pixel loop itself, the operator is a pure projection (no shuffle, no
  * state), and the wide plane prunes away once features flow on.
  */
case class BoxDownscale(gray: Expression, imgWidth: Expression,
                        imgHeight: Expression, factor: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(gray, imgWidth, imgHeight, factor)

  override def checkInputDataTypes(): TypeCheckResult =
    (gray.dataType, imgWidth.dataType, imgHeight.dataType, factor.dataType) match {
      case (BinaryType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int, int), got $other")
    }

  override def dataType: DataType = BoxDownscale.schema
  override def nullable: Boolean = true
  override def prettyName: String = "box_downscale"

  override def eval(input: InternalRow): Any = {
    val g = gray.eval(input)
    val w = imgWidth.eval(input)
    val h = imgHeight.eval(input)
    val kk = factor.eval(input)
    if (g == null || w == null || h == null || kk == null) null
    else BoxDownscale.downscale(g.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int], kk.asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoxDownscale =
    copy(gray = newChildren(0), imgWidth = newChildren(1),
      imgHeight = newChildren(2), factor = newChildren(3))
}

object BoxDownscale {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("gray", BinaryType, nullable = false)))

  /** k×k floor-average downscale; null for malformed input. The size
    * guard multiplies in LONG — `w * h` in int arithmetic can wrap to
    * g.length for adversarial dims and bypass the check entirely. */
  def downscale(g: Array[Byte], w: Int, h: Int, k: Int): InternalRow = {
    if (w <= 0 || h <= 0 || k <= 0 || g.length.toLong != w.toLong * h) return null
    // ceil-divide in long: w + k - 1 wraps in int when k is near MaxValue
    val ow = ((w.toLong + k - 1) / k).toInt
    val oh = ((h.toLong + k - 1) / k).toInt
    val out = new Array[Byte](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        val x1 = math.min(ox * k + k, w)
        val y1 = math.min(oy * k + k, h)
        // Long sum: a single k×k block can exceed 8.4M pixels (e.g.
        // whole-image pooling), where an int sum of 255s wraps silently
        var sum = 0L
        var cnt = 0L
        var y = oy * k
        while (y < y1) {
          var x = ox * k
          while (x < x1) {
            sum += g(y * w + x) & 0xff
            cnt += 1
            x += 1
          }
          y += 1
        }
        out(oy * ow + ox) = (sum / cnt).toByte
        ox += 1
      }
      oy += 1
    }
    InternalRow(ow, oh, out)
  }

  def boxDownscale(gray: Column, width: Column, height: Column,
                   k: Column): Column =
    ExprBridge.column(BoxDownscale(ExprBridge.expression(gray),
      ExprBridge.expression(width), ExprBridge.expression(height),
      ExprBridge.expression(k)))
}
