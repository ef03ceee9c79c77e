package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._

/** REAL video container demux for the multimodal pipeline
  * ([[graft.multimodal.Multimodal]]'s decode seam, video half): parse an
  * AVI (RIFF) binary — the container walk every video pipeline runs
  * BEFORE any codec — to
  * `struct(width INT, height INT, n_frames BIGINT, frames ARRAY<BINARY>)`:
  * stream dimensions and declared frame count from the `avih` main
  * header, plus each frame's raw payload bytes lifted out of the `movi`
  * chunk list. No codec is invoked (the JDK ships none for video, and
  * none is needed here): demux is pure byte-exact structure — chunk
  * fourccs, little-endian sizes, RIFF word padding — which is precisely
  * the deterministic part of a video ingest stage; per-frame PIXEL
  * decode stays behind the documented stub seam where a JNI/FFmpeg
  * binding would sit in production.
  *
  * Strictness: NULL (not garbage) for anything that is not a
  * well-formed AVI — bad magic, truncated chunks, sizes past the
  * buffer, or a frame count disagreeing with the movi list. Corrupt
  * web-crawled media filters out with `isNotNull`, the q84/DecodeImage
  * posture.
  *
  * CodegenFallback + scale shape: same reasoning as [[DecodeAudio]] —
  * one projection per row, the wide content column prunes away after
  * the frames/stats flow on, no shuffle anywhere.
  */
case class DecodeVideo(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${t.sql}")
  }

  override def dataType: DataType = DecodeVideo.schema
  override def nullable: Boolean = true
  override def prettyName: String = "decode_video"

  override def nullSafeEval(input: Any): Any =
    DecodeVideo.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): DecodeVideo =
    copy(child = newChild)
}

object DecodeVideo {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("frames", ArrayType(BinaryType, containsNull = false),
      nullable = false)))

  /** Demux one AVI asset; null when not a well-formed AVI. */
  def decode(bytes: Array[Byte]): InternalRow = {
    try {
      def u32(o: Int): Long =
        ((bytes(o) & 0xffL)) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def cc(o: Int): String = new String(bytes, o, 4, "US-ASCII")

      require(bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ")
      val end = math.min(bytes.length.toLong, 8L + u32(4)).toInt

      var width = -1
      var height = -1
      var declared = -1L
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

      // one RIFF chunk walker serves every nesting level; `inMovi` marks
      // the frame list, where '##db'/'##dc' chunks are frame payloads.
      // Real AVIs nest ≤ 3 lists deep; the depth cap turns an
      // adversarially deep-nested input into "corrupt" (→ NULL via the
      // require) instead of a StackOverflowError — an Error would
      // escape the Exception catch below and kill the task.
      def walk(start: Int, lim: Int, inMovi: Boolean, depth: Int = 0): Unit = {
        require(depth <= 16) // not a well-formed AVI
        var off = start
        while (off + 8 <= lim) {
          val id = cc(off)
          val sz = u32(off + 4).toInt
          val dataOff = off + 8
          require(sz >= 0 && dataOff + sz <= lim) // truncated = corrupt
          if (id == "LIST") {
            require(sz >= 4)
            val lt = cc(dataOff)
            // descend into the lists that matter; unknown lists skip
            if (lt == "hdrl" || lt == "strl" || lt == "movi" || lt == "rec ")
              walk(dataOff + 4, dataOff + sz, inMovi || lt == "movi", depth + 1)
          } else if (id == "avih") {
            require(sz >= 40) // AVIMAINHEADER through dwHeight
            declared = u32(dataOff + 16) // dwTotalFrames
            width = u32(dataOff + 32).toInt // dwWidth
            height = u32(dataOff + 36).toInt // dwHeight
          } else if (inMovi && id.length == 4 &&
              id(0).isDigit && id(1).isDigit &&
              (id.endsWith("db") || id.endsWith("dc"))) {
            frames += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + sz)
          }
          off = dataOff + sz + (sz & 1) // RIFF pads chunks to word size
        }
      }
      walk(12, end, inMovi = false)

      require(width > 0 && height > 0 && declared >= 0 &&
        frames.size.toLong == declared)
      InternalRow(width, height, frames.size.toLong,
        new GenericArrayData(frames.toArray[Any]))
    } catch { case _: Exception => null } // not a well-formed AVI
  }

  def decodeVideo(c: Column): Column =
    ExprBridge.column(DecodeVideo(ExprBridge.expression(c)))
}
