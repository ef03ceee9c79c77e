package graft.functions

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._

/** REAL audio decode for the multimodal pipeline
  * ([[graft.multimodal.Multimodal]]'s decode seam, audio half): decode
  * an audio binary via the JDK's own codecs (`javax.sound.sampled` —
  * WAV, AIFF and AU containers with PCM/u-law/a-law payloads ship with
  * the JRE, no external libraries) to
  * `struct(sample_rate INT, channels INT, n_samples BIGINT, peak INT,
  * sum_sq BIGINT, pcm BINARY)`:
  * first-channel signed 16-bit samples (pcm, little-endian) plus the
  * exact-integer summary statistics every audio quality/filter stage
  * starts from (peak = max |sample|, sum_sq = Σ sample² — RMS and dBFS
  * derive from these without reparsing the waveform). NULL for bytes no
  * installed codec recognizes — corrupt assets filter out with
  * `isNotNull`, they don't kill the job.
  *
  * Determinism: PCM payloads are lossless — samples are container bytes,
  * bit-exact on any compliant JVM; u-law/a-law expand through the fixed
  * ITU table. (A lossy codec — MP3/AAC — is not in the JDK and would be
  * implementation-defined anyway; fingerprint those by content bytes,
  * the [[DecodeImage]] JPEG rule.)
  *
  * Why CodegenFallback, and the scale shape: same reasoning as
  * [[DecodeImage]] — the codec dwarfs call overhead; decode is a pure
  * per-row projection (no shuffle, no state) whose wide input column
  * prunes away the moment only the stats flow on.
  */
case class DecodeAudio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${t.sql}")
  }

  override def dataType: DataType = DecodeAudio.schema
  override def nullable: Boolean = true
  override def prettyName: String = "decode_audio"

  override def nullSafeEval(input: Any): Any =
    DecodeAudio.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): DecodeAudio =
    copy(child = newChild)
}

object DecodeAudio {

  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("pcm", BinaryType, nullable = false)))

  /** Decode one audio asset; null when undecodable. */
  def decode(bytes: Array[Byte]): InternalRow = {
    try {
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val f = raw.getFormat
      // normalize every payload (8-bit, u-law/a-law, big-endian…) to
      // signed 16-bit little-endian PCM at the source rate/channels —
      // the JDK converter is table/shift-based, fully deterministic
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
        f.getSampleRate, false)
      val pcmIn =
        if (f.matches(target)) raw
        else AudioSystem.getAudioInputStream(target, raw)
      val all = pcmIn.readAllBytes()
      val channels = target.getChannels
      val frameBytes = 2 * channels
      val nSamples = all.length / frameBytes
      val pcm = new Array[Byte](nSamples * 2)
      var peak = 0
      var sumSq = 0L
      var i = 0
      while (i < nSamples) {
        val lo = all(i * frameBytes) & 0xff
        val hi = all(i * frameBytes + 1) // channel 0; signed high byte
        val v = (hi << 8) | lo
        pcm(i * 2) = lo.toByte
        pcm(i * 2 + 1) = hi
        val a = math.abs(v)
        if (a > peak) peak = a
        sumSq += v.toLong * v.toLong
        i += 1
      }
      InternalRow(target.getSampleRate.toInt, channels, nSamples.toLong,
        peak, sumSq, pcm)
    } catch { case _: Exception => null } // unrecognized/corrupt audio
  }

  def decodeAudio(c: Column): Column =
    ExprBridge.column(DecodeAudio(ExprBridge.expression(c)))
}
