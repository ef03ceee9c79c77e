package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The AVI demuxer on hand-built containers: golden parse (dimensions,
  * declared count, exact frame bytes), RIFF word-padding on odd-size
  * frames, `rec ` list nesting, and the corrupt inputs that must return
  * NULL rather than garbage (bad magic, truncated chunk, frame count
  * disagreeing with the movi list). End-to-end hash verification is the
  * driver's q102 oracle. */
class DecodeVideoSpec extends AnyFunSuite {

  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def u32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    cc(id) ++ u32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def list(kind: String, content: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(kind) ++ content)

  /** Minimal AVI: avih(width, height, n) + movi with the given frames. */
  private def avi(width: Int, height: Int, declared: Int,
      frames: Seq[Array[Byte]], wrapRec: Boolean = false): Array[Byte] = {
    val avih = chunk("avih",
      u32(40000) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(declared) ++ u32(0) ++
        u32(1) ++ u32(0) ++ u32(width) ++ u32(height) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih)
    val frameChunks = frames.zipWithIndex
      .flatMap { case (f, i) => chunk(f"$i%02ddb", f) }.toArray
    val movi = list("movi",
      if (wrapRec) list("rec ", frameChunks) else frameChunks)
    val content = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ u32(content.length) ++ content
  }

  private def dec(bytes: Array[Byte]) = DecodeVideo.decode(bytes)

  test("golden parse: dimensions, count, exact frame bytes") {
    val f0 = Array.tabulate(16)(i => i.toByte)
    val f1 = Array.tabulate(16)(i => (i + 100).toByte)
    val row = dec(avi(2, 2, 2, Seq(f0, f1)))
    assert(row != null)
    assert(row.getInt(0) === 2 && row.getInt(1) === 2 && row.getLong(2) === 2L)
    val frames = row.getArray(3)
    assert(frames.getBinary(0).toSeq === f0.toSeq)
    assert(frames.getBinary(1).toSeq === f1.toSeq)
  }

  test("odd-size frames honor RIFF word padding") {
    val f0 = Array[Byte](1, 2, 3) // 3 bytes -> padded chunk
    val f1 = Array[Byte](9, 8, 7, 6, 5)
    val row = dec(avi(4, 3, 2, Seq(f0, f1)))
    assert(row != null)
    assert(row.getArray(3).getBinary(0).toSeq === f0.toSeq)
    assert(row.getArray(3).getBinary(1).toSeq === f1.toSeq)
  }

  test("frames inside a 'rec ' list are still found") {
    val f = Array.tabulate(8)(_.toByte)
    val row = dec(avi(1, 1, 1, Seq(f), wrapRec = true))
    assert(row != null && row.getLong(2) === 1L)
    assert(row.getArray(3).getBinary(0).toSeq === f.toSeq)
  }

  test("corruption returns NULL, never garbage") {
    val good = avi(2, 2, 2,
      Seq(Array.tabulate(16)(_.toByte), Array.tabulate(16)(_.toByte)))
    assert(dec(good) != null)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(dec(badMagic) == null)
    // truncated: a chunk size now points past the buffer
    assert(dec(good.dropRight(10)) == null)
    // declared frame count disagrees with the movi list
    assert(dec(avi(2, 2, 3, Seq(Array.tabulate(16)(_.toByte)))) == null)
    // zero dimensions
    assert(dec(avi(0, 2, 1, Seq(Array[Byte](1, 2)))) == null)
    // not even RIFF-sized
    assert(dec(Array[Byte](1, 2, 3)) == null)
  }

  test("adversarially deep LIST nesting returns NULL, not StackOverflowError") {
    // 1000 nested 'LIST<size>rec ' levels: real AVIs nest <= 3; the
    // walker's depth cap must classify this as corrupt (null), because
    // a StackOverflowError would escape the Exception catch
    val n = 1000
    val buf = new Array[Byte](n * 12)
    var off = 0
    for (j <- 0 until n) {
      val size = 4 + 12 * (n - j - 1)
      cc("LIST").copyToArray(buf, off)
      u32(size).copyToArray(buf, off + 4)
      cc("rec ").copyToArray(buf, off + 8)
      off += 12
    }
    val content = cc("AVI ") ++ buf
    assert(dec(cc("RIFF") ++ u32(content.length) ++ content) == null)
  }
}
