package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The box-filter downscale kernel on hand-built planes: golden
  * averages, odd-dimension edge blocks averaging over their actual
  * pixel count, k=1 identity, and malformed inputs returning NULL.
  * The end-to-end wrap→decode→resize path is the driver's q109 oracle. */
class BoxDownscaleSpec extends AnyFunSuite {

  private def plane(vals: Int*): Array[Byte] = vals.map(_.toByte).toArray

  test("2x2 golden: floor-averages per block") {
    // 4x2 plane, two 2x2 blocks: (10,20,30,41)->25 ; (100,101,102,104)->101
    val row = BoxDownscale.downscale(
      plane(10, 20, 100, 101, 30, 41, 102, 104), 4, 2, 2)
    assert(row != null)
    assert(row.getInt(0) === 2 && row.getInt(1) === 1)
    assert(row.getBinary(2).toSeq === plane(25, 101).toSeq)
  }

  test("odd dimensions: edge blocks average their actual pixels") {
    // 3x3, k=2 -> 2x2: blocks are 2x2, 1x2, 2x1, 1x1
    val row = BoxDownscale.downscale(
      plane(1, 3, 5,
            7, 9, 11,
            13, 15, 17), 3, 3, 2)
    assert(row != null)
    assert(row.getInt(0) === 2 && row.getInt(1) === 2)
    // (1+3+7+9)/4=5 ; (5+11)/2=8 ; (13+15)/2=14 ; (17)/1=17
    assert(row.getBinary(2).toSeq === plane(5, 8, 14, 17).toSeq)
  }

  test("k=1 is the identity; values above 127 stay unsigned") {
    val g = plane(0, 255, 128, 200)
    val row = BoxDownscale.downscale(g, 2, 2, 1)
    assert(row.getBinary(2).toSeq === g.toSeq)
    // all four average: (0+255+128+200)/4 = 145
    val one = BoxDownscale.downscale(g, 2, 2, 2)
    assert(one.getBinary(2).toSeq === plane(145).toSeq)
  }

  test("malformed input returns NULL, never garbage") {
    assert(BoxDownscale.downscale(plane(1, 2, 3), 2, 2, 2) == null) // size mismatch
    assert(BoxDownscale.downscale(plane(1, 2, 3, 4), 0, 4, 2) == null)
    assert(BoxDownscale.downscale(plane(1, 2, 3, 4), 2, 2, 0) == null)
    // adversarial dims whose int product wraps to g.length must not
    // pass the guard (65536*65536 == 0 in int arithmetic)
    assert(BoxDownscale.downscale(Array.empty[Byte], 65536, 65536, 2) == null)
    // k near MaxValue: ceil-divide must not wrap negative
    val id = BoxDownscale.downscale(plane(7), 1, 1, Int.MaxValue)
    assert(id != null && id.getBinary(2).toSeq === plane(7).toSeq)
  }

  test("whole-image pooling of a >8.4M-pixel block does not wrap the sum") {
    // 4096x4096 all-255: int sum would wrap at 255*16.7M ≈ 4.3e9
    val g = Array.fill(4096 * 4096)(255.toByte)
    val row = BoxDownscale.downscale(g, 4096, 4096, 4096)
    assert(row.getInt(0) === 1 && row.getInt(1) === 1)
    assert((row.getBinary(2)(0) & 0xff) === 255)
  }
}
