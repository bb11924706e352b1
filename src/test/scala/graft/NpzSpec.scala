package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Npz

/** npy/npz codec contract: float32 bits round-trip verbatim (including
  * NaN payloads, infinities, negative zero, denormals), headers follow the
  * v1.0 spec (64-byte data alignment), and malformed payloads fail loudly
  * instead of decoding garbage.
  */
class NpzSpec extends AnyFunSuite {

  private val edgeBits: Array[Float] = Array(
    0.0f, -0.0f, Float.MinPositiveValue, -Float.MinPositiveValue,
    Float.PositiveInfinity, Float.NegativeInfinity,
    java.lang.Float.intBitsToFloat(0x7fc00001), // NaN with payload
    java.lang.Float.intBitsToFloat(0xffc00123), // negative NaN, payload
    Float.MaxValue, -Float.MaxValue, 1.5f, -2.25e-38f)

  private def bits(a: Array[Float]): Seq[Int] =
    a.toSeq.map(java.lang.Float.floatToRawIntBits)

  test("npy round-trips float32 bit patterns verbatim") {
    assert(bits(Npz.parseNpy(Npz.npyBytes(edgeBits))) == bits(edgeBits))
    assert(Npz.parseNpy(Npz.npyBytes(Array.empty[Float])).isEmpty)
    val rnd = new scala.util.Random(42)
    val big = Array.fill(1000)(
      java.lang.Float.intBitsToFloat(rnd.nextInt()))
    assert(bits(Npz.parseNpy(Npz.npyBytes(big))) == bits(big))
  }

  test("npy header is v1.0 with 64-byte-aligned data offset") {
    for (len <- Seq(0, 1, 64, 65, 1000)) {
      val b = Npz.npyBytes(Array.fill(len)(1.0f))
      assert(b(6) == 1.toByte && b(7) == 0.toByte)
      val hlen = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
      assert((10 + hlen) % 64 == 0, s"data offset not aligned for len=$len")
    }
  }

  test("npz round-trips named entries in order") {
    val entries = Seq(
      "vec_1" -> Array(1.0f, 2.0f),
      "vec_2" -> edgeBits,
      "vec_30" -> Array.fill(64)(3.5f))
    val buf = new java.io.ByteArrayOutputStream()
    Npz.writeNpz(buf, entries.iterator)
    val back = Npz.readNpz(buf.toByteArray).toSeq
    assert(back.map(_._1) == entries.map(_._1))
    back.zip(entries).foreach { case ((_, a), (_, e)) =>
      assert(bits(a) == bits(e))
    }
  }

  test("malformed payloads are rejected") {
    intercept[IllegalArgumentException](Npz.parseNpy("nope".getBytes))
    val good = Npz.npyBytes(Array(1.0f, 2.0f))
    intercept[IllegalArgumentException](
      Npz.parseNpy(good.dropRight(4))) // truncated data vs declared shape
    val badVer = good.clone(); badVer(6) = 9
    intercept[IllegalArgumentException](Npz.parseNpy(badVer))
  }
}
