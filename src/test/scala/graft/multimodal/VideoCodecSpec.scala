package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** GRAFT-VC codec properties the oracle row can't pin: bitstream
  * round-trip fidelity, the loud-failure framing walk, and the
  * Exp-Golomb layer's exactness over the signed coefficient range.
  */
class VideoCodecSpec extends AnyFunSuite {

  private def frames(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(Multimodal.VideoFrameBytes * n)(i =>
      ((i * seed + 7 * (i % 13)) % 256).toByte)

  test("encode → decode reconstructs every pixel within 1 grey level " +
    "(near-lossless at QuantStep 2^22)") {
    val p = frames(4, 131)
    val dec = VideoCodec.decodeStream(VideoCodec.encodeStream(p))
    assert(dec.length === 4)
    for (f <- 0 until 4; i <- 0 until Multimodal.VideoFrameBytes) {
      val orig = p(f * Multimodal.VideoFrameBytes + i) & 0xff
      val got = dec(f)(i)
      assert(math.abs(got - orig) <= 1,
        s"frame $f px $i: $orig decoded as $got")
    }
  }

  test("flat and extreme frames survive exactly (DC-only content; " +
    "clamp edges 0 and 255)") {
    for (v <- Seq(0, 1, 127, 254, 255)) {
      val p = Array.fill(Multimodal.VideoFrameBytes)(v.toByte)
      val dec = VideoCodec.decodeStream(VideoCodec.encodeStream(p))
      assert(dec.head.forall(px => math.abs(px - v) <= 1),
        s"flat-$v frame reconstructed ${dec.head.toSeq.distinct}")
    }
  }

  test("a sub-frame tail is dropped (no-full-frame convention) and " +
    "an empty payload codes to an empty stream") {
    assert(VideoCodec.encodeStream(Array.empty[Byte]).isEmpty)
    val p = frames(2, 37) ++ Array.fill(10)(5.toByte)
    assert(VideoCodec.decodeStream(VideoCodec.encodeStream(p))
      .length === 2)
  }

  test("the framing walk fails loudly: bad magic, truncated header, " +
    "length past the buffer") {
    val good = VideoCodec.encodeStream(frames(1, 53))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](
      VideoCodec.decodeStream(badMagic))
    intercept[IllegalArgumentException](
      VideoCodec.decodeStream(good.take(3))) // truncated header
    val badLen = good.clone()
    badLen(4) = 0x7f.toByte // length far past the buffer
    intercept[IllegalArgumentException](
      VideoCodec.decodeStream(badLen))
  }

  test("quantized coefficients round-trip the entropy layer exactly " +
    "(decode(encode(frame)) re-quantizes to the same coefficients)") {
    val p = frames(3, 91)
    val fb = Multimodal.VideoFrameBytes
    val dec = VideoCodec.decodeStream(VideoCodec.encodeStream(p))
    for (f <- 0 until 3) {
      val px = Array.tabulate(fb)(i => p(f * fb + i) & 0xff)
      val qc = VideoCodec.quantCoefs(px, 0)
      // The decoded pixels are exactly reconstruct(qc): the bitstream
      // carried every signed coefficient losslessly.
      assert(dec(f).toSeq === VideoCodec.reconstruct(qc).toSeq)
    }
  }
}
