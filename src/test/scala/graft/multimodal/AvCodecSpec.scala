package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contracts of the RIFF/BMFF walkers, including the
  * malformed-stream cases a crawl corpus actually contains.
  */
class AvCodecSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def le(v: Long, n: Int): String =
    (0 until n).map(i => f"${(v >> (8 * i)) & 0xff}%02X").mkString

  private def be(v: Long, n: Int): String =
    ((n - 1) to 0 by -1).map(i => f"${(v >> (8 * i)) & 0xff}%02X").mkString

  private def wav(dataHex: String, extraChunk: String = ""): Array[Byte] = {
    val fmt = "666D7420" + le(16, 4) + le(1, 2) + le(2, 2) +
      le(44100, 4) + le(44100 * 2 * 2, 4) + le(4, 2) + le(16, 2)
    val data = "64617461" + le(dataHex.length / 2, 4) + dataHex +
      (if (dataHex.length / 2 % 2 == 1) "00" else "") // RIFF pad byte
    val body = "57415645" + fmt + extraChunk + data
    hex("52494646" + le(body.length / 2, 4) + body)
  }

  test("wav: fmt fields recovered; odd-sized data chunk is " +
      "word-aligned; unknown chunks skipped") {
    // LIST chunk (unknown to the parser) between fmt and an odd data.
    val unknown = "4C495354" + le(3, 4) + "AABBCC" + "00" // padded
    val m = AvCodec.parse(wav("0102030405", unknown))
    assert(m.format == "wav" && m.channels == 2 &&
      m.sampleRate == 44100 && m.bits == 16 && m.dataBytes == 5)
    assert(m.timescale == -1 && m.duration == -1)
  }

  private def mp4(mvhdVersion: Int, largesizeMdat: Boolean,
      mdatToEof: Boolean = false): Array[Byte] = {
    val mvhdBody =
      if (mvhdVersion == 0)
        "00000000" + be(0, 4) + be(0, 4) + be(90000, 4) + be(1234, 4)
      else
        "01000000" + be(0, 8) + be(0, 8) + be(90000, 4) + be(56789, 8)
    val mvhd = be(8 + mvhdBody.length / 2, 4) + "6D766864" + mvhdBody
    val moov = be(8 + mvhd.length / 2, 4) + "6D6F6F76" + mvhd
    val payload = "DEADBEEF"
    val mdat =
      if (largesizeMdat)
        be(1, 4) + "6D646174" + be(16 + payload.length / 2, 8) + payload
      else if (mdatToEof) be(0, 4) + "6D646174" + payload
      else be(8 + payload.length / 2, 4) + "6D646174" + payload
    hex(be(16, 4) + "66747970" + "69736F6D" + "00000200" + moov + mdat)
  }

  test("mp4: v0 and v1 mvhd layouts, plain / largesize / to-EOF mdat") {
    val m0 = AvCodec.parse(mp4(0, largesizeMdat = false))
    assert(m0.format == "mp4" && m0.timescale == 90000 &&
      m0.duration == 1234 && m0.dataBytes == 4)
    assert(m0.channels == -1 && m0.sampleRate == -1)
    val m1 = AvCodec.parse(mp4(1, largesizeMdat = false))
    assert(m1.timescale == 90000 && m1.duration == 56789)
    // size==1: 64-bit largesize header (16 bytes) — payload still 4.
    assert(AvCodec.parse(mp4(0, largesizeMdat = true)).dataBytes == 4)
    // size==0: box runs to EOF.
    assert(AvCodec.parse(mp4(0, largesizeMdat = false,
      mdatToEof = true)).dataBytes == 4)
  }

  test("decodeMdat: payload recovered byte-for-byte under plain / " +
      "largesize / to-EOF framing; missing mdat fails loudly") {
    val plain = AvCodec.decodeMdat(mp4(0, largesizeMdat = false))
    assert(plain.length == 4)
    assert(plain.toSeq ==
      AvCodec.decodeMdat(mp4(0, largesizeMdat = true)).toSeq)
    assert(plain.toSeq ==
      AvCodec.decodeMdat(mp4(0, largesizeMdat = false,
        mdatToEof = true)).toSeq)
    // a container with no mdat (ftyp only) fails with the loud error
    val e = intercept[IllegalArgumentException](AvCodec.decodeMdat(
      hex("00000014" + "66747970" + "69736F6D" + "00000200" +
        "69736F6D")))
    assert(e.getMessage.contains("mdat"))
  }

  test("malformed streams fail loudly, never loop or mis-parse") {
    def bad(b: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](AvCodec.parse(b))
    bad(Array.emptyByteArray)
    bad(hex("52494646" + le(100, 4) + "41424344")) // RIFF but not WAVE
    bad("plain text, no container".getBytes("UTF-8"))
    // WAV truncated inside the fmt chunk.
    bad(hex("52494646" + le(30, 4) + "57415645" + "666D7420" + le(16, 4)
      + "0100"))
    // WAV with a fmt chunk shorter than the PCM header.
    bad(hex("52494646" + le(24, 4) + "57415645" + "666D7420" + le(4, 4)
      + "00000000" + "64617461" + le(0, 4)))
    // MP4 box whose size overruns the container.
    bad(hex(be(16, 4) + "66747970" + "69736F6D" + "00000200" +
      be(9999, 4) + "6D6F6F76"))
    // MP4 box with size < header (would loop without the guard).
    bad(hex(be(16, 4) + "66747970" + "69736F6D" + "00000200" +
      be(2, 4) + "6D646174"))
    // MP4 with moov but no mdat.
    bad(mp4(0, largesizeMdat = false).dropRight(12 + 4))
  }

  /** 8-bit mono WAV for the unsigned-sample interpretation case. */
  private def wav8(dataHex: String): Array[Byte] = {
    val fmt = "666D7420" + le(16, 4) + le(1, 2) + le(1, 2) +
      le(8000, 4) + le(8000, 4) + le(1, 2) + le(8, 2)
    val data = "64617461" + le(dataHex.length / 2, 4) + dataHex +
      (if (dataHex.length / 2 % 2 == 1) "00" else "")
    val body = "57415645" + fmt + data
    hex("52494646" + le(body.length / 2, 4) + body)
  }

  test("decodePcm: 16-bit samples are signed LE; trailing odd byte " +
      "is not a sample") {
    // bytes 01 02 | 03 04 | 05 → samples 0x0201, 0x0403; 05 dropped.
    val p = AvCodec.decodePcm(wav("0102030405"))
    assert(p.channels == 2 && p.sampleRate == 44100 && p.bits == 16)
    assert(p.samples.toSeq == Seq(0x0201, 0x0403))
    // FF FF → −1; 00 80 → −32768 (sign bit in the high byte).
    assert(AvCodec.decodePcm(wav("FFFF0080")).samples.toSeq ==
      Seq(-1, -32768))
  }

  test("decodePcm: 8-bit samples are unsigned, centered at 128") {
    val p = AvCodec.decodePcm(wav8("0080FF"))
    assert(p.channels == 1 && p.bits == 8)
    assert(p.samples.toSeq == Seq(-128, 0, 127))
  }

  test("decodePcm: unsupported depth and overrunning data fail loudly") {
    // 24-bit fmt: rewrite the bits field of a 16-bit wav.
    val fmt24 = "666D7420" + le(16, 4) + le(1, 2) + le(2, 2) +
      le(44100, 4) + le(44100 * 2 * 3, 4) + le(6, 2) + le(24, 2)
    val body24 = "57415645" + fmt24 + "64617461" + le(2, 4) + "0102"
    val w24 = hex("52494646" + le(body24.length / 2, 4) + body24)
    assert(AvCodec.parse(w24).bits == 24) // header walk is fine with it
    intercept[IllegalArgumentException](AvCodec.decodePcm(w24))
    // data size field claims more bytes than the stream carries: the
    // header walk reports the size as-is, the decode refuses.
    val bodyTr = "57415645" + fmt24.replace(le(24, 2), le(16, 2)) +
      "64617461" + le(100, 4) + "0102"
    val wTr = hex("52494646" + le(200, 4) + bodyTr)
    assert(AvCodec.parse(wTr).dataBytes == 100)
    intercept[IllegalArgumentException](AvCodec.decodePcm(wTr))
    intercept[IllegalArgumentException](
      AvCodec.decodePcm(mp4(0, largesizeMdat = false))) // not RIFF
  }

  test("synthesized corpus payloads parse to the planted parameters") {
    val s = graft.GraftSession.local("2", "2")
    import org.apache.spark.sql.functions._
    import s.implicits._
    val docs = Seq((0L, "even wav doc"), (1L, "odd mp4 doc"),
      (7L, "x")).toDF("doc_id", "text")
    val parsed = Multimodal.toAvMedia(docs).collect()
      .map(r => r.doc_id -> AvCodec.parse(r.payload)).toMap
    assert(parsed(0L).format == "wav" && parsed(0L).channels == 1 &&
      parsed(0L).sampleRate == 8000 && parsed(0L).bits == 8 &&
      parsed(0L).dataBytes == 12)
    assert(parsed(1L).format == "mp4" && parsed(1L).timescale == 660 &&
      parsed(1L).duration == 11)
    assert(parsed(7L).timescale == 600 + 7 * 60)
  }
}
