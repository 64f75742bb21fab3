package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.ImageCodec.{ImageMeta, Unparsed}

class MultimodalSpec extends SparkSpec {

  private def bytes(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // -----------------------------------------------------------------
  // Parser golden tests: hand-written wire-format byte streams.

  test("parses a real PNG IHDR (width/height/bit depth, big-endian)") {
    // signature ‖ IHDR(len=13) with w=2, h=3, bd=8, colour 2
    val png = bytes(
      "89504E470D0A1A0A" + "0000000D49484452" +
        "00000002" + "00000003" + "08" + "02" + "000000" + "DEADBEEF")
    assert(ImageCodec.parse(png) === ImageMeta("png", 2, 3, 8))
  }

  test("PNG chunk walk skips a leading ancillary chunk") {
    // tEXt(4 bytes) placed before IHDR — non-conforming order, but the
    // generic length‖type‖data‖CRC walk still lands on IHDR.
    val png = bytes(
      "89504E470D0A1A0A" +
        "00000004" + "74455874" + "41424344" + "00000000" + // tEXt
        "0000000D49484452" + "00000280" + "000001E0" + "10" + "02" +
        "000000" + "00000000")
    assert(ImageCodec.parse(png) === ImageMeta("png", 640, 480, 16))
  }

  test("parses a real JPEG: APP0 + COM before SOF0, fill bytes skipped") {
    val jpeg = bytes(
      "FFD8" + // SOI
        "FFE0" + "0004" + "4A46" + // APP0, len 4 (2 data bytes)
        "FF" + // fill byte before next marker (T.81 §B.1.1.2)
        "FFFE" + "0005" + "414243" + // COM, len 5 (3 data bytes)
        "FFC0" + "0011" + "08" + "01E0" + "0280" +
        "03011100021101031101" + // SOF0: prec 8, h 480, w 640
        "FFD9")
    assert(ImageCodec.parse(jpeg) === ImageMeta("jpeg", 640, 480, 8))
  }

  test("progressive SOF2 is recognized as a frame header") {
    val jpeg = bytes(
      "FFD8" + "FFC2" + "000B" + "10" + "0008" + "0010" + "01011100" +
        "FFD9")
    assert(ImageCodec.parse(jpeg) === ImageMeta("jpeg", 16, 8, 16))
  }

  test("malformed payloads parse to Unparsed, never throw") {
    assert(ImageCodec.parse(Array.emptyByteArray) === Unparsed)
    assert(ImageCodec.parse(bytes("89504E47")) === Unparsed) // cut signature
    assert(ImageCodec.parse(bytes("89504E470D0A1A0A" + "0000000D4948")) ===
      Unparsed) // truncated mid-chunk-header
    assert(ImageCodec.parse(bytes("FFD8FFDA0002")) === Unparsed) // SOS first
    assert(ImageCodec.parse(bytes("FFD8FFFE0001")) === Unparsed) // len < 2
    assert(ImageCodec.parse(bytes("00010203")) === Unparsed) // no magic
    assert(ImageCodec.parse(bytes( // width FFFFFFFF > 2^31-1 spec cap
      "89504E470D0A1A0A" + "0000000D49484452" +
        "FFFFFFFF" + "00000003" + "08" + "02" + "000000" + "00000000")) ===
      Unparsed)
  }

  // -----------------------------------------------------------------
  // Pipeline: synthesized streams round-trip through the real parser.

  test("synthesized streams parse back to the planted geometry") {
    val rows = Multimodal.decodeStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expFormat = if (id % 2 == 0) "png" else "jpeg"
      val expBd =
        if (id % 2 == 1) 8L else if ((id / 2) % 2 == 0) 8L else 16L
      assert(r.getAs[String]("format") === expFormat)
      assert(r.getAs[Long]("width") === 1 + id % 640)
      assert(r.getAs[Long]("height") === 1 + id % 480)
      assert(r.getAs[Long]("bit_depth") === expBd)
    }
  }

  test("a body past MaxComBytes spills after EOI and still parses") {
    import spark.implicits._
    val long = "a" * (Multimodal.MaxComBytes.toInt + 1000)
    val media = Multimodal.toMedia(
      Seq((1L, long)).toDF("doc_id", "text")).head()
    assert(ImageCodec.parse(media.payload) === ImageMeta("jpeg", 2, 2, 8))
    // SOI(2) + COM(4 + MaxComBytes) + SOF0(19) + EOI(2) + trailing(1000)
    assert(media.payload.length === 27 + Multimodal.MaxComBytes + 1000)
  }

  test("frame sampling emits ceil(n/stride) frames per payload") {
    val media = Multimodal.mediaRecords(spark, sf)
    val lens = media.collect().map(m => m.doc_id -> m.payload.length).toMap
    val counts = Multimodal.sampleFrames(media)
      .groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    lens.foreach { case (id, n) =>
      val expected = (n + Multimodal.Stride - 1) / Multimodal.Stride
      assert(counts.getOrElse(id, 0L) === expected.toLong)
    }
  }

  test("binary metadata digest matches java.security over hex(payload)") {
    val payload = Multimodal.mediaRecords(spark, sf)
      .filter(col("doc_id") === 0).head().payload
    val hexStr = payload.map(b => f"$b%02X").mkString
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest(hexStr.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val r = Multimodal.binaryMeta(spark, sf)
      .filter(col("doc_id") === 0).head()
    assert(r.getAs[String]("sha256_hex") === md)
    assert(r.getAs[Long]("first_byte") === 0x89L)
    assert(r.getAs[Long]("n_bytes") === payload.length.toLong)
  }
}
