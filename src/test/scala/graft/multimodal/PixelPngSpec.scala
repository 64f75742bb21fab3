package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.ImageCodec.{decodePng, inflateStored}

/** Golden-filter and malformed-stream gates for the real PNG decode
  * (VERDICT r7 item 5's "Done" condition), plus a cross-check of the
  * synthesized streams against java.util.zip.Inflater — a REAL
  * inflater must accept our stored-block zlib and produce identical
  * scanlines.
  */
class PixelPngSpec extends SparkSpec {

  // --- tiny encoder twin (test-only): filter + wrap + frame --------
  private def adler32(d: Array[Byte]): Long = {
    var s1 = 1L; var s2 = 0L
    d.foreach { b => s1 = (s1 + (b & 0xff)) % 65521; s2 = (s2 + s1) % 65521 }
    (s2 << 16) | s1
  }

  private def zlibStored(raw: Array[Byte], block: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write(0x78); out.write(0x01)
    val n = raw.length
    val nblk = math.max(1, (n + block - 1) / block)
    for (j <- 0 until nblk) {
      val len = math.min(block, n - j * block)
      out.write(if (j == nblk - 1) 1 else 0)
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write(~len & 0xff); out.write((~len >> 8) & 0xff)
      out.write(raw, j * block, len)
    }
    val ad = adler32(raw)
    out.write(((ad >> 24) & 0xff).toInt); out.write(((ad >> 16) & 0xff).toInt)
    out.write(((ad >> 8) & 0xff).toInt); out.write((ad & 0xff).toInt)
    out.toByteArray
  }

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] =
    be32(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32(0)

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def png(w: Int, h: Int, scan: Array[Byte],
      idatSplit: Int = 0): Array[Byte] = {
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, 0, 0, 0, 0)
    val z = zlibStored(scan, 65535)
    val idats =
      if (idatSplit > 0 && idatSplit < z.length)
        chunk("IDAT", z.take(idatSplit)) ++ chunk("IDAT", z.drop(idatSplit))
      else chunk("IDAT", z)
    Sig ++ chunk("IHDR", ihdr) ++ idats ++ chunk("IEND", Array.empty)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter a pixel grid with a fixed type per row. */
  private def filterRows(w: Int, h: Int, px: Array[Int],
      ft: Int => Int): Array[Byte] = {
    val out = new Array[Byte](h * (w + 1))
    for (y <- 0 until h) {
      out(y * (w + 1)) = ft(y).toByte
      for (x <- 0 until w) {
        val cur = px(y * w + x)
        val a = if (x > 0) px(y * w + x - 1) else 0
        val b = if (y > 0) px((y - 1) * w + x) else 0
        val c = if (x > 0 && y > 0) px((y - 1) * w + x - 1) else 0
        val pred = ft(y) match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        out(y * (w + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    out
  }

  // Pixel values chosen to force every Paeth branch (a, b, and c
  // winners) and Average/Sub wraparound (values near 0 and 255).
  private val W3 = 3
  private val Px = Array(
    10, 250, 3,
    200, 7, 255,
    0, 128, 64)

  test("golden filters: each type round-trips the pixel grid") {
    for (t <- 0 to 4) {
      val img = decodePng(png(W3, 3, filterRows(W3, 3, Px, _ => t)))
      assert(img.pixels.toSeq === Px.toSeq, s"filter $t")
      assert(img.width === 3 && img.height === 3)
    }
    // mixed types per row, the gate-path shape
    val img = decodePng(png(W3, 3, filterRows(W3, 3, Px, y => y % 5)))
    assert(img.pixels.toSeq === Px.toSeq)
  }

  test("multiple IDAT chunks concatenate per the spec") {
    val scan = filterRows(W3, 3, Px, y => (y + 2) % 5)
    val whole = decodePng(png(W3, 3, scan))
    val split = decodePng(png(W3, 3, scan, idatSplit = 5))
    assert(split.pixels.toSeq === whole.pixels.toSeq)
    assert(split.adler === whole.adler)
  }

  test("malformed streams fail loudly, each with its own reason") {
    val scan = filterRows(W3, 3, Px, _ => 0)
    def mutate(f: Array[Byte] => Array[Byte]) =
      intercept[IllegalArgumentException](decodePng(f(png(W3, 3, scan))))
    // corrupt NLEN (byte 4 of the deflate block header inside IDAT):
    // locate zlib start = sig(8) + IHDR chunk(12+13) + IDAT hdr(8)
    val zoff = 8 + 25 + 8
    assert(mutate { b => val c = b.clone; c(zoff + 2 + 3) =
      (c(zoff + 2 + 3) ^ 0xff).toByte; c }
      .getMessage.contains("NLEN"))
    // corrupt a data byte -> Adler mismatch
    assert(mutate { b => val c = b.clone; c(zoff + 2 + 5) =
      (c(zoff + 2 + 5) + 1).toByte; c }
      .getMessage.contains("Adler"))
    // claim a compressed block type
    assert(mutate { b => val c = b.clone; c(zoff + 2) =
      (c(zoff + 2) | 2).toByte; c }
      .getMessage.contains("stored"))
    // break the zlib header check bits
    assert(mutate { b => val c = b.clone; c(zoff + 1) =
      (c(zoff + 1) + 1).toByte; c }
      .getMessage.contains("check"))
    // bad filter type byte (5) on row 0
    val badScan = scan.clone; badScan(0) = 5
    assert(intercept[IllegalArgumentException](
      decodePng(png(W3, 3, badScan))).getMessage.contains("filter type"))
    // stream length disagrees with H*(W+1)
    assert(intercept[IllegalArgumentException](
      decodePng(png(W3, 4, scan))).getMessage.contains("H*(W+1)"))
    // truncated: drop the trailing adler byte
    assert(intercept[IllegalArgumentException](
      inflateStored(zlibStored(scan, 65535).dropRight(1)))
      .getMessage.nonEmpty)
  }

  test("empty document: the encoder floors height at 1 (an all-" +
      "padding row) and the round trip stays total") {
    val hx = PixelPng.encodePng("")
    val bytes = hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val img = decodePng(bytes)
    assert(img.width === PixelPng.PixW && img.height === 1)
    assert(img.pixels.forall(_ == 0))
  }

  test("a chunk whose declared length overruns the payload fails " +
      "loudly, not with IndexOutOfBounds") {
    val scan = filterRows(W3, 3, Px, _ => 0)
    val good = png(W3, 3, scan)
    // inflate the declared IDAT length without adding bytes
    val c = good.clone
    val idatLenOff = 8 + 25 // after sig + IHDR chunk
    c(idatLenOff + 2) = 0x7f.toByte // length high bytes → huge
    val e = intercept[IllegalArgumentException](decodePng(c))
    assert(e.getMessage.contains("overruns"))
  }

  test("synthesized gate payloads: a REAL inflater (java.util.zip) " +
      "accepts the stored-block zlib and yields the same scanlines") {
    val rows = PixelPng.pages(spark, sf)
      .limit(20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("png_hex")))
    assert(rows.nonEmpty)
    rows.foreach { case (id, hx) =>
      val bytes = hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      // engine decode
      val img = decodePng(bytes)
      // extract the IDAT zlib, inflate with java.util.zip
      var off = 8
      val idat = new java.io.ByteArrayOutputStream
      while (off + 8 <= bytes.length) {
        val len = ((bytes(off) & 0xff) << 24) | ((bytes(off+1) & 0xff) << 16) |
          ((bytes(off+2) & 0xff) << 8) | (bytes(off+3) & 0xff)
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        if (typ == "IDAT") idat.write(bytes, off + 8, len)
        off += 12 + len
      }
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val buf = new Array[Byte](1 << 16)
      val out = new java.io.ByteArrayOutputStream
      var n = inf.inflate(buf)
      while (n > 0) { out.write(buf, 0, n); n = inf.inflate(buf) }
      assert(inf.finished(), s"doc $id: inflater not finished")
      inf.end()
      val scan = out.toByteArray
      assert(scan.length === img.height * (PixelPng.PixW + 1), s"doc $id")
      // our defilter of the java-inflated scanlines == engine pixels
      val (ours, _) = inflateStored(idat.toByteArray
        .slice(0, idat.toByteArray.length))
      assert(ours.toSeq === scan.toSeq, s"doc $id: scanline mismatch")
      // multi-block framing really happened for longer docs
      if (scan.length > PixelPng.BlockBytes)
        assert(idat.toByteArray.length >=
          2 + scan.length + 5 * 2 + 4, s"doc $id: expected >1 block")
    }
  }
}
