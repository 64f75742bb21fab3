package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Baseline-DCT JPEG decode, gated by DIFFERENTIAL against
  * javax.imageio (the PixelPngSpec Inflater discipline — a second,
  * independent, libjpeg-lineage implementation reads the same
  * bytes):
  *
  *  - ImageIO-WRITTEN grayscale images (noise, gradient, flat;
  *    block-aligned and ragged sizes; two quality settings) decode to
  *    the same pixels within IDCT rounding (≤1), since the only
  *    implementation freedom left of the entropy layer is the IDCT;
  *  - HAND-BUILT DC-only streams (flat 8×8 tiles, exact by
  *    construction for every conforming IDCT) are decoded BIT-EXACTLY
  *    by both our decoder and ImageIO — including restart markers
  *    (DRI + RSTn + predictor reset), which ImageIO's writer cannot
  *    emit, and 4:2:0 chroma subsampling with a second quant table;
  *  - malformed shapes fail loudly, never garbage.
  */
class JpegCodecSpec extends AnyFunSuite {

  // ---- ImageIO helpers -------------------------------------------

  private def writeJpeg(img: java.awt.image.BufferedImage,
      q: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    val baos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    baos.toByteArray
  }

  private def grayImage(w: Int, h: Int,
      f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
    img
  }

  private def imageioGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO
      .read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not read the stream")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = img.getRaster.getSample(x, y, 0)
    (w, h, px)
  }

  // ---- hand-built DC-only encoder --------------------------------

  /** value → (code, length) for a canonical (bits, vals) table. */
  private def canonCodes(bits: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) {
        m(vals(k)) = (code, l); code += 1; k += 1
      }
      code <<= 1
    }
    m.toMap
  }

  /** Standard Annex K.3.1 DC luminance table. */
  private val DcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray

  /** Minimal AC table: the single code '0' (length 1) = EOB. */
  private val AcBits =
    Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Array(0x00)

  private final class BitWriter {
    val out = new java.io.ByteArrayOutputStream
    private var cur = 0
    private var n = 0
    def put(code: Int, len: Int): Unit =
      for (i <- len - 1 to 0 by -1) putBit((code >> i) & 1)
    private def putBit(b: Int): Unit = {
      cur = (cur << 1) | b; n += 1
      if (n == 8) { out.write(cur); if (cur == 0xff) out.write(0); cur = 0; n = 0 }
    }
    def pad(): Unit = while (n != 0) putBit(1)
    def marker(m: Int): Unit = { pad(); out.write(0xff); out.write(m) }
  }

  private def seg(marker: Int, body: Array[Byte]): Array[Byte] = {
    val len = body.length + 2
    Array(0xff.toByte, marker.toByte, ((len >> 8) & 0xff).toByte,
      (len & 0xff).toByte) ++ body
  }

  private val dcCodes = canonCodes(DcBits, DcVals)
  private val acCodes = canonCodes(AcBits, AcVals)

  private def putDc(bw: BitWriter, diff: Int): Unit = {
    val t = if (diff == 0) 0
      else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val (c, l) = dcCodes(t)
    bw.put(c, l)
    if (t > 0) {
      val v = if (diff >= 0) diff else diff + (1 << t) - 1
      bw.put(v, t)
    }
    val (ec, el) = acCodes(0x00) // EOB: all AC zero
    bw.put(ec, el)
  }

  private def dqt(tq: Int): Array[Byte] =
    seg(0xdb, (tq.toByte +: Array.fill(64)(16.toByte)))

  private def dht(): Array[Byte] =
    seg(0xc4,
      (0x00.toByte +: (DcBits.map(_.toByte) ++ DcVals.map(_.toByte))) ++
      (0x10.toByte +: (AcBits.map(_.toByte) ++ AcVals.map(_.toByte))))

  /** DC-only grayscale with flat 8×8 tiles and a restart interval.
    * Tile value v must be even; quantized DC = (v−128)/2 with Q=16,
    * so decode is exact in every conforming IDCT.
    */
  private def buildGray(w: Int, h: Int, dri: Int,
      tile: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(dqt(0))
    out.write(seg(0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0)))
    out.write(dht())
    if (dri > 0)
      out.write(seg(0xdd, Array[Byte](((dri >> 8) & 0xff).toByte,
        (dri & 0xff).toByte)))
    out.write(seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)))
    val bw = new BitWriter
    val (mx, my) = (w / 8, h / 8)
    var pred = 0
    var mcu = 0
    var rst = 0
    for (ty <- 0 until my; tx <- 0 until mx) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        bw.marker(0xd0 + rst % 8); rst += 1; pred = 0
      }
      val q = (tile(tx, ty) - 128) / 2
      putDc(bw, q - pred)
      pred = q
      mcu += 1
    }
    bw.pad()
    out.write(bw.out.toByteArray)
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** DC-only 4:2:0 YCbCr: Y = flat 8×8 tiles, Cb = Cr = 128 (so any
    * conforming color pipeline returns RGB == Y exactly), Y on quant
    * table 0, chroma on table 1.
    */
  private def build420(w: Int, h: Int,
      tile: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write(Array(0xff, 0xd8).map(_.toByte))
    out.write(dqt(0)); out.write(dqt(1))
    out.write(seg(0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)))
    out.write(dht())
    out.write(seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x00, 3, 0x00,
      0, 63, 0)))
    val bw = new BitWriter
    val (mcx, mcy) = (w / 16, h / 16)
    val pred = Array(0, 0, 0)
    for (my <- 0 until mcy; mx <- 0 until mcx) {
      for (by <- 0 until 2; bx <- 0 until 2) {
        val q = (tile(2 * mx + bx, 2 * my + by) - 128) / 2
        putDc(bw, q - pred(0)); pred(0) = q
      }
      putDc(bw, -pred(1)); pred(1) = 0 // Cb: flat 128 → q = 0
      putDc(bw, -pred(2)); pred(2) = 0 // Cr
    }
    bw.pad()
    out.write(bw.out.toByteArray)
    out.write(Array(0xff, 0xd9).map(_.toByte))
    out.toByteArray
  }

  // ---- the gates -------------------------------------------------

  test("differential vs ImageIO: grayscale noise/gradient/flat at " +
    "two qualities and ragged sizes decode within IDCT rounding") {
    val rnd = new scala.util.Random(42)
    val cases = Seq[(Int, Int, (Int, Int) => Int)](
      (8, 8, (_, _) => 77),
      (16, 16, (x, y) => (x * 16 + y * 3) % 256),
      (64, 64, (_, _) => rnd.nextInt(256)),
      (17, 23, (x, y) => (x * x + 5 * y) % 256), // ragged: partial MCUs
      (40, 24, (x, y) => if ((x / 8 + y / 8) % 2 == 0) 30 else 220))
    for ((w, h, f) <- cases; q <- Seq(0.92f, 0.5f)) {
      val bytes = writeJpeg(grayImage(w, h, f), q)
      val ours = JpegCodec.decode(bytes)
      val (iw, ih, ref) = imageioGray(bytes)
      assert(ours.width == iw && ours.height == ih &&
        ours.width == w && ours.height == h)
      assert(ours.comps.length == 1)
      val diffs = ours.comps(0).zip(ref).map {
        case (a, b) => math.abs(a - b)
      }
      val maxd = diffs.max
      assert(maxd <= 1,
        s"${w}x$h q=$q: max pixel diff $maxd vs ImageIO " +
          s"(mean ${diffs.sum.toDouble / diffs.length})")
    }
  }

  test("hand-built DC-only grayscale with restart markers: exact " +
    "for our decoder AND for ImageIO on the same bytes") {
    def tile(tx: Int, ty: Int): Int = 128 + 2 * (((tx * 7 + ty * 13) % 50) - 25)
    val bytes = buildGray(32, 16, dri = 3, tile)
    val ours = JpegCodec.decode(bytes)
    val (iw, ih, ref) = imageioGray(bytes)
    assert(ours.width == 32 && ours.height == 16 && iw == 32 && ih == 16)
    for (y <- 0 until 16; x <- 0 until 32) {
      val want = tile(x / 8, y / 8)
      assert(ours.comps(0)(y * 32 + x) == want,
        s"our pixel ($x,$y): ${ours.comps(0)(y * 32 + x)} != $want")
      assert(ref(y * 32 + x) == want,
        s"ImageIO pixel ($x,$y): ${ref(y * 32 + x)} != $want")
    }
    // The restart machinery is genuinely on the wire.
    val hasRst = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 &&
        (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "construction must emit RSTn markers")
    // A wrong restart ordinal fails loudly (resync contract).
    val broken = bytes.clone()
    val ri = bytes.indices.find(i => i + 1 < bytes.length &&
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd0).get
    broken(ri + 1) = 0xd5.toByte
    intercept[IllegalArgumentException](JpegCodec.decode(broken))
  }

  test("hand-built 4:2:0 YCbCr with two quant tables: our planes " +
    "are exact; ImageIO RGB equals Y (chroma held neutral)") {
    def tile(tx: Int, ty: Int): Int = 128 + 2 * (((tx * 11 + ty * 5) % 40) - 20)
    val bytes = build420(32, 32, tile)
    val ours = JpegCodec.decode(bytes)
    assert(ours.comps.length == 3)
    for (y <- 0 until 32; x <- 0 until 32) {
      assert(ours.comps(0)(y * 32 + x) == tile(x / 8, y / 8))
      assert(ours.comps(1)(y * 32 + x) == 128)
      assert(ours.comps(2)(y * 32 + x) == 128)
    }
    val img = javax.imageio.ImageIO
      .read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null)
    for (y <- 0 until 32; x <- 0 until 32) {
      val rgb = img.getRGB(x, y)
      val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      val want = tile(x / 8, y / 8)
      assert(r == want && g == want && b == want,
        s"ImageIO ($x,$y): ($r,$g,$b) != $want")
    }
  }

  test("malformed shapes fail loudly") {
    val good = buildGray(16, 8, dri = 0, (_, _) => 100)
    // truncated entropy data
    intercept[IllegalArgumentException](
      JpegCodec.decode(good.dropRight(6)))
    // progressive SOF
    val prog = good.clone()
    val sof = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](JpegCodec.decode(prog))
    // no scan before EOI
    intercept[IllegalArgumentException](
      JpegCodec.decode(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)))
    // not a JPEG at all
    intercept[IllegalArgumentException](
      JpegCodec.decode(Array[Byte](1, 2, 3)))
    // zero dimensions
    val z = good.clone()
    z(sof + 5) = 0; z(sof + 6) = 0 // height := 0
    intercept[IllegalArgumentException](JpegCodec.decode(z))
  }

  test("parseMeta reads the declared fields from a decodable stream, " +
    "measures the stuffed scan length, and fails loudly on the same " +
    "malformed shapes as decode (round 10)") {
    // A real DC-only restart stream: the metadata walk must agree
    // with what decode consumed.
    val bytes = buildGray(32, 16, dri = 3, (tx, ty) => 100 + tx + ty)
    val m = JpegCodec.parseMeta(bytes)
    assert(m.width == 32 && m.height == 16 && m.nComp == 1 &&
      m.hMax == 1 && m.vMax == 1 && m.restart == 3)
    assert(m.nQt == 1 && m.nDht == 2, // buildGray: one DQT, DC+AC DHTs
      s"table counts ${m.nQt}/${m.nDht}")
    // Scan length: the entropy segment measured by the stuffing rule
    // equals the distance from the SOS payload to the EOI marker.
    def find(seq: Array[Byte], a: Int, b: Int): Int =
      seq.indices.find(i => i + 1 < seq.length &&
        (seq(i) & 0xff) == a && (seq(i + 1) & 0xff) == b).get
    val sosAt = find(bytes, 0xff, 0xda)
    val sosLen = ((bytes(sosAt + 2) & 0xff) << 8) | (bytes(sosAt + 3) & 0xff)
    val eoiAt = bytes.length - 2
    assert(m.scanLen == eoiAt - (sosAt + 2 + sosLen),
      s"scanLen ${m.scanLen}")
    // The JpegMeta mirrored construction parses to its own formulae.
    val jm = JpegMeta.buildJpeg(42L,
      "some document words".getBytes("UTF-8").map(_ & 0xff))
    val pm = JpegCodec.parseMeta(java.util.HexFormat.of().parseHex(jm))
    assert(pm.width == 8 * (1 + 42 % 3) && pm.height == 8 * (1 + (42 / 3) % 4))
    assert(pm.nComp == 3 && pm.nQt == 2 && pm.nDht == 1 &&
      pm.restart == 42 % 7 && pm.scanLen >= JpegMeta.EntN)
    // Loud on truncation inside the entropy segment and on a DQT
    // whose declared length undercuts its payload.
    intercept[IllegalArgumentException](
      JpegCodec.parseMeta(bytes.dropRight(3)))
    val bad = bytes.clone()
    val dqtAt = find(bad, 0xff, 0xdb)
    bad(dqtAt + 3) = 0x10 // declared length 16 < 1 + 64 payload
    intercept[IllegalArgumentException](JpegCodec.parseMeta(bad))
  }
}
