package graft.multimodal

/** REAL BASELINE-DCT JPEG PIXEL DECODE (VERDICT r8 item 6): the
  * second image format made real — [[ImageCodec.parseJpeg]] stays the
  * header scanner, this is the full ITU-T T.81 baseline sequential
  * decoder: marker walk (DQT/DHT/SOF0-1/DRI/SOS), canonical Huffman
  * decoding (Annex C table construction, F.2.2.3 DECODE), the
  * byte-stuffing entropy bit reader (§B.1.1.5), restart-marker
  * resync (§E.2.4: byte-align, expect RSTn mod 8, reset DC
  * predictors), run-length AC decoding with EXTEND (F.2.2.1),
  * dequantization in zigzag order, a double-precision reference IDCT
  * (A.3.3), and component upsampling by sample replication for
  * subsampled chroma.
  *
  * Entropy-coded data is NOT SQL-expressible (bit-level Huffman
  * state), so unlike PNG's stored-deflate gate (`mm_pixel_stats`)
  * this decoder is SPEC-gated by DIFFERENTIAL against a second
  * independent implementation — `javax.imageio`'s libjpeg-lineage
  * reader — the Inflater discipline of PixelPngSpec: ImageIO-written
  * grayscale streams decode to the same pixels within IDCT rounding
  * (and BIT-EXACT on DC-only constructions, where every conforming
  * IDCT is exact), hand-built restart-marker and 4:2:0 streams are
  * read identically by both decoders, and malformed shapes fail
  * loudly.
  *
  * Out of scope (loud, not wrong): progressive (SOF2+),
  * arithmetic coding, 12-bit precision, DNL. Upsampling is sample
  * replication (a conforming choice; libjpeg's default triangular
  * filter differs only on non-constant chroma, which the
  * differential goldens therefore hold constant).
  */
object JpegCodec {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Decoded image: full-resolution planes per component
    * (1 = grayscale Y; 3 = Y, Cb, Cr), values 0..255.
    */
  final case class JpegImage(width: Int, height: Int,
      comps: Vector[Array[Int]])

  /** zigzag index → natural (row-major) index (T.81 figure A.6). */
  private[multimodal] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table (T.81 Annex C / F.15): `bits(l-1)` codes
    * of length l over `vals` in order.
    */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val maxcode = new Array[Int](17)
    val mincode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      if (bits.sum != vals.length)
        fail(s"DHT: ${bits.sum} codes declared, ${vals.length} values")
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxcode(l) = code - 1
        } else maxcode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int =
      vals(valptr(l) + code - mincode(l))
  }

  /** Entropy-coded-segment bit reader with 0xFF00 unstuffing; refuses
    * to read across an unstuffed marker (restart resync is explicit
    * via [[expectRst]]).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0

    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) fail("entropy data exhausted")
        val by = b(pos) & 0xff
        pos += 1
        if (by == 0xff) {
          if (pos >= b.length) fail("truncated byte stuffing")
          val nxt = b(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed 0xFF data byte
          else fail(f"marker 0xFF$nxt%02X inside entropy data")
        }
        cur = by
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume the expected RSTn (§E.2.4). */
    def expectRst(n: Int): Unit = {
      nbits = 0
      if (pos + 2 > b.length) fail("missing restart marker")
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != 0xd0 + n)
        fail(f"expected RST$n, found 0x${b(pos) & 0xff}%02X" +
          f"${b(pos + 1) & 0xff}%02X")
      pos += 2
    }

    def align(): Unit = { nbits = 0 }
  }

  /** EXTEND (F.2.2.1): map the n-bit magnitude to its signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0
    else if (v < (1 << (n - 1))) v - (1 << n) + 1
    else v

  private val CosT = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val Cn = Array.tabulate(8)(u =>
    if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Reference inverse DCT (A.3.3) + level shift + clamp. */
  private def idct(s: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = s(v * 8 + u)
            if (c != 0)
              acc += Cn(u) * Cn(v) * c * CosT(x)(u) * CosT(y)(v)
            u += 1
          }
          v += 1
        }
        val p = math.round(acc / 4.0).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
    out
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Marker-segment length with full bounds checks (a truncated
    * stream must fail loudly, not AIOOBE).
    */
  private def segLen(b: Array[Byte], off: Int): Int = {
    if (off + 2 > b.length) fail("truncated segment length")
    val len = be16(b, off)
    if (len < 2) fail(s"bad segment length $len")
    if (off + len > b.length) fail("segment overruns stream")
    len
  }

  /** Marker-walk metadata (round 10, `mm_jpeg_meta`): everything the
    * stream declares BEFORE entropy decoding — dimensions, component
    * configuration, restart interval, table counts — plus the scan
    * segment's raw byte length, measured by the §B.1.1.5 rule (the
    * entropy segment ends at the first 0xFF followed by anything
    * other than a stuffed 0x00 or an RSTn marker). The walk applies
    * the same bounds discipline as [[decode]] — truncated or
    * malformed streams fail loudly — and validates DHT payloads by
    * constructing the canonical table. Pixels stay with [[decode]]'s
    * spec-differential gate; these fields are the SQL-expressible
    * part of the format.
    */
  final case class JpegMetaInfo(width: Int, height: Int, nComp: Int,
      hMax: Int, vMax: Int, restart: Int, nQt: Int, nDht: Int,
      scanLen: Long)

  def parseMeta(b: Array[Byte]): JpegMetaInfo = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      fail("not a JPEG SOI")
    var restart = 0
    var w = -1
    var h = -1
    var nc = 0
    var hmax = 1
    var vmax = 1
    var nQt = 0
    var nDht = 0
    var scanLen = 0L
    var sawScan = false
    var off = 2
    var done = false
    while (!done) {
      if (off + 2 > b.length) fail("truncated marker stream")
      if ((b(off) & 0xff) != 0xff) fail("expected marker 0xFF")
      var m = b(off + 1) & 0xff
      off += 2
      while (m == 0xff) {
        if (off >= b.length) fail("truncated fill bytes")
        m = b(off) & 0xff
        off += 1
      }
      m match {
        case 0xd9 => done = true
        case 0xdb =>
          val len = segLen(b, off)
          var p = off + 2
          val end = off + len
          while (p < end) {
            val pq = (b(p) & 0xff) >> 4
            val tq = b(p) & 0x0f
            if (pq > 1 || tq > 3) fail("bad DQT precision/id")
            p += 1
            if (p + (1 + pq) * 64 > end) fail("DQT table overruns segment")
            p += (1 + pq) * 64
            nQt += 1
          }
          off = end
        case 0xc4 =>
          val len = segLen(b, off)
          var p = off + 2
          val end = off + len
          while (p < end) {
            val tc = (b(p) & 0xff) >> 4
            val th = b(p) & 0x0f
            if (tc > 1 || th > 3) fail("bad DHT class/id")
            p += 1
            if (p + 16 > end) fail("DHT BITS overrun segment")
            val bits = Array.tabulate(16)(i => b(p + i) & 0xff)
            p += 16
            val n = bits.sum
            if (p + n > end) fail("DHT values overrun segment")
            val vals = Array.tabulate(n)(i => b(p + i) & 0xff)
            p += n
            new Huff(bits, vals) // canonical-table validity check
            nDht += 1
          }
          off = end
        case 0xc0 | 0xc1 =>
          val len = segLen(b, off)
          if (len < 8) fail("SOF too short")
          if ((b(off + 2) & 0xff) != 8) fail("only 8-bit precision")
          h = be16(b, off + 3)
          w = be16(b, off + 5)
          if (w < 1 || h < 1) fail("bad dimensions")
          nc = b(off + 7) & 0xff
          if (nc != 1 && nc != 3) fail(s"unsupported component count $nc")
          if (len < 8 + 3 * nc) fail("SOF components overrun segment")
          var i = 0
          while (i < nc) {
            val hv = b(off + 9 + 3 * i) & 0xff
            val ch = hv >> 4
            val cv = hv & 0x0f
            if (ch < 1 || ch > 2 || cv < 1 || cv > 2)
              fail(s"unsupported sampling ${ch}x$cv")
            if (ch > hmax) hmax = ch
            if (cv > vmax) vmax = cv
            i += 1
          }
          off += len
        case 0xc2 => fail("progressive JPEG unsupported")
        case n if n >= 0xc3 && n <= 0xcf && n != 0xc4 && n != 0xc8 =>
          fail(f"unsupported SOF marker 0xFF$n%02X")
        case 0xdd =>
          val len = segLen(b, off)
          if (len != 4) fail("bad DRI length")
          restart = be16(b, off + 2)
          off += len
        case 0xda =>
          if (w < 0) fail("SOS before SOF")
          val len = segLen(b, off)
          if (len < 6) fail("SOS too short")
          val ns = b(off + 2) & 0xff
          if (len < 6 + 2 * ns) fail("SOS header overruns segment")
          if (ns != nc) fail("only single interleaved scan supported")
          off += len
          val start = off
          var p = off
          var ended = false
          while (!ended) {
            if (p >= b.length) fail("truncated entropy segment")
            if ((b(p) & 0xff) != 0xff) p += 1
            else {
              if (p + 1 >= b.length) fail("truncated entropy segment")
              val m2 = b(p + 1) & 0xff
              if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7)) p += 2
              else ended = true
            }
          }
          scanLen = (p - start).toLong
          off = p
          sawScan = true
        case _ => off += segLen(b, off) // APPn / COM / unknown
      }
    }
    if (w < 0 || !sawScan) fail("stream has no frame or no scan")
    JpegMetaInfo(w, h, nc, hmax, vmax, restart, nQt, nDht, scanLen)
  }

  /** Decode a baseline sequential JPEG stream. */
  def decode(b: Array[Byte]): JpegImage = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      fail("not a JPEG SOI")
    val qt = new Array[Array[Int]](4) // zigzag order
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var restart = 0
    var w = -1
    var h = -1
    var comps: Vector[Comp] = Vector.empty
    var planes: Vector[Array[Int]] = Vector.empty
    var mcusX = 0
    var mcusY = 0
    var hmax = 1
    var vmax = 1
    var sawScan = false

    var off = 2
    var done = false
    while (!done) {
      if (off + 2 > b.length) fail("truncated marker stream")
      if ((b(off) & 0xff) != 0xff) fail("expected marker 0xFF")
      var m = b(off + 1) & 0xff
      off += 2
      while (m == 0xff) { // fill bytes (B.1.1.2)
        if (off >= b.length) fail("truncated fill bytes")
        m = b(off) & 0xff
        off += 1
      }
      m match {
        case 0xd9 => done = true // EOI
        case 0xdb => // DQT: one or more tables
          val len = segLen(b, off)
          var p = off + 2
          val end = off + len
          while (p < end) {
            val pq = (b(p) & 0xff) >> 4
            val tq = b(p) & 0x0f
            if (pq > 1 || tq > 3) fail("bad DQT precision/id")
            p += 1
            // A declared length shorter than the table payload must
            // fail loudly, not silently misparse the following
            // segment's bytes as table entries (ADVICE r9).
            if (p + (1 + pq) * 64 > end) fail("DQT table overruns segment")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              t(k) = if (pq == 0) b(p) & 0xff else be16(b, p)
              p += 1 + pq
              k += 1
            }
            qt(tq) = t
          }
          off = end
        case 0xc4 => // DHT: one or more tables
          val len = segLen(b, off)
          var p = off + 2
          val end = off + len
          while (p < end) {
            val tc = (b(p) & 0xff) >> 4
            val th = b(p) & 0x0f
            if (tc > 1 || th > 3) fail("bad DHT class/id")
            p += 1
            if (p + 16 > end) fail("DHT BITS overrun segment")
            val bits = Array.tabulate(16)(i => b(p + i) & 0xff)
            p += 16
            val n = bits.sum
            if (p + n > end) fail("DHT values overrun segment")
            val vals = Array.tabulate(n)(i => b(p + i) & 0xff)
            p += n
            val tab = new Huff(bits, vals)
            if (tc == 0) dcTab(th) = tab else acTab(th) = tab
          }
          off = end
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 ext. sequential
          val len = segLen(b, off)
          if (len < 8) fail("SOF too short")
          if ((b(off + 2) & 0xff) != 8) fail("only 8-bit precision")
          h = be16(b, off + 3)
          w = be16(b, off + 5)
          if (w < 1 || h < 1) fail("bad dimensions")
          val nc = b(off + 7) & 0xff
          if (nc != 1 && nc != 3) fail(s"unsupported component count $nc")
          if (len < 8 + 3 * nc) fail("SOF components overrun segment")
          comps = Vector.tabulate(nc) { i =>
            val p = off + 8 + 3 * i
            val hv = b(p + 1) & 0xff
            Comp(b(p) & 0xff, hv >> 4, hv & 0x0f, b(p + 2) & 0xff)
          }
          comps.foreach { c =>
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2)
              fail(s"unsupported sampling ${c.h}x${c.v}")
          }
          hmax = comps.map(_.h).max
          vmax = comps.map(_.v).max
          mcusX = (w + 8 * hmax - 1) / (8 * hmax)
          mcusY = (h + 8 * vmax - 1) / (8 * vmax)
          planes = comps.map(c =>
            new Array[Int](mcusX * c.h * 8 * mcusY * c.v * 8))
          off += len
        case 0xc2 => fail("progressive JPEG unsupported")
        case n if n >= 0xc3 && n <= 0xcf && n != 0xc4 && n != 0xc8 =>
          fail(f"unsupported SOF marker 0xFF$n%02X")
        case 0xdd => // DRI
          val len = segLen(b, off)
          if (len != 4) fail("bad DRI length")
          restart = be16(b, off + 2)
          off += len
        case 0xda => // SOS + entropy-coded data
          if (w < 0) fail("SOS before SOF")
          val len = segLen(b, off)
          if (len < 6) fail("SOS too short")
          val ns = b(off + 2) & 0xff
          if (len < 6 + 2 * ns) fail("SOS header overruns segment")
          if (ns != comps.length)
            fail("only single interleaved scan supported")
          // (component selector → (dc table, ac table)) in comp order
          val useTabs = Array.ofDim[Int](comps.length, 2)
          var i = 0
          while (i < ns) {
            val cs = b(off + 3 + 2 * i) & 0xff
            val tt = b(off + 4 + 2 * i) & 0xff
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0) fail(s"SOS names unknown component $cs")
            useTabs(ci)(0) = tt >> 4
            useTabs(ci)(1) = tt & 0x0f
            i += 1
          }
          val ss = b(off + 3 + 2 * ns) & 0xff
          val se = b(off + 4 + 2 * ns) & 0xff
          val ahl = b(off + 5 + 2 * ns) & 0xff
          if (ss != 0 || se != 63 || ahl != 0)
            fail("non-baseline scan parameters")
          off += len
          val br = new BitReader(b, off)
          val pred = new Array[Int](comps.length)
          val coef = new Array[Int](64)
          var rstN = 0
          var mcu = 0
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              if (restart > 0 && mcu > 0 && mcu % restart == 0) {
                br.expectRst(rstN % 8)
                rstN += 1
                java.util.Arrays.fill(pred, 0)
              }
              var ci = 0
              while (ci < comps.length) {
                val c = comps(ci)
                val dct = dcTab(useTabs(ci)(0))
                val act = acTab(useTabs(ci)(1))
                val q = qt(c.tq)
                if (dct == null || act == null || q == null)
                  fail("scan references an undefined table")
                var by = 0
                while (by < c.v) {
                  var bx = 0
                  while (bx < c.h) {
                    java.util.Arrays.fill(coef, 0)
                    // DC
                    val t = decodeSym(br, dct)
                    if (t > 11) fail(s"bad DC category $t")
                    pred(ci) += extend(br.receive(t), t)
                    coef(0) = pred(ci) * q(0)
                    // AC run-length
                    var k = 1
                    var eob = false
                    while (k < 64 && !eob) {
                      val rs = decodeSym(br, act)
                      val r = rs >> 4
                      val s = rs & 0x0f
                      if (s == 0) {
                        if (r == 15) k += 16 // ZRL
                        else eob = true
                      } else {
                        k += r
                        if (k > 63) fail("AC run past block end")
                        coef(ZigZag(k)) = extend(br.receive(s), s) * q(k)
                        k += 1
                      }
                    }
                    val px = idct(coef)
                    // place block into the component plane
                    val planeW = mcusX * c.h * 8
                    val x0 = (mx * c.h + bx) * 8
                    val y0 = (my * c.v + by) * 8
                    var yy = 0
                    while (yy < 8) {
                      var xx = 0
                      while (xx < 8) {
                        planes(ci)((y0 + yy) * planeW + x0 + xx) =
                          px(yy * 8 + xx)
                        xx += 1
                      }
                      yy += 1
                    }
                    bx += 1
                  }
                  by += 1
                }
                ci += 1
              }
              mcu += 1
              mx += 1
            }
            my += 1
          }
          br.align()
          off = br.pos
          sawScan = true
        case n if n >= 0xe0 && n <= 0xef => // APPn
          off += segLen(b, off)
        case 0xfe => // COM
          off += segLen(b, off)
        case n if n >= 0xd0 && n <= 0xd7 =>
          fail("restart marker outside entropy data")
        case n =>
          fail(f"unsupported marker 0xFF$n%02X")
      }
    }
    if (!sawScan) fail("no scan data before EOI")

    // Upsample each plane to full resolution by replication.
    val out = comps.zip(planes).map { case (c, plane) =>
      val planeW = mcusX * c.h * 8
      val full = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = y * c.v / vmax
        var x = 0
        while (x < w) {
          full(y * w + x) = plane(sy * planeW + x * c.h / hmax)
          x += 1
        }
        y += 1
      }
      full
    }
    JpegImage(w, h, out.toVector)
  }

  /** DECODE (F.2.2.3): walk code lengths until the code fits. */
  private def decodeSym(br: BitReader, t: Huff): Int = {
    var code = br.bit()
    var l = 1
    while (code > t.maxcode(l)) {
      code = (code << 1) | br.bit()
      l += 1
      if (l > 16) fail("invalid Huffman code")
    }
    t.value(l, code)
  }
}
