package graft.multimodal

/** Audio/video CONTAINER header parsers (VERDICT r6 item 4 —
  * extending "multimodal columns" past images): a RIFF/WAVE chunk
  * walk and an ISO BMFF (MP4) box walk, the same wire-format
  * discipline as [[ImageCodec]] — real byte-level framing, length
  * fields honored, unknown chunks/boxes skipped, malformed streams
  * rejected loudly (AvCodecSpec pins truncation, bad magic,
  * zero-advance and overflow cases).
  *
  *  - WAV (RIFF spec): `RIFF <size> WAVE` then chunks of
  *    `<4cc> <LE32 size> <payload>`, WORD-aligned (odd-sized chunks
  *    carry a pad byte the size field excludes). `fmt ` yields
  *    channels / sample rate / bits per sample; `data`'s size is the
  *    PCM byte count.
  *  - MP4 (ISO 14496-12): boxes of `<BE32 size> <4cc>`; size==1 means
  *    a 64-bit largesize follows, size==0 means "to end of file".
  *    `moov` is walked recursively for `mvhd` (version 0 and 1
  *    layouts both supported → timescale / duration); `mdat`'s
  *    payload size is the media byte count.
  */
object AvCodec {

  /** Container-level metadata; audio fields are −1 for MP4, video
    * fields −1 for WAV (surfaced as NULLs by the query layer).
    */
  case class Meta(format: String, channels: Long, sampleRate: Long,
      bits: Long, dataBytes: Long, timescale: Long, duration: Long)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"AvCodec: $msg")

  private def fourcc(b: Array[Byte], off: Int): String = {
    if (off + 4 > b.length) fail(s"truncated fourcc at $off")
    new String(b, off, 4, "ISO-8859-1")
  }

  private def le(b: Array[Byte], off: Int, n: Int): Long = {
    if (off + n > b.length) fail(s"truncated LE$n field at $off")
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def be(b: Array[Byte], off: Int, n: Int): Long = {
    if (off + n > b.length) fail(s"truncated BE$n field at $off")
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  def parse(b: Array[Byte]): Meta =
    if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE")
      parseWav(b)
    else if (b.length >= 8 && fourcc(b, 4) == "ftyp")
      parseMp4(b)
    else fail("unrecognized container (no RIFF/WAVE or ftyp signature)")

  private def parseWav(b: Array[Byte]): Meta = {
    val riffEnd = math.min(8L + le(b, 4, 4), b.length.toLong)
    var off = 12L
    var ch = -1L; var rate = -1L; var bits = -1L; var data = -1L
    while (off + 8 <= riffEnd) {
      val id = fourcc(b, off.toInt)
      val sz = le(b, off.toInt + 4, 4)
      if (id == "fmt ") {
        if (sz < 16) fail(s"fmt chunk too short: $sz")
        ch = le(b, off.toInt + 10, 2)
        rate = le(b, off.toInt + 12, 4)
        bits = le(b, off.toInt + 22, 2)
      } else if (id == "data") data = sz
      // RIFF word alignment: odd chunk sizes carry a pad byte.
      val advance = 8L + sz + (sz & 1L)
      if (advance <= 0) fail(s"non-advancing chunk at $off")
      off += advance
    }
    if (ch < 0 || data < 0) fail("missing fmt/data chunk")
    Meta("wav", ch, rate, bits, data, -1L, -1L)
  }

  /** Decoded PCM stream: format params + the actual samples. */
  case class Pcm(channels: Long, sampleRate: Long, bits: Long,
      samples: Array[Int])

  /** Decode the PCM payload of a WAV stream — the step past header
    * parsing: the same RIFF walk as [[parseWav]] but carrying the
    * `data` chunk OFFSET, then per-sample interpretation per the PCM
    * spec — 8-bit samples are UNSIGNED bytes centered at 128, 16-bit
    * are SIGNED little-endian; a trailing odd byte under 16-bit is
    * not a sample. Other bit depths and a `data` size overrunning the
    * stream are rejected loudly (AvCodecSpec pins both).
    */
  def decodePcm(b: Array[Byte]): Pcm = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE")
      fail("decodePcm: not a RIFF/WAVE stream")
    val riffEnd = math.min(8L + le(b, 4, 4), b.length.toLong)
    var off = 12L
    var ch = -1L; var rate = -1L; var bits = -1L
    var dataOff = -1L; var dataLen = -1L
    while (off + 8 <= riffEnd) {
      val id = fourcc(b, off.toInt)
      val sz = le(b, off.toInt + 4, 4)
      if (id == "fmt ") {
        if (sz < 16) fail(s"fmt chunk too short: $sz")
        ch = le(b, off.toInt + 10, 2)
        rate = le(b, off.toInt + 12, 4)
        bits = le(b, off.toInt + 22, 2)
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      val advance = 8L + sz + (sz & 1L)
      if (advance <= 0) fail(s"non-advancing chunk at $off")
      off += advance
    }
    if (ch < 0 || dataOff < 0) fail("missing fmt/data chunk")
    if (dataOff + dataLen > b.length)
      fail(s"data chunk overruns stream ($dataLen bytes at $dataOff)")
    val base = dataOff.toInt
    val samples = bits match {
      case 8 =>
        Array.tabulate(dataLen.toInt)(i => (b(base + i) & 0xff) - 128)
      case 16 =>
        Array.tabulate(dataLen.toInt / 2) { i =>
          val lo = b(base + 2 * i) & 0xff
          val hi = b(base + 2 * i + 1) & 0xff
          val v = (hi << 8) | lo
          if (v >= 32768) v - 65536 else v
        }
      case x => fail(s"unsupported PCM bit depth: $x")
    }
    Pcm(ch, rate, bits, samples)
  }

  /** The `mdat` payload out of the box walk — the video twin of
    * [[decodePcm]]'s data-chunk extraction: same size/largesize/
    * to-EOF handling and overrun checks as [[parseMp4]], but carrying
    * the payload OFFSET so feature extraction reads real bytes out of
    * the wire format rather than assuming a layout.
    */
  def decodeMdat(b: Array[Byte]): Array[Byte] = {
    var off = 0L
    val end = b.length.toLong
    while (off + 8 <= end) {
      val sz0 = be(b, off.toInt, 4)
      val typ = fourcc(b, off.toInt + 4)
      val (boxSize, hdr) =
        if (sz0 == 1) (be(b, off.toInt + 8, 8), 16L)
        else if (sz0 == 0) (end - off, 8L)
        else (sz0, 8L)
      if (boxSize < hdr || off + boxSize > end)
        fail(s"box $typ overruns container at $off (size $boxSize)")
      if (typ == "mdat") {
        val from = (off + hdr).toInt
        return java.util.Arrays.copyOfRange(b, from,
          (off + boxSize).toInt)
      }
      off += boxSize
    }
    fail("no mdat box")
  }

  private def parseMp4(b: Array[Byte]): Meta = {
    var ts = -1L; var dur = -1L; var media = -1L

    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 8) fail("box nesting too deep")
      var off = start
      while (off + 8 <= end) {
        val sz0 = be(b, off.toInt, 4)
        val typ = fourcc(b, off.toInt + 4)
        // size==1 → 64-bit largesize; size==0 → box runs to EOF.
        val (boxSize, hdr) =
          if (sz0 == 1) (be(b, off.toInt + 8, 8), 16L)
          else if (sz0 == 0) (end - off, 8L)
          else (sz0, 8L)
        if (boxSize < hdr || off + boxSize > end)
          fail(s"box $typ overruns container at $off (size $boxSize)")
        typ match {
          case "moov" => walk(off + hdr, off + boxSize, depth + 1)
          case "mvhd" =>
            if (boxSize < hdr + 1)
              fail(s"mvhd box too short for version byte (size $boxSize)")
            val p = (off + hdr).toInt
            val version = b(p) & 0xff
            // Version-dependent payload: v0 reads through byte 20,
            // v1 through byte 32 — a truncated box must fail loudly
            // rather than mis-read sibling boxes' bytes.
            val need = if (version == 0) 20L else 32L
            if (boxSize < hdr + need)
              fail(s"mvhd v$version too short (size $boxSize, need ${hdr + need})")
            if (version == 0) {
              ts = be(b, p + 12, 4); dur = be(b, p + 16, 4)
            } else {
              ts = be(b, p + 20, 4); dur = be(b, p + 24, 8)
            }
          case "mdat" => media = boxSize - hdr
          case _ => () // unknown boxes skipped by size
        }
        off += boxSize
      }
    }
    walk(0, b.length.toLong, 0)
    if (ts < 0 || media < 0) fail("missing moov/mvhd or mdat box")
    Meta("mp4", -1L, -1L, -1L, media, ts, dur)
  }
}
