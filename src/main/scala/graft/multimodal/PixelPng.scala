package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL PNG PIXEL STATISTICS (`mm_pixel_stats`, VERDICT r7 item 5) —
  * replaces the last stub in the multimodal tier with a genuine
  * pixel decode. The trick that keeps the ORACLE expressible: IDAT
  * is written as a zlib stream of STORED (uncompressed) deflate
  * blocks — RFC 1951 §3.2.4 framing is pure byte arithmetic both
  * engines can construct — while the scanlines are REALLY filtered
  * (row y uses filter type y mod 5, so None/Sub/Up/Average/Paeth are
  * all on the wire) and the engine REALLY decodes them back
  * ([[ImageCodec.decodePng]]: zlib/NLEN/Adler-32 validation, filter
  * reconstruction).
  *
  * Mirrored construction (the mm_av_meta discipline): pixels are the
  * document's UTF-8 bytes laid into a [[PixW]]-wide greyscale image
  * (zero-padded final row); both engines build the byte-identical
  * PNG — the engine via the typed encoder below, DuckDB via the twin
  * list arithmetic in the oracle — and sha-256 of the hex encoding
  * proves it per row. The engine's stats come OUT of the decoder; the
  * oracle's come from the construction arithmetic. Adler-32 is
  * surfaced as a column: the oracle computes it from the filtered
  * stream with the closed form s2 = n + Σ (n−i+1)·bᵢ (mod 65521), the
  * engine recomputes it from the DECOMPRESSED bytes — matching values
  * prove the deflate framing round-tripped.
  *
  * Chunk CRCs are zero by construction (the [[ImageCodec]] scanner
  * convention — CRC is framing, not content; Adler IS validated
  * because it is part of the decompression contract). Spec-gated
  * against java.util.zip.Inflater: a REAL inflater accepts our
  * stored-block streams and returns the identical scanlines.
  *
  * 100 TB shape: one narrow synthesis projection + one typed decode
  * pass, no shuffle before the presentation sort — the multimodal
  * decoder class.
  */
object PixelPng {

  /** Image width; height = ceil(bytes / width). */
  val PixW = 16

  /** Stored-deflate block payload size — small enough that fixture
    * documents span several blocks, so multi-block framing is on the
    * gate path (docs > 256 bytes produce 2–3 blocks).
    */
  val BlockBytes = 256

  // ---------------------------------------------------------------
  // Synthesis: a typed encoder pass. The first cut generated the
  // page through Spark SQL higher-order functions (transform /
  // aggregate / zip_with) for maximal construction symmetry with the
  // oracle — but HOFs are CodegenFallback in Spark (interpreted
  // lambda trees), and the per-byte Paeth CASE walked ~50 interpreted
  // nodes per pixel: 10.3 s at sf0.1 for 3 MB of pixels. The encoder
  // below is the compiled twin of the SAME arithmetic (and of the
  // oracle CTEs); construction equality is still PROVEN per row by
  // the sha-256 gate, which is the property that matters. ~0.5 s.

  private def hex2(sb: StringBuilder, v: Int): Unit = {
    val d = "0123456789ABCDEF"
    sb.append(d((v >> 4) & 0xf)).append(d(v & 0xf))
  }

  /** The page as an uppercase hex string (the sha-gated artifact).
    * An empty document still yields a VALID 16×1 all-padding image —
    * height 0 is illegal PNG, so the floor keeps the construction
    * total over any input (fixture docs are never empty; spec-gated).
    */
  private[multimodal] def encodePng(text: String): String =
    encodePngBytes(text.getBytes("UTF-8").map(_ & 0xff))

  /** The page from raw pixel byte values (round 10: the pHash tier
    * plants DC-shifted twin IMAGES, which are not valid UTF-8 text).
    */
  private[multimodal] def encodePngBytes(bytes: Array[Int]): String = {
    val nb = bytes.length
    val h = math.max(1, (nb + PixW - 1) / PixW)
    val px = new Array[Int](h * PixW)
    var i = 0
    while (i < nb) { px(i) = bytes(i) & 0xff; i += 1 }
    // filtered scanline stream: row y uses filter type y % 5, with
    // predictions over RAW neighbor values (the PNG encode side).
    val scan = new Array[Int](h * (PixW + 1))
    var y = 0
    while (y < h) {
      val ft = y % 5
      scan(y * (PixW + 1)) = ft
      var x = 0
      while (x < PixW) {
        val cur = px(y * PixW + x)
        val a = if (x > 0) px(y * PixW + x - 1) else 0
        val b = if (y > 0) px((y - 1) * PixW + x) else 0
        val c = if (x > 0 && y > 0) px((y - 1) * PixW + x - 1) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        scan(y * (PixW + 1) + 1 + x) = (cur - pred) & 0xff
        x += 1
      }
      y += 1
    }
    val n = scan.length
    var s1 = 1L; var s2 = 0L
    i = 0
    while (i < n) {
      s1 = (s1 + scan(i)) % 65521; s2 = (s2 + s1) % 65521; i += 1
    }
    val z = new StringBuilder
    z.append("7801")
    val nblk = (n + BlockBytes - 1) / BlockBytes
    var j = 0
    while (j < nblk) {
      val len = math.min(BlockBytes, n - j * BlockBytes)
      z.append(if (j == nblk - 1) "01" else "00")
      hex2(z, len & 0xff); hex2(z, (len >> 8) & 0xff)
      hex2(z, (65535 - len) & 0xff); hex2(z, ((65535 - len) >> 8) & 0xff)
      var k = 0
      while (k < len) { hex2(z, scan(j * BlockBytes + k)); k += 1 }
      j += 1
    }
    val adler = (s2 << 16) | s1
    val out = new StringBuilder(z.length + 120)
    def be32(v: Long): Unit = {
      hex2(out, ((v >> 24) & 0xff).toInt); hex2(out, ((v >> 16) & 0xff).toInt)
      hex2(out, ((v >> 8) & 0xff).toInt); hex2(out, (v & 0xff).toInt)
    }
    out.append("89504E470D0A1A0A")
    out.append("0000000D").append("49484452")
    be32(PixW); be32(h)
    out.append("08").append("00").append("00").append("00").append("00")
    out.append("00000000")
    be32(z.length / 2 + 4); out.append("49444154") // zlib + Adler-32
    out.append(z); be32(adler)
    out.append("00000000") // IDAT CRC (zero by construction)
    out.append("00000000").append("49454E44").append("00000000") // IEND
    out.toString
  }

  /** (doc_id, png_hex) for every document. */
  private[multimodal] def pages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents").repartition(col("doc_id"))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, tx) => (id, encodePng(tx)) })
      .toDF("doc_id", "png_hex")
  }

  // ---------------------------------------------------------------
  // mm_pixel_stats: decode the page back; exact-integer statistics
  // over the reconstructed pixels.
  def pixelStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = pages(s, dir)
      .select(col("doc_id"), unhex(col("png_hex")).as("payload"),
        sha2(col("png_hex"), 256).as("sha"))
      .as[(Long, Array[Byte], String)]
    src.mapPartitions(_.map { case (id, payload, sha) =>
      val img = ImageCodec.decodePng(payload)
      var sum = 0L; var sq = 0L; var mn = 255; var mx = 0
      img.pixels.foreach { p =>
        sum += p; sq += p.toLong * p
        if (p < mn) mn = p; if (p > mx) mx = p
      }
      (id, img.width.toLong, img.height.toLong,
        img.pixels.length.toLong, sum, sq, mn.toLong, mx.toLong,
        img.adler, sha)
    }).toDF("doc_id", "width", "height", "n_pixels", "sum_pix",
      "sum_sq", "min_pix", "max_pix", "adler32", "sha256_hex")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_pixel_stats" -> pixelStats,
  )

  // ---------------------------------------------------------------
  // Oracle: the construction twins. Pixel stats come straight from
  // the document bytes (+ the zero padding); the Adler and sha come
  // from the same filtered-stream / framing arithmetic as the Spark
  // expressions above, written in DuckDB list dialect.
  private val DFilt: String = {
    val a = s"(CASE WHEN x > 0 THEN raw[y*$PixW + x] ELSE 0 END)"
    val b = s"(CASE WHEN y > 0 THEN raw[(y-1)*$PixW + x + 1] ELSE 0 END)"
    val c = s"(CASE WHEN x > 0 AND y > 0 THEN raw[(y-1)*$PixW + x] ELSE 0 END)"
    val paeth =
      s"""(CASE WHEN abs($a + $b - $c - $a) <= abs($a + $b - $c - $b)
            AND abs($a + $b - $c - $a) <= abs($a + $b - $c - $c) THEN $a
          WHEN abs($a + $b - $c - $b) <= abs($a + $b - $c - $c) THEN $b
          ELSE $c END)"""
    s"""((raw[y*$PixW + x + 1] - (CASE y % 5
        WHEN 0 THEN 0
        WHEN 1 THEN $a
        WHEN 2 THEN $b
        WHEN 3 THEN ($a + $b) // 2
        ELSE $paeth END)) % 256 + 256) % 256"""
  }

  private def dLe16(v: String): String =
    s"lpad(hex(($v) % 256), 2, '0') || lpad(hex(($v) // 256), 2, '0')"

  val oracles: Map[String, String] = Map(
    "mm_pixel_stats" ->
      s"""WITH t AS (SELECT doc_id, hex(encode(text)) AS hx
           FROM documents),
         g AS (SELECT doc_id, hx,
             CAST(length(hx) // 2 AS BIGINT) AS nb,
             greatest(CAST(1 AS BIGINT),
               CAST((length(hx) // 2 + ${PixW - 1}) // $PixW AS BIGINT))
               AS hgt
           FROM t),
         r AS (SELECT doc_id, nb, hgt,
             list_transform(range(0, hgt * $PixW), i ->
               CASE WHEN i < nb THEN CAST(('0x' ||
                 substr(hx, CAST(i*2 + 1 AS INTEGER), 2)) AS BIGINT)
               ELSE 0 END) AS raw
           FROM g),
         st AS (SELECT doc_id, nb, hgt, raw,
             flatten(list_transform(range(0, hgt), y ->
               list_prepend(y % 5,
                 list_transform(range(0, $PixW), x -> $DFilt))))
               AS stream
           FROM r),
         ad AS (SELECT doc_id, nb, hgt, raw, stream,
             CAST(len(stream) AS BIGINT) AS n,
             (1 + list_sum(list_prepend(CAST(0 AS BIGINT), stream)))
               % 65521 AS s1,
             (len(stream) + list_sum(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, len(stream) + 1),
                 i -> stream[i] * (len(stream) - i + 1))))) % 65521
               AS s2
           FROM st),
         z AS (SELECT doc_id, nb, hgt, raw, s1, s2,
             '7801' || array_to_string(
               list_transform(range(0, (n + ${BlockBytes - 1})
                   // $BlockBytes), j ->
                 (CASE WHEN (j + 1) * $BlockBytes >= n
                    THEN '01' ELSE '00' END)
                 || ${dLe16(s"least($BlockBytes, n - j*$BlockBytes)")}
                 || ${dLe16(s"65535 - least($BlockBytes, " +
                     s"n - j*$BlockBytes)")}
                 || array_to_string(list_transform(
                      stream[j*$BlockBytes + 1 : (j+1)*$BlockBytes],
                      v -> lpad(hex(v), 2, '0')), '')), '')
             || lpad(hex(s2 * 65536 + s1), 8, '0') AS zlib
           FROM ad),
         p AS (SELECT doc_id, nb, hgt, raw, s1, s2,
             '89504E470D0A1A0A' || '0000000D' || '49484452'
             || lpad(hex($PixW), 8, '0') || lpad(hex(hgt), 8, '0')
             || '08' || '00' || '00' || '00' || '00' || '00000000'
             || lpad(hex(length(zlib) // 2), 8, '0') || '49444154'
             || zlib || '00000000'
             || '00000000' || '49454E44' || '00000000' AS png_hex
           FROM z),
         px AS (SELECT doc_id, raw[1 : CAST(nb AS INTEGER)] AS bytes,
             hgt * $PixW - nb AS pad
           FROM p)
         SELECT p.doc_id,
           CAST($PixW AS BIGINT) AS width,
           p.hgt AS height,
           p.hgt * $PixW AS n_pixels,
           CAST(list_sum(list_prepend(CAST(0 AS BIGINT), px.bytes))
             AS BIGINT) AS sum_pix,
           CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
             list_transform(px.bytes, v -> v * v))) AS BIGINT) AS sum_sq,
           CAST(CASE WHEN px.pad > 0 THEN 0
             ELSE list_min(px.bytes) END AS BIGINT) AS min_pix,
           CAST(coalesce(list_max(px.bytes), 0) AS BIGINT) AS max_pix,
           CAST(p.s2 * 65536 + p.s1 AS BIGINT) AS adler32,
           sha256(p.png_hex) AS sha256_hex
         FROM p JOIN px ON px.doc_id = p.doc_id
         ORDER BY p.doc_id""",
  )
}
