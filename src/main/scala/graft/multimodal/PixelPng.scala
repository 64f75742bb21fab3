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
  * PNG — Spark via generated SQL expressions below, DuckDB via the
  * twin expressions in the oracle — and sha-256 of the hex encoding
  * proves it. The engine's stats come OUT of the decoder; the
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
  // Synthesis: generated SQL expressions (twins of the oracle CTEs).
  // Column contract: text → hx, nb, hgt, raw, stream, zlib hex, png
  // hex. All arithmetic integer; hex uppercase via hex()/lpad.

  /** Filtered byte at (y, x): PNG encode side — predictions read RAW
    * neighbor values, so the whole stream is one data-parallel
    * expression (no recurrence; the DECODE side is the recurrent
    * one, and that lives in [[ImageCodec.decodePng]]).
    */
  private val filtExpr: String = {
    val cur = s"element_at(raw, y*$PixW + x + 1)"
    val a = s"(CASE WHEN x > 0 THEN element_at(raw, y*$PixW + x) ELSE 0 END)"
    val b = s"(CASE WHEN y > 0 THEN element_at(raw, (y-1)*$PixW + x + 1) ELSE 0 END)"
    val c = s"(CASE WHEN x > 0 AND y > 0 THEN element_at(raw, (y-1)*$PixW + x) ELSE 0 END)"
    val paeth =
      s"""(CASE WHEN abs($a + $b - $c - $a) <= abs($a + $b - $c - $b)
            AND abs($a + $b - $c - $a) <= abs($a + $b - $c - $c) THEN $a
          WHEN abs($a + $b - $c - $b) <= abs($a + $b - $c - $c) THEN $b
          ELSE $c END)"""
    s"""pmod($cur - (CASE y % 5
        WHEN 0 THEN 0
        WHEN 1 THEN $a
        WHEN 2 THEN $b
        WHEN 3 THEN CAST(($a + $b) / 2 AS INT)
        ELSE $paeth END), 256)"""
  }

  private def le16(v: String): String =
    s"concat(lpad(hex(($v) % 256), 2, '0'), " +
      s"lpad(hex(CAST(($v) / 256 AS INT)), 2, '0'))"

  /** (doc_id, png_hex) for every document. */
  private[multimodal] def pages(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").repartition(col("doc_id"))
      .withColumn("hx", expr("hex(encode(text, 'UTF-8'))"))
      .withColumn("nb", expr("CAST(length(hx) / 2 AS INT)"))
      .withColumn("hgt", expr(s"CAST((nb + ${PixW - 1}) / $PixW AS INT)"))
      .withColumn("raw", expr(
        s"""transform(sequence(0, hgt * $PixW - 1), i ->
           CASE WHEN i < nb
             THEN CAST(conv(substring(hx, i*2 + 1, 2), 16, 10) AS INT)
             ELSE 0 END)"""))
      .withColumn("stream", expr(
        s"""flatten(transform(sequence(0, hgt - 1), y ->
           concat(array(y % 5),
             transform(sequence(0, ${PixW - 1}), x -> $filtExpr))))"""))
      .withColumn("s1", expr(
        "(1 + aggregate(stream, CAST(0 AS BIGINT), (acc, x) -> acc + x))" +
          " % 65521"))
      .withColumn("s2", expr(
        """(size(stream) + aggregate(
           zip_with(stream, sequence(1, size(stream)),
             (b, i) -> CAST(b AS BIGINT) * (size(stream) - i + 1)),
           CAST(0 AS BIGINT), (acc, x) -> acc + x)) % 65521"""))
      .withColumn("zlib", expr(
        s"""concat('7801', array_join(
           transform(sequence(0, CAST((size(stream) + ${BlockBytes - 1})
               / $BlockBytes AS INT) - 1), j ->
             concat(
               CASE WHEN (j + 1) * $BlockBytes >= size(stream)
                 THEN '01' ELSE '00' END,
               ${le16(s"least($BlockBytes, size(stream) - j*$BlockBytes)")},
               ${le16(s"65535 - least($BlockBytes, " +
                 s"size(stream) - j*$BlockBytes)")},
               array_join(transform(slice(stream, j*$BlockBytes + 1,
                 $BlockBytes), v -> lpad(hex(v), 2, '0')), ''))), ''),
           lpad(hex(s2 * 65536 + s1), 8, '0'))"""))
      .withColumn("png_hex", expr(
        s"""concat('89504E470D0A1A0A',
           '0000000D', '49484452',
           lpad(hex($PixW), 8, '0'), lpad(hex(hgt), 8, '0'),
           '08', '00', '00', '00', '00', '00000000',
           lpad(hex(CAST(length(zlib) / 2 AS INT)), 8, '0'), '49444154',
           zlib, '00000000',
           '00000000', '49454E44', '00000000')"""))
      .select("doc_id", "png_hex")

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
             CAST((length(hx) // 2 + ${PixW - 1}) // $PixW AS BIGINT)
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
           CAST(list_max(px.bytes) AS BIGINT) AS max_pix,
           CAST(p.s2 * 65536 + p.s1 AS BIGINT) AS adler32,
           sha256(p.png_hex) AS sha256_hex
         FROM p JOIN px ON px.doc_id = p.doc_id
         ORDER BY p.doc_id""",
  )
}
