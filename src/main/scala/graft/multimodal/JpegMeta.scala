package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** JPEG MARKER-WALK METADATA AS AN ORACLE ROW (`mm_jpeg_meta`,
  * VERDICT r9 item 8): the SQL-expressible part of the JPEG wire
  * format, hash-gated — pixels stay with [[JpegCodec.decode]]'s
  * spec-differential gate (entropy decoding is bit-level Huffman
  * state, not SQL).
  *
  * Mirrored construction (the mm_pixel_stats discipline): each
  * document deterministically derives a baseline JPEG STREAM —
  * dimensions and component layout from the doc_id (odd = grayscale,
  * even = 3-component 4:2:0 with a second chroma quant table),
  * quantization tables from the document's bytes (clamped ≥ 1), a
  * fixed minimal valid DHT, a DRI segment, and an entropy segment of
  * [[EntN]] doc-derived bytes with REAL §B.1.1.5 byte stuffing
  * (0xFF → FF 00; the +doc_id rotation guarantees 0xFF occurs on the
  * fixture, so the stuffing rule is on the gate path). Both engines
  * build the byte-identical hex (sha-256 gated); the ENGINE then
  * parses the real bytes back with [[JpegCodec.parseMeta]] — the
  * same bounds-checked walk discipline as the pixel decoder — while
  * the oracle reports the construction arithmetic. A parser that
  * misreads any declared field, or measures the stuffed scan length
  * wrong, diverges.
  *
  * 100 TB shape: one narrow synthesis + one typed parse pass, no
  * shuffle before the presentation sort — the multimodal scanner
  * class.
  */
object JpegMeta {

  /** Entropy-segment payload bytes (pre-stuffing). */
  val EntN = 64

  private def hex2(sb: StringBuilder, v: Int): Unit = {
    val d = "0123456789ABCDEF"
    sb.append(d((v >> 4) & 0xf)).append(d(v & 0xf))
  }

  private def be16(sb: StringBuilder, v: Int): Unit = {
    hex2(sb, (v >> 8) & 0xff); hex2(sb, v & 0xff)
  }

  /** The mirrored stream as uppercase hex. */
  private[multimodal] def buildJpeg(docId: Long,
      bytes: Array[Int]): String = {
    val nb = bytes.length
    def bAt(i: Int): Int = if (nb == 0) 0 else bytes(i % nb)
    val w = 8 * (1 + (docId % 3).toInt)
    val h = 8 * (1 + ((docId / 3) % 4).toInt)
    val nc = if (docId % 2 == 1) 1 else 3
    val ri = (docId % 7).toInt
    val sb = new StringBuilder
    sb.append("FFD8")
    // DQT 0 (luma): pq=0, values = doc bytes clamped to >= 1.
    sb.append("FFDB0043").append("00")
    for (i <- 0 until 64) hex2(sb, math.max(1, bAt(i)))
    if (nc == 3) { // DQT 1 (chroma): offset-7 rotation of the bytes.
      sb.append("FFDB0043").append("01")
      for (i <- 0 until 64) hex2(sb, math.max(1, bAt(i + 7)))
    }
    // SOF0: 8-bit, h, w, components (grayscale 1x1; 4:2:0 luma 2x2).
    sb.append("FFC0"); be16(sb, 8 + 3 * nc); sb.append("08")
    be16(sb, h); be16(sb, w); hex2(sb, nc)
    if (nc == 1) sb.append("011100")
    else sb.append("012200").append("021101").append("031101")
    // Fixed minimal valid DHT: one code of length 1, value 0.
    sb.append("FFC40014").append("00").append("01")
    sb.append("00" * 15).append("00")
    // DRI.
    sb.append("FFDD0004"); be16(sb, ri)
    // SOS header: every component on tables 0/0, baseline spectral.
    sb.append("FFDA"); be16(sb, 6 + 2 * nc); hex2(sb, nc)
    for (c <- 1 to nc) { hex2(sb, c); sb.append("00") }
    sb.append("003F00")
    // Entropy payload: doc bytes rotated by doc_id, byte-stuffed.
    for (i <- 0 until EntN) {
      val e = ((bAt(i) + docId) % 256).toInt
      if (e == 0xff) sb.append("FF00") else hex2(sb, e)
    }
    sb.append("FFD9")
    sb.toString
  }

  def jpegMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents").repartition(col("doc_id"))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, tx) =>
        val hex = buildJpeg(id, tx.getBytes("UTF-8").map(_ & 0xff))
        val m = JpegCodec.parseMeta(
          java.util.HexFormat.of().parseHex(hex))
        (id, m.width.toLong, m.height.toLong, m.nComp.toLong,
          m.hMax.toLong, m.vMax.toLong, m.restart.toLong,
          m.nQt.toLong, m.nDht.toLong, m.scanLen, hex)
      })
      .toDF("doc_id", "width", "height", "n_components", "h_max",
        "v_max", "restart_interval", "n_quant_tables", "n_huff_tables",
        "scan_len", "hex")
      .select(col("doc_id"), col("width"), col("height"),
        col("n_components"), col("h_max"), col("v_max"),
        col("restart_interval"), col("n_quant_tables"),
        col("n_huff_tables"), col("scan_len"),
        sha2(col("hex"), 256).as("sha256_hex"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_jpeg_meta" -> jpegMeta,
  )

  // ---------------------------------------------------------------
  // Oracle: the construction twins — fields from the arithmetic, the
  // sha from the identically-built hex string.
  val oracles: Map[String, String] = Map(
    "mm_jpeg_meta" ->
      s"""WITH t AS (SELECT doc_id, hex(encode(text)) AS hx
           FROM documents),
         b0 AS (SELECT doc_id,
             list_transform(range(0, length(hx) // 2), i ->
               CAST(('0x' || substr(hx, CAST(i*2 + 1 AS INTEGER), 2))
                 AS BIGINT)) AS bs
           FROM t),
         g AS (SELECT doc_id, bs, CAST(len(bs) AS BIGINT) AS nb,
             8 * (1 + doc_id % 3) AS w,
             8 * (1 + (doc_id // 3) % 4) AS h,
             CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END AS nc,
             doc_id % 7 AS ri
           FROM b0),
         e AS (SELECT doc_id, w, h, nc, ri, nb,
             list_transform(range(0, $EntN), i ->
               (CASE WHEN nb > 0 THEN bs[CAST(i % nb + 1 AS INTEGER)]
                 ELSE 0 END + doc_id) % 256) AS ent,
             list_transform(range(0, 64), i ->
               greatest(1, CASE WHEN nb > 0
                 THEN bs[CAST(i % nb + 1 AS INTEGER)] ELSE 0 END))
               AS q0,
             list_transform(range(0, 64), i ->
               greatest(1, CASE WHEN nb > 0
                 THEN bs[CAST((i + 7) % nb + 1 AS INTEGER)] ELSE 0 END))
               AS q1
           FROM g),
         p AS (SELECT doc_id, w, h, nc, ri,
             'FFD8'
             || 'FFDB004300' || array_to_string(
                  list_transform(q0, v -> lpad(hex(v), 2, '0')), '')
             || CASE WHEN nc = 3
                  THEN 'FFDB004301' || array_to_string(
                    list_transform(q1, v -> lpad(hex(v), 2, '0')), '')
                  ELSE '' END
             || 'FFC0' || lpad(hex(8 + 3*nc), 4, '0') || '08'
             || lpad(hex(h), 4, '0') || lpad(hex(w), 4, '0')
             || lpad(hex(nc), 2, '0')
             || CASE WHEN nc = 1 THEN '011100'
                  ELSE '012200021101031101' END
             || 'FFC400140001' || repeat('00', 15) || '00'
             || 'FFDD0004' || lpad(hex(ri), 4, '0')
             || 'FFDA' || lpad(hex(6 + 2*nc), 4, '0')
             || lpad(hex(nc), 2, '0')
             || CASE WHEN nc = 1 THEN '0100' ELSE '010002000300' END
             || '003F00'
             || array_to_string(list_transform(ent, v ->
                  CASE WHEN v = 255 THEN 'FF00'
                    ELSE lpad(hex(v), 2, '0') END), '')
             || 'FFD9' AS jhex,
             CAST($EntN + len(list_filter(ent, v -> v = 255))
               AS BIGINT) AS scan_len
           FROM e)
         SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(nc AS BIGINT) AS n_components,
           CAST(CASE WHEN nc = 1 THEN 1 ELSE 2 END AS BIGINT) AS h_max,
           CAST(CASE WHEN nc = 1 THEN 1 ELSE 2 END AS BIGINT) AS v_max,
           CAST(ri AS BIGINT) AS restart_interval,
           CAST(CASE WHEN nc = 1 THEN 1 ELSE 2 END AS BIGINT)
             AS n_quant_tables,
           CAST(1 AS BIGINT) AS n_huff_tables,
           scan_len,
           sha256(jhex) AS sha256_hex
         FROM p ORDER BY doc_id""",
  )
}
