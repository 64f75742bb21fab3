package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A media payload: opaque bytes + typed metadata. The fixture corpus
  * has no real image column, so [[Multimodal.mediaRecords]] SYNTHESIZES
  * one: each document becomes a structurally valid PNG or JPEG byte
  * stream (real signatures, real chunk / marker-segment framing, the
  * document's UTF-8 bytes riding along as IDAT / COM payload) with
  * planted dimensions derived from `doc_id`. Everything downstream —
  * the [[ImageCodec]] header parsers, frame sampling, digests — is
  * real byte-level work over those streams.
  */
case class MediaRecord(doc_id: Long, payload: Array[Byte], mime_hint: String)

/** Output of the decode pass: a REAL header parse ([[ImageCodec]]). */
case class DecodedMeta(doc_id: Long, format: String, width: Long,
    height: Long, bit_depth: Long, n_bytes: Long)

/** One sampled "frame": every Stride-th byte of the payload. */
case class Frame(doc_id: Long, frame_idx: Long, frame_byte: Long)

/** Multimodal-column tier (north-star [ext]): treat image/audio/video
  * as opaque `binary` columns with typed metadata, and run
  * decode / feature-extract / frame-sample as *batched typed
  * pipelines* (`mapPartitions` over a `Dataset[MediaRecord]` — the
  * JVM analogue of a vectorized batch UDF: one iterator per
  * partition, record batches never collected to the driver).
  *
  * REAL vs STUB (r3 item 4 closed): the codec is no longer a fake.
  * Payloads are structurally valid PNG (ISO 15948 signature + IHDR /
  * IDAT / IEND chunk framing) and JPEG (T.81 SOI + COM + SOF0 + EOI
  * marker segments) streams, and "decode" is [[ImageCodec]] — a
  * genuine chunk/segment-walking header parser. The one remaining
  * simulation is that IDAT bytes are not zlib pixel data (no codec
  * libraries in this container), which header parsing never touches;
  * chunk CRCs are planted as zero and skipped, like every fast
  * header scanner.
  *
  * Construction is one hex-string expression per format, `unhex`ed to
  * binary — chosen because DuckDB builds the byte-identical blob with
  * the same `lpad(hex(..))` arithmetic, which keeps all three queries
  * fully hash-oracled (digest over `hex(payload)` proves the streams
  * match byte-for-byte before parsing even starts).
  *
  * Scale shape: all three passes are narrow (no shuffle until the
  * final aggregate/sort); payload bytes stream through partition
  * iterators, so 100 TB of media never materializes as driver or
  * single-task state.
  */
object Multimodal {

  /** Frame-sampling stride: one sampled frame per 16 payload bytes. */
  val Stride = 16

  /** Max bytes a single JPEG COM segment can carry (2-byte length
    * field, self-inclusive): 65535 − 2. Longer documents spill the
    * remainder after EOI as trailing bytes — the standard shape of
    * real-world files with appended data, which parsers ignore.
    * Structural, so the construction never silently truncates a
    * length field at any document size.
    */
  val MaxComBytes = 65533L

  private def hexN(c: Column, digits: Int): Column =
    lpad(hex(c), digits, "0")

  /** Planted geometry (doc_id-derived so the oracle recomputes it):
    * width 1..640, height 1..480; PNG bit depth alternates 8/16 per
    * doc pair, JPEG precision is baseline 8.
    */
  private val W = lit(1L) + col("doc_id") % 640
  private val H = lit(1L) + col("doc_id") % 480
  private val BD = expr("CASE WHEN (doc_id DIV 2) % 2 = 0 THEN 8 ELSE 16 END")

  /** documents → typed media records. Even doc_ids become PNG, odd
    * become JPEG — every downstream pass handles a mixed-format
    * column, as a real crawl corpus would.
    */
  def mediaRecords(s: SparkSession, dir: String): Dataset[MediaRecord] =
    toMedia(Tables(s, dir, "documents"))

  /** Payload construction over any (doc_id, text) frame — split from
    * [[mediaRecords]] so specs can exercise edge shapes (e.g. bodies
    * past [[MaxComBytes]]) on synthetic rows.
    */
  def toMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val s = docs.sparkSession
    import s.implicits._
    val bodyHex = hex(encode(col("text"), "UTF-8"))
    val nb = (length(bodyHex) / 2).cast("long")
    val pngHex = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D49484452"), hexN(W, 8), hexN(H, 8), hexN(BD, 2),
      lit("0200000000000000"), // IHDR: colour 2, comp/filter/interlace, CRC=0
      hexN(nb, 8), lit("49444154"), bodyHex, lit("00000000"), // IDAT
      lit("0000000049454E4400000000")) // IEND
    val comLen = least(nb, lit(MaxComBytes))
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFFE"), hexN(comLen + 2, 4),
      substring(bodyHex, 1, (MaxComBytes * 2).toInt), // COM: doc bytes
      lit("FFC0001108"), hexN(H, 4), hexN(W, 4),
      lit("03011100021101031101"), // SOF0: 3 components
      lit("FFD9"), // EOI
      expr(s"substring(hex(encode(text, 'UTF-8')), ${MaxComBytes * 2 + 1})"))
    docs
      .select(col("doc_id"),
        unhex(when(col("doc_id") % 2 === 0, pngHex).otherwise(jpegHex))
          .as("payload"),
        when(col("doc_id") % 2 === 0, "image/png").otherwise("image/jpeg")
          .as("mime_hint"))
      .as[MediaRecord]
  }

  /** Batched decode pass: one partition = one iterator of records
    * (the real-pixel-codec version would reuse a decoder instance per
    * partition — exactly why this is mapPartitions and not a per-row
    * UDF). The header parse itself is [[ImageCodec.parse]].
    */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val m = ImageCodec.parse(r.payload)
      DecodedMeta(r.doc_id, m.format, m.width.toLong, m.height.toLong,
        m.bitDepth.toLong, r.payload.length.toLong)
    })
  }

  /** Frame sampling: every Stride-th byte becomes one frame row
    * (1→n explode, streamed through the partition iterator).
    */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Iterator.range(0, r.payload.length, Stride).map { off =>
        Frame(r.doc_id, (off / Stride).toLong, (r.payload(off) & 0xff).toLong)
      }
    })
  }

  // -----------------------------------------------------------------
  // mm_binary_meta: pure-SQL metadata over the binary column (no
  // decode): byte length, content digest (over the hex encoding —
  // DuckDB has no digest over BLOB, and hashing the hex string is
  // equally strong evidence the constructed streams match), magic
  // byte (0x89 for PNG, 0xFF for JPEG).
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    mediaRecords(s, dir).toDF()
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(hex(col("payload")), 256).as("sha256_hex"),
        conv(substring(hex(col("payload")), 1, 2), 16, 10).cast("long")
          .as("first_byte"))
      .orderBy("doc_id")

  // mm_decode_stats: the typed decode pipeline surfaced relationally —
  // format detected from magic bytes, dimensions and depth parsed out
  // of IHDR / SOF0 by the real chunk walk.
  def decodeStats(s: SparkSession, dir: String): DataFrame =
    decodeAll(mediaRecords(s, dir)).toDF()
      .select("doc_id", "format", "width", "height", "bit_depth", "n_bytes")
      .orderBy("doc_id")

  // mm_frame_sample: per-frame rows aggregated back to a checksum —
  // exercises the 1→n frame explode end-to-end.
  def frameChecksum(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaRecords(s, dir)).toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("frame_byte")).as("byte_sum"),
        max(col("frame_byte")).as("max_byte"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> binaryMeta,
    "mm_decode_stats" -> decodeStats,
    "mm_frame_sample" -> frameChecksum,
  )

  // ---------------------------------------------------------------
  // Oracles: DuckDB constructs the byte-identical payload hex with
  // the same lpad(hex(..)) arithmetic (uppercase hex in both
  // engines), so the digest gate proves stream equality and the
  // dimension gates prove the Spark-side parser recovers the planted
  // geometry from the actual binary format.
  private val payloadCte: String =
    s"""SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN
         '89504E470D0A1A0A' || '0000000D49484452' ||
         lpad(hex(1 + doc_id % 640), 8, '0') ||
         lpad(hex(1 + doc_id % 480), 8, '0') ||
         lpad(hex(CASE WHEN (doc_id // 2) % 2 = 0 THEN 8 ELSE 16 END),
           2, '0') ||
         '0200000000000000' ||
         lpad(hex(octet_length(encode(text))), 8, '0') || '49444154' ||
         hex(encode(text)) || '00000000' ||
         '0000000049454E4400000000'
       ELSE
         'FFD8' || 'FFFE' ||
         lpad(hex(least(octet_length(encode(text)), $MaxComBytes) + 2),
           4, '0') ||
         substr(hex(encode(text)), 1, ${MaxComBytes * 2}) ||
         'FFC0001108' ||
         lpad(hex(1 + doc_id % 480), 4, '0') ||
         lpad(hex(1 + doc_id % 640), 4, '0') ||
         '03011100021101031101' || 'FFD9' ||
         substr(hex(encode(text)), ${MaxComBytes * 2 + 1})
       END AS ph
       FROM documents"""

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      s"""WITH p AS ($payloadCte)
         SELECT doc_id, CAST(len(ph) // 2 AS BIGINT) AS n_bytes,
           sha256(ph) AS sha256_hex,
           CAST(('0x' || substr(ph, 1, 2)) AS BIGINT) AS first_byte
         FROM p ORDER BY doc_id""",
    "mm_decode_stats" ->
      s"""SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
         CAST(1 + doc_id % 640 AS BIGINT) AS width,
         CAST(1 + doc_id % 480 AS BIGINT) AS height,
         CAST(CASE WHEN doc_id % 2 = 1 THEN 8
           WHEN (doc_id // 2) % 2 = 0 THEN 8 ELSE 16 END AS BIGINT)
           AS bit_depth,
         CAST(CASE WHEN doc_id % 2 = 0
           THEN 8 + 25 + 12 + octet_length(encode(text)) + 12
           ELSE 2 + 4 + least(octet_length(encode(text)), $MaxComBytes)
             + 19 + 2 + greatest(octet_length(encode(text))
               - $MaxComBytes, 0)
           END AS BIGINT) AS n_bytes
         FROM documents ORDER BY doc_id""",
    "mm_frame_sample" ->
      s"""WITH p AS ($payloadCte),
         f AS (SELECT doc_id,
           unnest(list_transform(
             range(0, CAST((len(ph) // 2 + ${Stride - 1}) // $Stride
               AS BIGINT)),
             i -> CAST(('0x' || substr(ph,
               CAST(i * $Stride * 2 + 1 AS INTEGER), 2)) AS BIGINT)))
             AS frame_byte
           FROM p)
         SELECT doc_id, COUNT(*) AS n_frames,
           CAST(SUM(frame_byte) AS BIGINT) AS byte_sum,
           CAST(MAX(frame_byte) AS BIGINT) AS max_byte
         FROM f GROUP BY doc_id ORDER BY doc_id""",
  )
}
