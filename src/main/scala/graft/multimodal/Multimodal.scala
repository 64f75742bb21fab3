package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A media payload: opaque bytes + typed metadata. The fixture corpus
  * has no real image/audio column, so the payload is the UTF-8 bytes
  * of `documents.text` — an opaque stand-in with the same plumbing
  * shape (binary column + metadata travelling beside it).
  */
case class MediaRecord(doc_id: Long, payload: Array[Byte], mime_hint: String)

/** Deterministic fake "decoded frame header" — see [[Multimodal.fakeDecode]]. */
case class DecodedMeta(doc_id: Long, width: Int, height: Int,
    n_bytes: Long, mean_byte: Double, n_frames: Long)

/** One sampled "frame": every Stride-th byte of the payload. */
case class Frame(doc_id: Long, frame_idx: Long, frame_byte: Long)

/** Multimodal-column tier (north-star [ext]): treat image/audio/video
  * as opaque `binary` columns with typed metadata, and run
  * decode / feature-extract / frame-sample as *batched typed
  * pipelines* (`mapPartitions` over a `Dataset[MediaRecord]` — the
  * JVM analogue of a vectorized batch UDF: one iterator per
  * partition, record batches never collected to the driver).
  *
  * REAL vs STUB: the Spark-side plumbing is real — binary column
  * construction, case-class Encoders, partition-iterator batching,
  * explode of 1→n frame rows. The *decoder* is a clearly-marked
  * deterministic fake ([[Multimodal.fakeDecode]]): this container has no
  * image/audio codecs, so "decoding" derives dimensions and pixel
  * stats arithmetically from the bytes. Swapping in a real codec
  * changes only that one function; every schema, partitioning and
  * batch-shape decision stays.
  *
  * Scale shape: all three passes are narrow (no shuffle until the
  * final aggregate/sort); payload bytes stream through partition
  * iterators, so 100 TB of media never materializes as driver or
  * single-task state. Because the fake decode is arithmetic on
  * bytes, every query still has a full DuckDB oracle (character
  * codes mirror payload bytes for ASCII text).
  */
object Multimodal {

  /** Frame-sampling stride: one sampled frame per 16 payload bytes. */
  val Stride = 16

  /** documents → typed media records (binary payload column). */
  def mediaRecords(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime_hint"))
      .as[MediaRecord]
  }

  /** STUB DECODER — deterministic fake standing in for an image/audio
    * codec (no codec libraries in this container). Derives a fake
    * frame geometry and byte statistics from the payload alone:
    * width = 1 + first_byte mod 64, height = 1 + n_bytes mod 48,
    * mean_byte = average unsigned byte value, n_frames = number of
    * Stride-sampled frames. Replace this body with a real codec to
    * productionize; signature and batching stay unchanged.
    */
  def fakeDecode(r: MediaRecord): DecodedMeta = {
    val n = r.payload.length.toLong
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
    DecodedMeta(
      doc_id = r.doc_id,
      width = 1 + (if (n == 0) 0 else (r.payload(0) & 0xff) % 64),
      height = 1 + (n % 48).toInt,
      n_bytes = n,
      mean_byte = if (n == 0) 0.0 else sum.toDouble / n,
      n_frames = (n + Stride - 1) / Stride)
  }

  /** Batched decode pass: one partition = one iterator of records,
    * decoded lazily (the real-codec version would reuse a decoder
    * instance per partition — exactly why this is mapPartitions and
    * not a per-row UDF).
    */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(fakeDecode))
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
  // decode): byte length, content digest, leading byte.
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    mediaRecords(s, dir).toDF()
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha256_hex"),
        ascii(substring(decode(col("payload"), "UTF-8"), 1, 1)).cast("long")
          .as("first_byte"))
      .orderBy("doc_id")

  // mm_decode_stats: the typed decode pipeline surfaced relationally.
  def decodeStats(s: SparkSession, dir: String): DataFrame =
    decodeAll(mediaRecords(s, dir)).toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("n_bytes"),
        col("mean_byte"), col("n_frames"))
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
  // Oracles: byte-accurate regardless of content — payload bytes are
  // recovered in DuckDB as hex(encode(text)) parsed two digits at a
  // time, so newlines and multi-byte UTF-8 agree with the Spark-side
  // UTF-8 byte array exactly (a '.' regexp would drop '\n' and count
  // code points, not bytes).
  private val bytesCte: String =
    """SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n,
       list_transform(range(0, CAST(octet_length(encode(text)) AS BIGINT)),
         i -> CAST('0x' || substr(hex(encode(text)),
           CAST(i * 2 + 1 AS INTEGER), 2) AS BIGINT)) AS bytes
       FROM documents"""

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS sha256_hex,
         CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
         FROM documents ORDER BY doc_id""",
    "mm_decode_stats" ->
      s"""WITH b AS ($bytesCte)
         SELECT doc_id,
           CAST(1 + CASE WHEN n = 0 THEN 0 ELSE bytes[1] % 64 END
             AS BIGINT) AS width,
           CAST(1 + n % 48 AS BIGINT) AS height,
           n AS n_bytes,
           CASE WHEN n = 0 THEN 0.0 ELSE
             CAST(CAST(list_sum(list_prepend(CAST(0 AS BIGINT), bytes))
               AS DOUBLE) / n AS DOUBLE) END AS mean_byte,
           CAST((n + ${Stride - 1}) // $Stride AS BIGINT) AS n_frames
         FROM b ORDER BY doc_id""",
    "mm_frame_sample" ->
      s"""WITH b AS ($bytesCte),
         f AS (SELECT doc_id,
           unnest(list_transform(range(0, CAST((n + ${Stride - 1})
             // $Stride AS BIGINT)), i -> bytes[CAST(i * $Stride + 1
             AS INTEGER)])) AS frame_byte
           FROM b WHERE n > 0)
         SELECT doc_id, COUNT(*) AS n_frames,
           CAST(SUM(frame_byte) AS BIGINT) AS byte_sum,
           CAST(MAX(frame_byte) AS BIGINT) AS max_byte
         FROM f GROUP BY doc_id ORDER BY doc_id""",
  )
}
