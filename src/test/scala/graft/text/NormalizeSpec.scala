package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unicode normalization goldens (VERDICT r8 item 4): the
  * combining-character and compatibility cases the ASCII fixture
  * cannot exercise, plus the fixture-level invariants of the
  * ta_normalize mirrored construction.
  */
class NormalizeSpec extends SparkSpec {

  test("NFC goldens: recomposition, canonical reordering, idempotence") {
    // e + COMBINING ACUTE recomposes to U+00E9
    assert(Normalize.nfc("e\u0301") == "\u00e9")
    // A + COMBINING RING ABOVE recomposes to U+00C5
    assert(Normalize.nfc("A\u030a") == "\u00c5")
    // canonical reordering THEN composition: e + ccc220 + ccc230 in
    // either input order — the above-mark (U+0301, ccc 230) composes
    // across the below-mark (U+0316, ccc 220; not blocked), leaving
    // U+00E9 + combining-below
    assert(Normalize.nfc("e\u0316\u0301") == "\u00e9\u0316")
    assert(Normalize.nfc("e\u0301\u0316") == "\u00e9\u0316")
    // precomposed input is a fixpoint; ASCII is identity
    assert(Normalize.nfc("\u00e9") == "\u00e9")
    assert(Normalize.nfc("plain ascii 123!") == "plain ascii 123!")
    // singleton decomposition: ANGSTROM SIGN U+212B normalizes to
    // U+00C5 LATIN CAPITAL A WITH RING
    assert(Normalize.nfc("\u212b") == "\u00c5")
  }

  test("NFKC + case-fold goldens: ligature, superscript, fullwidth, " +
    "dotted capital I") {
    assert(Normalize.nfkcFold("\ufb01nd") == "find") // fi ligature
    assert(Normalize.nfkcFold("x\u00b2") == "x2")    // superscript 2
    assert(Normalize.nfkcFold("\uff21\uff22") == "ab") // fullwidth AB
    // U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE lowercases (ROOT
    // locale) to i + COMBINING DOT ABOVE — the classic Turkish-I trap
    // a locale-dependent fold would mis-handle
    assert(Normalize.nfkcFold("\u0130") == "i\u0307")
    // NFKC does NOT fold case by itself; the fold is ours
    assert(java.text.Normalizer.normalize("AB",
      java.text.Normalizer.Form.NFKC) == "AB")
  }

  test("ta_normalize fixture invariants: construction really " +
    "denormalizes, NFC restores the raw codepoint count") {
    val rows = Normalize.normalizeNfc(spark, sf)
    // recomposition collapses every e+mark back to one codepoint
    assert(rows.filter(col("n_chars_nfc") =!= col("n_chars_raw"))
      .count() == 0L)
    // every doc containing an 'e' was genuinely rewritten, and the
    // deco inflation is exactly the number of e's
    val bad = rows
      .join(graft.Tables(spark, sf, "documents"), "doc_id")
      .withColumn("n_e",
        (length(col("text")) -
          length(replace(col("text"), lit("e"), lit("")))).cast("long"))
      .filter(
        (col("n_chars_deco") - col("n_chars_raw") =!= col("n_e")) ||
        (col("changed") =!= (col("n_e") > 0)))
      .count()
    assert(bad == 0L)
  }
}
