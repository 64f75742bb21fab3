package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables

/** Reference-parity applications surfaced as oracle-checkable queries
  * over the `documents` fixture (doc_id as the global line number,
  * text as the line — the reference's de facto record model is the
  * text line, SURVEY.md §1.1).
  */
object TextQueries {

  /** Pattern for the grep demo — present in the fixture vocabulary. */
  val GrepPattern = "data"

  /** The fixture is a single-row-group parquet file (one scan task),
    * so the tokenize regexp must be spread over all cores first —
    * same discipline as [[TextAnalysis.docs]]. At corpus scale the
    * scan has thousands of natural splits and the exchange coalesces
    * to a no-op under AQE.
    */
  def wordcount(s: SparkSession, dir: String): DataFrame =
    WordCount(
      Tables(s, dir, "documents").repartition(col("doc_id")), "text")

  def stringMatch(s: SparkSession, dir: String): DataFrame =
    StringMatch(Tables(s, dir, "documents"), "doc_id", "text", GrepPattern)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wc_wordcount" -> wordcount,
    "sm_string_match" -> stringMatch,
  )

  val oracles: Map[String, String] = Map(
    "wc_wordcount" ->
      """SELECT upper(w) AS word, COUNT(*) AS cnt FROM (
           SELECT unnest(regexp_extract_all(text, '[A-Za-z][A-Za-z'']*')) AS w
           FROM documents)
         GROUP BY 1 ORDER BY cnt DESC, word ASC""",
    "sm_string_match" ->
      s"""SELECT doc_id AS line_no, text AS line FROM documents
         WHERE contains(lower(text), '${GrepPattern}')
         ORDER BY line_no""",
  )
}
