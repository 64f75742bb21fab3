package graft.text

import java.util.Locale

/** The reference wordcount tokenizer's *intended* semantics
  * (`examples/wordcount/wordcount.c:56-92`): a word is a maximal run
  * matching `[A-Za-z][A-Za-z']*` — apostrophe is a word character only
  * after a leading letter (char classes at `wordcount.c:71,81`) — and
  * is folded to UPPER before grouping (`wordcount.c:17-22,74`).
  * Digits, punctuation and non-ASCII bytes are separators.
  *
  * This scala implementation is the golden oracle for property tests;
  * the distributed path uses the same regex through
  * `regexp_extract_all` (codegen'd, no closure serialization).
  */
object RefTokenizer {
  /** Keep in sync with [[WordCount.WordRegex]]. */
  val WordRegexStr = "[A-Za-z][A-Za-z']*"
  private val WordRegex = WordRegexStr.r

  def tokenize(line: String): Iterator[String] =
    WordRegex.findAllIn(line).map(_.toUpperCase(Locale.ROOT))
}
