package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** HTML / BOILERPLATE EXTRACTION (VERDICT r7 item 4): the FIRST
  * operator of every real web-corpus pipeline — strip markup,
  * classify text blocks into main content vs boilerplate, and keep
  * only the content (the trafilatura/jusText stage). Two halves:
  *
  *  - [[blocks]]: a LENIENT single-pass tag walk (the wire-format
  *    discipline of [[graft.multimodal.AvCodec]], applied to text) —
  *    element stack, comment/raw-text (`script`/`style`) skipping,
  *    quoted-attribute-aware tag scanning, implicit closes at EOF,
  *    stray close tags ignored. Text nodes accumulate into the
  *    innermost open BLOCK element; a block inside `nav`, `footer`,
  *    `header`, `aside`, `title` (or `script`/`style`) is
  *    boilerplate BY TAG; every other text block is scored by LINK
  *    DENSITY — anchor-text chars vs total chars — and dropped when
  *    `link·5 > len·2` (density > 0.4, integer arithmetic, the
  *    jusText heuristic). Lenient by design: a boilerplate stripper
  *    must survive the web's tag soup, so malformed markup degrades
  *    (spec-gated goldens) instead of throwing.
  *  - `ta_html_extract`: the oracle gate, on MIRRORED CONSTRUCTION
  *    (the mm_av_meta discipline): both engines synthesize the
  *    identical structurally-valid page per document — title + nav +
  *    one `<p>` per [[ParMax]]-token slice (every 5th paragraph,
  *    doc_id-phased, carries its first token as a link) + a
  *    link-only "related" div + footer — the engine PARSES the page
  *    back while the oracle computes the expected extraction from
  *    the construction arithmetic, and a sha-256 of the page string
  *    proves byte-identical synthesis. Short tail paragraphs whose
  *    linked first token crosses the density threshold are dropped
  *    by BOTH sides' arithmetic (26 docs at sf0.01 have 1-token
  *    tails), so the threshold is genuinely exercised.
  *
  * Out of scope (documented, not silently wrong): only the five
  * markup-escape entities (`&amp; &lt; &gt; &quot; &#39;`) decode in
  * text nodes — the exact inverse of the synthesis escape (ADVICE
  * r8), so any corpus text round-trips through the page byte-for-
  * byte; all other entities stay literal. The HTML5 implicit-close
  * rules (e.g. a second `<p>` closing the first) are not applied — a
  * close tag, raw-text exit, or EOF closes an element.
  *
  * 100 TB shape: a narrow per-row walk with no shuffle before the
  * presentation sort — the same class as the multimodal decoders;
  * block stats and hashes are computed inside the single typed pass.
  */
object HtmlExtract {

  val ParMax = 20

  /** Tags whose subtree is boilerplate by position. */
  val BoilerTags: Set[String] =
    Set("nav", "footer", "header", "aside", "title", "script", "style")

  /** Elements that open a text block. */
  val BlockTags: Set[String] =
    Set("html", "body", "p", "div", "nav", "footer", "header", "aside",
      "title", "li", "ul", "ol", "section", "article", "td", "th",
      "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre")

  /** Raw-text elements: content is NOT document text (dropped
    * entirely, the jusText convention) and may contain `<`.
    */
  val RawTextTags: Set[String] = Set("script", "style")

  /** A text-bearing block in document (open-order) position. */
  final case class Block(order: Int, text: String, linkChars: Long,
      boiler: Boolean)

  /** order < 0 = not yet anchored (the virtual root takes its
    * document position from its FIRST text character, so stray text
    * after the last block sorts after it, not before everything).
    */
  private final class OpenBlock(var order: Int, val boiler: Boolean) {
    val sb = new StringBuilder
    var link = 0L
  }

  /** The tag walk. Returns nonempty (trimmed) text blocks in open
    * order.
    */
  def blocks(html: String): Vector[Block] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    // Element stack entries: (tag, openedBlock?) — the block stack is
    // parallel but only block tags push onto it.
    val elems = scala.collection.mutable.Stack.empty[(String, Boolean)]
    val blks = scala.collection.mutable.Stack.empty[OpenBlock]
    blks.push(new OpenBlock(-1, false)) // virtual root for stray text
    var order = 1
    var boilerDepth = 0
    var linkDepth = 0
    val n = html.length
    var i = 0

    def emit(b: OpenBlock): Unit = {
      val t = b.sb.toString.trim
      if (t.nonEmpty) out += Block(b.order, t, b.link, b.boiler)
    }
    def closeOne(): Unit = {
      val (tag, wasBlock) = elems.pop()
      if (BoilerTags(tag)) boilerDepth -= 1
      if (tag == "a") linkDepth -= 1
      if (wasBlock) emit(blks.pop())
    }
    def lower(c: Char): Char =
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 3 < n && html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        i = if (e < 0) n else e + 3
      } else if (c == '<' && i + 1 < n && html.charAt(i + 1) == '/') {
        // close tag: lenient pop-until-match; unmatched → ignored.
        var j = i + 2
        val name = new StringBuilder
        while (j < n && html.charAt(j).isLetterOrDigit) {
          name.append(lower(html.charAt(j))); j += 1
        }
        while (j < n && html.charAt(j) != '>') j += 1
        i = if (j < n) j + 1 else n
        val t = name.toString
        if (elems.exists(_._1 == t))
          while ({ val top = elems.top._1; closeOne(); top != t }) ()
      } else if (c == '<' && i + 1 < n &&
          html.charAt(i + 1).isLetter) {
        var j = i + 1
        val name = new StringBuilder
        while (j < n && html.charAt(j).isLetterOrDigit) {
          name.append(lower(html.charAt(j))); j += 1
        }
        // attribute scan, honoring quoted values (a '>' inside
        // quotes does not end the tag).
        var quote: Char = 0
        var selfClose = false
        var done = false
        while (j < n && !done) {
          val ch = html.charAt(j)
          if (quote != 0) { if (ch == quote) quote = 0 }
          else if (ch == '"' || ch == '\'') quote = ch
          else if (ch == '>') done = true
          else if (ch == '/' && j + 1 < n && html.charAt(j + 1) == '>')
            selfClose = true
          j += 1
        }
        i = j
        val t = name.toString
        if (BoilerTags(t)) boilerDepth += 1
        if (t == "a") linkDepth += 1
        val isBlock = BlockTags(t)
        elems.push((t, isBlock))
        if (isBlock) {
          blks.push(new OpenBlock(order, boilerDepth > 0))
          order += 1
        }
        if (selfClose) closeOne()
        else if (RawTextTags(t)) {
          // consume raw content up to the matching close tag; the
          // content is not document text. ASCII case-insensitive
          // scan in place — NOT html.toLowerCase.indexOf: that
          // allocates an O(n) copy per raw-text tag (quadratic on
          // script-heavy pages) and toLowerCase can CHANGE length
          // for some codepoints (e.g. İ), misaligning indices.
          val close = s"</$t"
          var e = -1
          var p = i
          while (e < 0 && p + close.length <= n) {
            if (html.regionMatches(true, p, close, 0, close.length))
              e = p
            p += 1
          }
          if (e < 0) { i = n; closeOne() }
          else {
            var k = e + close.length
            while (k < n && html.charAt(k) != '>') k += 1
            i = if (k < n) k + 1 else n
            closeOne()
          }
        }
      } else {
        if (blks.top.order < 0) { blks.top.order = order; order += 1 }
        // Minimal entity decode — the exact inverse of the synthesis
        // escape (ADVICE r8), so block text and link counts are RAW
        // characters. Only the five escape entities decode; any other
        // `&...` stays literal (documented out-of-scope behavior).
        var ch = c
        var adv = 1
        if (c == '&') Entities.find { case (e, _) =>
          html.startsWith(e, i)
        }.foreach { case (e, d) => ch = d; adv = e.length }
        blks.top.sb.append(ch)
        if (linkDepth > 0) blks.top.link += 1
        i += adv
      }
    }
    while (elems.nonEmpty) closeOne()
    emit(blks.pop()) // the virtual root
    out.sortBy(_.order).toVector
  }

  /** A content block survives when its link density is ≤ 0.4:
    * link·5 ≤ len·2, exact integers.
    */
  def kept(b: Block): Boolean =
    !b.boiler && b.linkChars * 5 <= b.text.length.toLong * 2

  // -----------------------------------------------------------------
  // Synthesis (Spark side of the mirrored construction).

  /** HTML-escape the five markup metacharacters (ADVICE r8: raw
    * corpus text embedded unescaped desynchronized the parsed
    * extraction from the oracle arithmetic on any corpus containing
    * them). `&` FIRST — escaping is not idempotent otherwise. The
    * parser's entity decode below is the exact inverse, so block
    * text and link-char counts stay in RAW characters and the
    * construction arithmetic (plen/plink over raw ptext) is
    * untouched. DuckDB twin: [[dEsc]].
    */
  private def esc(c: Column): Column =
    replace(replace(replace(replace(replace(c,
      lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")),
      lit(">"), lit("&gt;")),
      lit("\""), lit("&quot;")),
      lit("'"), lit("&#39;"))

  private def dEsc(x: String): String =
    s"""replace(replace(replace(replace(replace($x,
       '&', '&amp;'),
       '<', '&lt;'),
       '>', '&gt;'),
       '"', '&quot;'),
       '''', '&#39;')"""

  /** The entities [[esc]] emits, decoded by the parser's text
    * accumulation (longest first is irrelevant — none is a prefix of
    * another).
    */
  private val Entities: Seq[(String, Char)] = Seq(
    ("&amp;", '&'), ("&lt;", '<'), ("&gt;", '>'),
    ("&quot;", '"'), ("&#39;", '\''))

  private[graft] def pageHtml: Column = {
    val toks = split(col("text"), " ")
    val nPar = expr(s"CAST((size(split(text, ' ')) + ${ParMax - 1}) " +
      s"/ $ParMax AS INT)")
    val parHtml = transform(sequence(lit(0), nPar - 1), i => {
      val ptext = array_join(
        slice(toks, i * ParMax + lit(1), lit(ParMax)), " ")
      val tok0 = element_at(toks, i * ParMax + lit(1))
      val rest = array_join(
        slice(toks, i * ParMax + lit(2), lit(ParMax - 1)), " ")
      val linked = (i + col("doc_id")) % 5 === 0
      concat(lit("<p>"),
        when(linked, concat(lit("<a href=\"/t\">"), esc(tok0),
          lit("</a>"),
          when(length(rest) > 0, concat(lit(" "), esc(rest)))
            .otherwise(lit(""))))
          .otherwise(esc(ptext)),
        lit("</p>"))
    })
    concat(
      lit("<html><head><title>doc "), col("doc_id").cast("string"),
      lit("</title></head><body>"),
      lit("<nav><a href=\"/h\">home</a> <a href=\"/a\">about</a></nav>"),
      lit("<div id=\"main\">"), array_join(parHtml, ""), lit("</div>"),
      lit("<div class=\"rel\"><a href=\"/r1\">read more</a> " +
        "<a href=\"/r2\">see also</a></div>"),
      lit("<footer>copyright corp <a href=\"/tos\">terms</a></footer>"),
      lit("</body></html>"))
  }

  // -----------------------------------------------------------------
  // ta_html_extract: parse the synthesized page back; per doc report
  // text-bearing blocks, kept content blocks, kept chars, anchor
  // chars over content blocks, the page sha-256 (construction
  // equality) and the md5 of the extracted text (newline-joined kept
  // blocks in document order).
  def htmlExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pages = Tables(s, dir, "documents").repartition(col("doc_id"))
      .select(col("doc_id"), pageHtml.as("html"))
      .as[(Long, String)]
    pages.mapPartitions { it =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      val md5d = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, html) =>
        val bs = blocks(html)
        val keep = bs.filter(kept)
        sha.reset()
        val hsha = sha.digest(html.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        md5d.reset()
        val emd5 = md5d.digest(keep.map(_.text).mkString("\n")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        (id, bs.length.toLong, keep.length.toLong,
          keep.map(_.text.length.toLong).sum,
          bs.filterNot(_.boiler).map(_.linkChars).sum,
          hsha, emd5)
      }
    }.toDF("doc_id", "n_blocks", "n_kept", "kept_chars", "link_chars",
      "html_sha256", "extract_md5")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_html_extract" -> htmlExtract,
  )

  // ---------------------------------------------------------------
  // Oracle: the same page string built in DuckDB (sha-256 must
  // match = byte-identical synthesis) and the expected extraction
  // computed from the construction arithmetic — paragraph slices,
  // linked-first-token lengths, the same integer density threshold.
  // Anchor chars of the rel div: "read more" (9) + "see also" (8).
  val oracles: Map[String, String] = Map(
    "ta_html_extract" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
         par AS (SELECT doc_id, toks,
             unnest(range(0, (len(toks) + ${ParMax - 1}) // $ParMax))
               AS pi
           FROM t),
         p2 AS (SELECT doc_id, pi,
             array_to_string(
               toks[pi*$ParMax + 1 : pi*$ParMax + $ParMax], ' ')
               AS ptext,
             toks[pi*$ParMax + 1] AS tok0,
             array_to_string(
               toks[pi*$ParMax + 2 : pi*$ParMax + $ParMax], ' ')
               AS rest,
             ((pi + doc_id) % 5 = 0) AS linked
           FROM par),
         ph AS (SELECT doc_id, pi, ptext, tok0, linked,
             '<p>' || CASE WHEN linked THEN
               '<a href="/t">' || ${dEsc("tok0")} || '</a>' ||
               CASE WHEN length(rest) > 0
                 THEN ' ' || ${dEsc("rest")} ELSE '' END
             ELSE ${dEsc("ptext")} END || '</p>' AS phtml
           FROM p2),
         pstat AS (SELECT doc_id, pi, ptext,
             CAST(length(ptext) AS BIGINT) AS plen,
             CASE WHEN linked THEN CAST(length(tok0) AS BIGINT)
               ELSE 0 END AS plink
           FROM p2 WHERE length(ptext) > 0),
         agg AS (SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_paras,
             CAST(SUM(CASE WHEN plink * 5 <= plen * 2 THEN 1 ELSE 0
               END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN plink * 5 <= plen * 2 THEN plen
               ELSE 0 END) AS BIGINT) AS kept_chars,
             CAST(SUM(plink) AS BIGINT) AS p_link,
             md5(COALESCE(string_agg(
               CASE WHEN plink * 5 <= plen * 2 THEN ptext END,
               chr(10) ORDER BY pi), '')) AS extract_md5
           FROM pstat GROUP BY doc_id),
         page AS (SELECT t.doc_id,
             '<html><head><title>doc ' || CAST(t.doc_id AS VARCHAR)
             || '</title></head><body>'
             || '<nav><a href="/h">home</a> <a href="/a">about</a></nav>'
             || '<div id="main">'
             || COALESCE((SELECT string_agg(phtml, '' ORDER BY pi)
                  FROM ph WHERE ph.doc_id = t.doc_id), '')
             || '</div>'
             || '<div class="rel"><a href="/r1">read more</a> '
             || '<a href="/r2">see also</a></div>'
             || '<footer>copyright corp <a href="/tos">terms</a></footer>'
             || '</body></html>' AS h
           FROM t)
         SELECT agg.doc_id,
           agg.n_paras + 4 AS n_blocks,
           agg.n_kept, agg.kept_chars,
           agg.p_link + 17 AS link_chars,
           sha256(page.h) AS html_sha256,
           agg.extract_md5
         FROM agg JOIN page ON page.doc_id = agg.doc_id
         ORDER BY agg.doc_id""",
  )
}
