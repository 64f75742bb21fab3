package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.text.HtmlExtract.{blocks, kept, Block}

/** The tag walker's lenient-parse goldens (VERDICT r7 item 4's
  * malformed-markup gate): hand-derived block structures for the tag
  * soup a web-corpus extractor actually meets. Each case pins the
  * exact (order, text, linkChars, boiler) tuple set.
  */
class HtmlExtractSpec extends AnyFunSuite {

  private def simple(html: String): Seq[(String, Long, Boolean)] =
    blocks(html).map(b => (b.text, b.linkChars, b.boiler))

  test("well-formed page: content vs boilerplate vs link density") {
    val h = "<html><head><title>t</title></head><body>" +
      "<nav><a href=\"/\">home</a></nav>" +
      "<div id=\"main\"><p>real content here</p>" +
      "<p><a href=\"/x\">tiny</a></p></div>" +
      "<footer>legal</footer></body></html>"
    val bs = blocks(h)
    assert(simple(h) === Seq(
      ("t", 0L, true),
      ("home", 4L, true),
      ("real content here", 0L, false),
      ("tiny", 4L, false),
      ("legal", 0L, true)))
    // density: the all-link paragraph drops, the plain one stays.
    assert(bs.filter(kept).map(_.text) === Vector("real content here"))
  }

  test("unclosed tags at EOF are implicitly closed, text kept") {
    assert(simple("<body><p>dangling paragraph") ===
      Seq(("dangling paragraph", 0L, false)))
  }

  test("stray close tags are ignored; pop-until-match closes " +
      "intervening unclosed elements") {
    // </div> closes the unclosed <p> too; the trailing </p> is stray.
    assert(simple("<div><p>a b c</div>tail</p>") ===
      Seq(("a b c", 0L, false), ("tail", 0L, false)))
  }

  test("quoted '>' inside attributes does not end the tag") {
    assert(simple("<p><a href=\"/x>y\" title='2>1'>link</a> text</p>") ===
      Seq(("link text", 4L, false)))
  }

  test("comments are skipped even when they contain tags") {
    assert(simple("<p>keep <!-- <p>ghost</p> --> this</p>") ===
      Seq(("keep  this", 0L, false)))
  }

  test("script/style content is dropped entirely, even with markup " +
      "inside; unterminated raw text runs to EOF") {
    assert(simple("<body><script>if (a<b) { x('<p>no</p>') }</script>" +
      "<p>yes</p></body>") === Seq(("yes", 0L, false)))
    assert(simple("<style>p { color: red }</style><p>ok</p>") ===
      Seq(("ok", 0L, false)))
    assert(simple("<p>before</p><script>never closed") ===
      Seq(("before", 0L, false)))
  }

  test("uppercase tags fold to lowercase; self-closing blocks emit " +
      "nothing; '<' not starting a tag is literal text") {
    assert(simple("<P>Mixed <B>Case</B></P>") ===
      Seq(("Mixed Case", 0L, false)))
    assert(simple("<div/><p>after</p>") === Seq(("after", 0L, false)))
    assert(simple("<p>3 < 5 and 7 > 2</p>") ===
      Seq(("3 < 5 and 7 > 2", 0L, false)))
  }

  test("text outside any block lands in the virtual root block") {
    assert(simple("stray text only") === Seq(("stray text only", 0L, false)))
  }

  test("blocks nested inside boilerplate are boilerplate; nested " +
      "content blocks emit separately in open order") {
    assert(simple("<footer><p>fine print</p></footer>") ===
      Seq(("fine print", 0L, true)))
    val bs = blocks("<div>outer <p>inner</p> tail</div>")
    assert(bs.map(_.text) === Vector("outer  tail", "inner"))
    assert(bs.map(_.order) === bs.map(_.order).sorted)
  }

  test("nested anchors count link chars once per char; whitespace " +
      "between tags trims at block edges only") {
    assert(simple("<p> <a>x<a>y</a></a>z </p>") ===
      Seq(("xyz", 2L, false)))
  }

  test("the five escape entities decode to raw characters (ADVICE " +
      "r8 inverse-escape contract); unknown entities stay literal") {
    assert(simple("<p>a&amp;b &lt;tag&gt; &quot;q&quot; &#39;x&#39;</p>")
      === Seq(("a&b <tag> \"q\" 'x'", 0L, false)))
    // decoded chars count once inside anchors (raw-length link count)
    assert(simple("<p><a>&amp;&lt;&gt;</a></p>")
      === Seq(("&<>", 3L, false)))
    // anything else after '&' is literal text, including near-misses
    assert(simple("<p>&amp x &unknown; &#40;</p>")
      === Seq(("&amp x &unknown; &#40;", 0L, false)))
  }
}
