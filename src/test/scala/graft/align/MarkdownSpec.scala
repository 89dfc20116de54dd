package graft.align

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Pinned-spec contract of the HTML→Markdown converter: each rendering
  * rule of the Markdown.scala scaladoc spec binds on its own, plus the
  * malformed-input guarantees (unterminated tag, stray closes, unknown
  * tags) that make the kernel total over crawl bytes.
  */
class MarkdownSpec extends AnyFunSuite {

  private def md(html: String): Markdown.Conversion =
    Markdown.convert(html.getBytes(StandardCharsets.UTF_8))

  test("headings render with level-many hashes") {
    val c = md("<h1>Top</h1><h3>Sub &amp; co</h3>")
    assert(c.markdown === "# Top\n\n### Sub & co")
    assert(c.nBlocks === 2)
  }

  test("inline emphasis, code, and links") {
    val c = md("<p>a <b>bold</b> and <em>it</em> <code>x=1</code> " +
      "<a href=\"/p?q=1&amp;r=2\">go there</a> tail</p>")
    assert(c.markdown ===
      "a **bold** and *it* `x=1` [go there](/p?q=1&r=2) tail")
  }

  test("anchor without href renders bare text; empty anchor vanishes") {
    assert(md("<p><a>just text</a></p>").markdown === "just text")
    assert(md("<p>x <a href=\"/y\"></a> z</p>").markdown === "x z")
  }

  test("nested lists: markers, numbering, two-space indent") {
    val c = md("<ul><li>one</li><li>two<ol><li>a</li><li>b</li></ol></li>" +
      "<li>three</li></ul>")
    assert(c.markdown === "- one\n- two\n  1. a\n  2. b\n- three")
    assert(c.nBlocks === 1)
  }

  test("ordered-list numbering restarts per list") {
    val c = md("<ol><li>x</li></ol><ol><li>y</li></ol>")
    assert(c.markdown === "1. x\n\n1. y")
  }

  test("blockquote prefixes every line, nesting stacks") {
    val c = md("<blockquote><p>a</p><blockquote><p>b</p></blockquote>" +
      "<ul><li>c</li><li>d</li></ul></blockquote>")
    assert(c.markdown === "> a\n\n> > b\n\n> - c\n> - d")
  }

  test("pre preserves internal whitespace, strips edge newlines, fences") {
    val c = md("<pre>\nline  one\n  line two\n</pre>")
    assert(c.markdown === "```\nline  one\n  line two\n```")
  }

  test("table with all-th first row gets a separator; pipes escape") {
    val c = md("<table><tr><th>K</th><th>V</th></tr>" +
      "<tr><td>a|b</td><td>c</td></tr></table>")
    assert(c.markdown ===
      "| K | V |\n| --- | --- |\n| a\\|b | c |")
    assert(c.tables === Vector(
      Markdown.Cell(0, 0, 0, isHeader = true, "K"),
      Markdown.Cell(0, 0, 1, isHeader = true, "V"),
      Markdown.Cell(0, 1, 0, isHeader = false, "a|b"),
      Markdown.Cell(0, 1, 1, isHeader = false, "c")))
  }

  test("headerless table emits no separator; table_idx increments") {
    val c = md("<table><tr><td>a</td></tr></table>" +
      "<table><tr><td>b</td></tr></table>")
    assert(c.markdown === "| a |\n\n| b |")
    assert(c.tables.map(_.tableIdx) === Vector(0, 1))
  }

  test("hr and br") {
    assert(md("<p>a<br>b</p><hr><p>c</p>").markdown === "a b\n\n---\n\nc")
  }

  test("unknown tags are transparent; script/style subtrees drop") {
    val c = md("<p><span class=\"z\">in</span> out</p>" +
      "<script>var x='<p>no</p>';</script><custom>keep</custom>")
    assert(c.markdown === "in out\n\nkeep")
  }

  test("malformed input is total: unterminated tag, stray closes") {
    assert(md("<p>a</p><p>b < c").markdown === "a\n\nb < c")
    assert(md("</div></p>text</b>").markdown === "text")
    assert(md("").markdown === "")
    assert(Markdown.convert(null).nBlocks === 0)
  }

  test("whitespace collapse is ASCII-pinned") {
    // named &nbsp; is pinned to a plain space (entity table) and
    // collapses; NUMERIC &#160; decodes to U+00A0, which the ASCII-pinned
    // run regex must NOT collapse (Java \s and Python \s disagree on it)
    assert(md("<p>a&nbsp;b   c</p>").markdown === "a b c")
    assert(md("<p>a&#160;b</p>").markdown === "a b")
  }

  test("numeric entities decode in text and href") {
    val c = md("<p><a href=\"/x&#63;y\">t&#8212;d</a></p>")
    assert(c.markdown === "[t—d](/x?y)")
  }

  test("regex whitespace classes are ASCII-pinned, not \\s") {
    // NBSP before the close-tag '>' is NOT pinned whitespace: the style
    // subtree is not dropped, so its text renders (both engines agree —
    // python \s would have dropped it while Java \s would not)
    assert(md("<style>x{}</style >tail").markdown
      .contains("x{}"))
    // pinned ASCII whitespace around href '=' still parses
    assert(md("<p><a href\t=\n\"/y\">t</a></p>").markdown === "[t](/y)")
  }

  test("tag names lowercase via Locale.ROOT (tr-locale immune)") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val c = md("<UL><LI>one</LI><LI><I>two</I></LI></UL><DIV>p</DIV>")
      assert(c.markdown === "- one\n- *two*\n\np")
    } finally java.util.Locale.setDefault(saved)
  }

  test("adversarial: 200k-tag unclosed-anchor flood completes (O(n) match)") {
    // a per-open forward scan would be ~10^10 steps here; the one-pass
    // match index makes it linear
    val html = "<a>" * 200000 + "x"
    val t0 = System.nanoTime()
    val c = md(html)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(c.markdown === "x")
    assert(sec < 10.0, f"flood took $sec%.1f s — matching is not linear")
  }

  test("adversarial: deep nesting is capped, never a stack overflow") {
    // 5000 nested <b>: past MaxNest the opens render transparently
    val bold = "<b>" * 5000 + "core" + "</b>" * 5000
    assert(md(bold).markdown.contains("core"))
    // 5000 nested blockquotes
    val bq = "<blockquote>" * 5000 + "<p>q</p>" + "</blockquote>" * 5000
    assert(md(bq).markdown.contains("q"))
    // 400 nested lists
    val ul = "<ul><li>i" * 400 + "</li></ul>" * 400
    assert(md(ul).markdown.contains("i"))
  }

  test("text is never lost at the MaxNest boundary") {
    // a ul entered just below the cap: li items still render
    val nearCap = "<div>" * 99 + "<ul><li>item text</li></ul>" + "</div>" * 99
    assert(md(nearCap).markdown.contains("item text"))
    // well past the cap: list/table tags go transparent, text survives
    val pastCap = "<div>" * 150 +
      "<table><tr><td>cell text</td></tr></table>" + "</div>" * 150
    assert(md(pastCap).markdown.contains("cell text"))
    // nested lists beyond the recursion gate render their text inline
    val deepList = "<ul><li>t" * 150 + "</li></ul>" * 150
    val out = md(deepList).markdown
    assert(out.count(_ == 't') === 150, "every item's text must survive")
  }

  test("block-level inline delegation matches in-paragraph rendering") {
    // the same <a>/<b> outside any block container must render exactly
    // as inside one (single renderInline implementation)
    val bare = md("<a href=\"/z\">go</a> and <b>bold</b>").markdown
    val inP = md("<p><a href=\"/z\">go</a> and <b>bold</b></p>").markdown
    assert(bare === inP)
    assert(bare === "[go](/z) and **bold**")
  }
}
