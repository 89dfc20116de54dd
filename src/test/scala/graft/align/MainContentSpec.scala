package graft.align

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Rule-level contract of the density-based main-content extractor: each
  * of the four ordered rules must bind on its own, in order.
  */
class MainContentSpec extends AnyFunSuite {

  private def extract(html: String) =
    MainContent.extract(html.getBytes(StandardCharsets.UTF_8))

  test("r1: link-dense block is killed even when long") {
    val para = "word " * 20 // 100 chars of plain text
    val html =
      s"""<body><div><a href="/">${"linktext " * 15}</a></div><p>$para</p></body>"""
    val e = extract(html)
    assert(e.nBlocks === 2)
    assert(e.nKept === 1)
    assert(e.content === para.trim)
  }

  test("r2: long link-free block is content regardless of language") {
    val e = extract("<p>zx qv jk wq zz xq vv kk jj qq ww xx zz vv kk jj</p>")
    assert(e.nKept === 1)
  }

  test("r3: short stopword-dense sentence is rescued") {
    val e = extract("<div>a note to all of the readers</div>")
    assert(e.content === "a note to all of the readers")
    assert(e.nKept === 1)
  }

  test("r4: short stopword-poor block is killed") {
    val e = extract("<div>Accept cookies</div><div>qq ww ee rr</div>")
    assert(e.nKept === 0)
    assert(e.removedChars === "Accept cookies".length + "qq ww ee rr".length)
  }

  test("script/style/head subtrees never count as blocks") {
    val e = extract("<head><title>t</title></head><script>var long = " +
      "'aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa';</script>" +
      "<style>.c{color:#fff}</style><p>a tiny note</p>")
    assert(e.nBlocks === 1)
  }

  test("entities decode into the OUTPUT text") {
    val e = extract("<div>a note to all of the readers &amp; friends</div>")
    assert(e.content === "a note to all of the readers & friends")
  }

  test("a div with class-only chrome (no semantic tag) is still removed") {
    // the whole point vs ExtractHtml: sidebar chrome in a plain <div>
    val e = extract(
      """<div class="sidebar"><a href="/x">Popular</a> <a href="/y">Tags</a></div>
        |<p>the quick brown fox jumped over all of the lazy dogs today</p>""".stripMargin)
    assert(e.nKept === 1)
    assert(e.content.startsWith("the quick"))
  }

  test("null / empty html yields the empty extraction") {
    assert(MainContent.extract(null) === MainContent.Extraction("", 0, 0, 0L))
    assert(extract("") === MainContent.Extraction("", 0, 0, 0L))
  }

  test("comments are stripped before segmentation") {
    val e = extract("<p>a note to all of the <!-- hidden --> readers</p>")
    assert(e.content === "a note to all of the readers")
  }
}
