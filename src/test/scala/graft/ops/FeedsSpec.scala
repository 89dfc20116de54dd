package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class FeedsSpec extends AnyFunSuite {

  test("rss: entries in order, trimmed text links, entity decode, nullables") {
    val (kind, es) = Feeds.parseFeed(
      "<rss version=\"2.0\"><channel>" +
        "<item><title>A &amp; B</title><link> https://x/1 </link>" +
        "<guid>g1</guid><pubDate>d1</pubDate></item>" +
        "<item><link>https://x/2</link></item>" +
        "</channel></rss>")
    assert(kind === "rss")
    assert(es.map(_.link) === IndexedSeq("https://x/1", "https://x/2"))
    assert(es(0).title === "A & B" && es(0).entryId === "g1" &&
      es(0).published === "d1")
    assert(es(1).title === null && es(1).entryId === null)
  }

  test("rss: link-less items are skipped; unterminated block stops") {
    val (_, es) = Feeds.parseFeed(
      "<rss><item><title>t</title></item>" +
        "<item><link>https://x/a</link></item>" +
        "<item><title>unterminated")
    assert(es.map(_.link) === IndexedSeq("https://x/a"))
    assert(es.head.seq === 0) // skipped items consume no seq
  }

  test("atom: <linkfoo is not a link tag; the real <link after it wins") {
    // ADVICE r6 low #2: a longer tag name starting with "link" must not be
    // harvested as the entry link — a delimiter must follow "<link"
    val (_, es) = Feeds.parseFeed(
      "<feed><entry><linkfoo href=\"https://evil/x\"/>" +
        "<link href=\"https://x/real\"/></entry>" +
        "<entry><linkfoo href=\"https://evil/y\"/></entry></feed>")
    assert(es.map(_.link) === IndexedSeq("https://x/real"))
  }

  test("atom: href attribute links (both quote styles), id/updated") {
    val (kind, es) = Feeds.parseFeed(
      "<feed><entry><title>T</title>" +
        "<link rel=\"alternate\" href=\"https://x/a?m=1&amp;n=2\"/>" +
        "<id>i1</id><updated>u1</updated></entry>" +
        "<entry><link href='https://x/b'/></entry></feed>")
    assert(kind === "atom")
    assert(es.map(_.link) === IndexedSeq("https://x/a?m=1&n=2", "https://x/b"))
    assert(es(0).entryId === "i1" && es(0).published === "u1")
  }

  test("kind detection: first root wins; unknown root is empty") {
    assert(Feeds.parseFeed("<html>nope</html>") === (("", IndexedSeq.empty)))
    assert(Feeds.parseFeed(null)._1 === "")
    // a <feed before <rss resolves atom
    assert(Feeds.parseFeed("<feed><entry><link href=\"/x\"/></entry>" +
      "</feed><rss/>")._1 === "atom")
  }
}
