package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SitemapsSpec extends AnyFunSuite {

  test("decodeEntities: named, decimal, hex, malformed-stays-literal") {
    import Sitemaps.{decodeEntities => d}
    assert(d("a&amp;b") === "a&b")
    assert(d("&lt;x&gt; &quot;q&quot; &apos;a&apos;") === "<x> \"q\" 'a'")
    assert(d("&#47;") === "/")
    assert(d("&#x41;&#X42;") === "AB") // case-insensitive radix marker
    assert(d("&#x1F600;").codePointAt(0) === 0x1F600) // supplementary
    // malformed / out-of-range / unknown stay literal
    assert(d("&bogus;") === "&bogus;")
    assert(d("&#;") === "&#;")
    assert(d("&#xD800;") === "&#xD800;") // surrogate range rejected
    assert(d("&#x110000;") === "&#x110000;")
    assert(d("& plain ampersand") === "& plain ampersand")
    assert(d("&verylongentityname;") === "&verylongentityname;")
    assert(d("no refs at all") === "no refs at all")
  }

  test("parseSitemap: urlset entries, optionals, priority gate") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://a/1</loc><lastmod>2026-01-02</lastmod>
        |<changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc>
        |   https://a/2?x=1&amp;y=2 </loc><priority>high</priority></url>
        |<url><loc>https://a/3</loc><priority>1</priority></url>
        |</urlset>""".stripMargin
    val (kind, es) = Sitemaps.parseSitemap(xml)
    assert(kind === "urlset")
    assert(es.map(_.loc) ===
      IndexedSeq("https://a/1", "https://a/2?x=1&y=2", "https://a/3"))
    assert(es(0).lastmod === "2026-01-02")
    assert(es(0).changefreq === "daily")
    assert(es(0).priority === 0.8)
    assert(es(1).priority === null) // "high" fails the numeric gate
    assert(es(1).lastmod === null)
    assert(es(2).priority === 1.0)
    assert(es.map(_.seq) === IndexedSeq(0, 1, 2))
  }

  test("parseSitemap: sitemapindex kind; root choice is first-wins") {
    val xml = "<sitemapindex><sitemap><loc>https://a/sm1.xml</loc>" +
      "<lastmod>2026-03-01</lastmod></sitemap>" +
      "<sitemap><loc>https://a/sm2.xml</loc></sitemap></sitemapindex>"
    val (kind, es) = Sitemaps.parseSitemap(xml)
    assert(kind === "sitemapindex")
    assert(es.map(_.loc) ===
      IndexedSeq("https://a/sm1.xml", "https://a/sm2.xml"))
    assert(es(0).lastmod === "2026-03-01")
    assert(es.forall(e => e.changefreq == null && e.priority == null))
    // a urlset buried after a sitemapindex root: index wins (first tag)
    val both = "<sitemapindex></sitemapindex><urlset><url>" +
      "<loc>https://x/</loc></url></urlset>"
    assert(Sitemaps.parseSitemap(both)._1 === "sitemapindex")
  }

  test("parseSitemap: damage — loc-less, empty-loc, unterminated, junk") {
    // loc-less and empty-loc blocks are skipped, seq stays dense
    val skip = "<urlset><url><lastmod>2026-01-01</lastmod></url>" +
      "<url><loc></loc></url><url><loc>https://a/kept</loc></url></urlset>"
    val (_, es) = Sitemaps.parseSitemap(skip)
    assert(es.map(e => (e.seq, e.loc)) === IndexedSeq((0, "https://a/kept")))
    // unterminated final block drops
    val unterminated = "<urlset><url><loc>https://a/1</loc></url>" +
      "<url><loc>https://a/never</loc>"
    assert(Sitemaps.parseSitemap(unterminated)._2.map(_.loc) ===
      IndexedSeq("https://a/1"))
    // unterminated loc inside a closed block: block skipped
    val badLoc = "<urlset><url><loc>https://a/x</url>" +
      "<url><loc>https://a/2</loc></url></urlset>"
    assert(Sitemaps.parseSitemap(badLoc)._2.map(_.loc) ===
      IndexedSeq("https://a/2"))
    // not a sitemap at all / null
    assert(Sitemaps.parseSitemap("<html><body>hi</body></html>") ===
      (("", IndexedSeq.empty)))
    assert(Sitemaps.parseSitemap(null) === (("", IndexedSeq.empty)))
  }

  test("SitemapGen fixture: kinds split 4/9, damage blocks are dropped") {
    val parsed = (0 until 13).map(h =>
      h -> Sitemaps.parseSitemap(graft.pipeline.SitemapGen.xmlFor(h)))
    parsed.foreach { case (h, (kind, es)) =>
      if (h % 4 == 0) {
        assert(kind === "sitemapindex")
        assert(es.length === 2) // the loc-less third block is skipped
      } else {
        assert(kind === "urlset")
        assert(es.length === 4 + (h % 3)) // h6's unterminated tail drops,
        // h8's empty loc drops
        assert(es.forall(e => !e.loc.contains("never")))
      }
    }
    // the entity loc decodes: &amp; in the k%6==4 path
    assert(parsed(5)._2._2.exists(_.loc.endsWith("?a=1&b=5")))
    // supplementary code point survives in the k%6==5 path (h%3==2 hosts
    // have 6 entries: h in {2,5,8,11} -> n=4+(h%3)=6)
    assert(parsed(2)._2._2.exists(_.loc.contains(
      new String(Character.toChars(0x1F600)))))
  }
}
