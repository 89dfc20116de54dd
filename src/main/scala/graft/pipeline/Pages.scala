package graft.pipeline

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** The input-table row shape (BASELINE.json `input_hint`): an Iceberg-style
  * table of Common-Crawl-like web pages.
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic page synthesis: `html` is boilerplate wrapping a seeded
  * noisy rendering of `text` (char substitutions, indels, ligatures ﬁ/ﬂ,
  * '~' specks, abbreviation insertions). No wall-clock, no external data —
  * byte-stable across runs and parallelism levels, so correctness and bench
  * runs see identical inputs.
  */
object PageGen {

  /** SplitMix64 — tiny, seedable, allocation-free PRNG. */
  final class Rng(seed0: Long) {
    private var state: Long = seed0
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    /** uniform double in [0,1). */
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(bound: Int): Int = ((nextLong() >>> 33) % bound).toInt
  }

  private val Subs: Map[Char, String] = Map(
    'l' -> "1", 'o' -> "0", 'e' -> "c", 'a' -> "o", 'i' -> "l",
    'u' -> "v", 's' -> "5", 'm' -> "rn", 'w' -> "vv", 't' -> "+")

  private val InsertAlphabet = "abcdefghijklmnopqrstuvwxyz"

  /** Noisy OCR-style rendering of a clean transcript. ~6% of chars are
    * substituted, ~2% deleted, ~2% get an insertion, ~1% get a '~' speck;
    * 'fi'/'fl' digrams become ligatures with p=0.25.
    */
  def noisyRender(text: String, seed: Long): String = {
    val rng = new Rng(seed ^ 0x5eed5eedL)
    val sb = new java.lang.StringBuilder(text.length + 16)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      // ligature injection on 'fi' / 'fl' digrams
      if (c == 'f' && i + 1 < text.length &&
          (text.charAt(i + 1) == 'i' || text.charAt(i + 1) == 'l') &&
          rng.nextDouble() < 0.25) {
        sb.append(if (text.charAt(i + 1) == 'i') 'ﬁ' else 'ﬂ')
        i += 2
      } else {
        val r = rng.nextDouble()
        if (r < 0.06 && Subs.contains(c)) sb.append(Subs(c))
        else if (r < 0.08 && c != ' ') { /* delete */ }
        else if (r < 0.10) { sb.append(c); sb.append(InsertAlphabet.charAt(rng.nextInt(26))) }
        else if (r < 0.11) { sb.append(c); sb.append('~') }
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Wrap a noisy stream in deterministic Common-Crawl-ish boilerplate. */
  def wrapHtml(noisy: String, url: String, seed: Long): Array[Byte] = {
    val rng = new Rng(seed ^ 0xb01123a7eL)
    val navVariant = rng.nextInt(3)
    val nav = navVariant match {
      case 0 => "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>"
      case 1 => "<nav><ul><li>Index</li><li>Archive</li></ul></nav>"
      case _ => "<header><h1>Site</h1></header>"
    }
    val html =
      s"""<!DOCTYPE html><html><head><title>doc</title>
         |<script>var trk = ${rng.nextInt(100000)}; function f(){return "<div>";}</script>
         |<style>.m{margin:${rng.nextInt(20)}px} .c{color:#abc}</style>
         |<meta charset="utf-8"/></head><body>
         |$nav
         |<div class="main" id="content"><p>${escapeHtml(noisy)}</p></div>
         |<aside>Related: <a href="$url?ref=1">link</a></aside>
         |<footer>&copy; 2026 example.org &middot; crawl ${rng.nextInt(9999)}</footer>
         |</body></html>""".stripMargin
    html.getBytes(StandardCharsets.UTF_8)
  }

  def urlFor(docId: Long): String = f"https://example.org/doc/$docId%08d"

  /** Deterministic UTC timestamp: 2026-01-01T00:00:00Z + docId seconds. */
  def tsFor(docId: Long): Timestamp = new Timestamp(1767225600000L + docId * 1000L)

  /** Build one page row from a document row. */
  def pageFor(docId: Long, text: String, lang: String): Page = {
    val noisy = noisyRender(text, docId)
    Page(urlFor(docId), tsFor(docId), wrapHtml(noisy, urlFor(docId), docId), text, lang)
  }
}

/** Deterministic LINK-page synthesis for the link-graph family
  * (q_link_edges / q_link_degrees / q_anchor_text / q_host_graph /
  * q_pagerank): each document becomes a page on one of 13 hosts whose
  * outlinks exercise every resolver form — absolute, path-absolute,
  * relative with `..`, entity-encoded query + fragment, protocol-relative,
  * and a mailto: that must be DROPPED — plus an href-less `<a name>`, an
  * unquoted href (skipped by spec), and an `<abbr>` tag (must not match
  * `<a`). Anchors are token slices of the document text, HTML-escaped on
  * the way in (binds entity decode on the way out), some with a nested
  * `<b>` (binds tag-stripping). Mirrored clean-room token-for-token in
  * tools/oracle/graftpy.py (link_page_html) — shared CONVENTION, separate
  * implementations.
  */
object LinkGen {
  import graft.ops.TextOps.mix

  private def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)

  def linkUrlFor(id: Long): String =
    s"https://site${fm(id, 13)}.example.org/sec${fm(id, 5)}/d/doc$id.html"

  /** Out-link slots per page: 3..8 (slot k ≡ 4 (mod 6) is a dropped
    * mailto:, so RESOLVED out-degree can be lower).
    */
  def degOf(id: Long): Int = (3 + fm(mix(id ^ 0x11a7c0deL), 6)).toInt

  def targetOf(id: Long, k: Int, n: Long): Long = fm(mix(id * 1000003L + k), n)

  def hrefFor(id: Long, k: Int, t: Long): String = (k % 6) match {
    case 0 => linkUrlFor(t)
    case 1 => s"/sec${fm(t, 5)}/d/doc$t.html"
    case 2 => s"../d/doc$t.html"
    case 3 => linkUrlFor(t) + s"?a=1&b=${fm(t, 7)}#frag"
    case 4 => s"mailto:user$t@example.org"
    case _ => s"//site${fm(t, 13)}.example.org/sec${fm(t, 5)}/d/doc$t.html"
  }

  /** 1-to-3-token slice of the page's document text (null-safe: a null/
    * empty text anchors as "link&lt;t&gt;").
    */
  def anchorWordsFor(words: IndexedSeq[String], id: Long, k: Int, t: Long): IndexedSeq[String] =
    if (words.isEmpty) IndexedSeq(s"link$t")
    else {
      val j = fm(mix(id * 31L + k), words.length).toInt
      words.slice(j, math.min(j + 3, words.length))
    }

  def pageHtml(id: Long, text: String, n: Long): String = {
    val words: IndexedSeq[String] =
      if (text == null) IndexedSeq.empty
      else text.split(" ").iterator.filter(_.nonEmpty).toIndexedSeq
    val sb = new StringBuilder(1024)
    sb ++= s"<html><head><title>doc$id</title></head><body>\n"
    sb ++= s"<h1>doc$id</h1>\n"
    sb ++= "<abbr>CC</abbr> <a name=\"top\">anchorless</a> <a href=unquoted>skipped</a>\n"
    var k = 0
    val deg = degOf(id)
    while (k < deg) {
      val t = targetOf(id, k, n)
      val href = PageGen.escapeHtml(hrefFor(id, k, t))
      val a = anchorWordsFor(words, id, k, t).map(PageGen.escapeHtml)
      val anchorHtml =
        if (k % 6 == 1 && a.length >= 2)
          a.head + " <b>" + a.tail.mkString(" ") + "</b>"
        else a.mkString(" ")
      sb ++= s"""<p>see <a href="$href">$anchorHtml</a> ok</p>\n"""
      k += 1
    }
    sb ++= "</body></html>"
    sb.toString
  }
}

/** Deterministic per-host robots.txt synthesis for the robots/frontier
  * queries (q_robots / q_frontier). The 13 LinkGen hosts publish bodies
  * that exercise every pinned parser/matcher path: mixed-case directive
  * names, comments (including after a value), \r\n line endings (host 3),
  * multi-token groups, a shorter prefix group that must LOSE to the more
  * specific token (hosts h%4==2), a merged second group for the same token
  * (host 5), wildcard and $-anchored patterns, an empty-value Allow that
  * must be dropped, an ignored mid-group crawl-delay, a host with no
  * matching group at all (host 7 → the `*` group), and a host publishing
  * no robots.txt at all (host 11 → allowed-by-default). Mirrored
  * token-for-token clean-room in tools/oracle/graftpy.py
  * (rb_robots_txt_for) — shared CONVENTION, separate implementations.
  */
object RobotsGen {
  val Agent = "graftbot"

  def hostFor(h: Int): String = "site" + h + ".example.org"

  /** robots.txt body for host index h, or None (host 11 publishes none). */
  def robotsTxtFor(h: Int): Option[String] = {
    if (h == 11) return None
    val eol = if (h == 3) "\r\n" else "\n"
    val b = scala.collection.mutable.ArrayBuffer.empty[String]
    b += "# synthetic robots for " + hostFor(h)
    b += "User-Agent: MegaBot"
    b += "Disallow: /"
    b += ""
    if (h != 7) {
      if (h % 4 == 2) {
        b += "User-agent: graft"
        b += "Disallow: /sec" + ((h + 1) % 5) + "/"
        b += ""
      }
      b += "user-agent: graftbot"
      if (h % 4 == 0) b += "User-agent: graftbot-news"
      b += "Allow: /sec" + (h % 5) + "/d/" +
        (if (h == 3) " # the content dir" else "")
      b += "DisAllow: /sec" + (h % 5) + "/"
      if (h % 3 == 0) b += "Disallow: /sec*/d/*?a=1"
      if (h % 2 == 1) b += "Disallow: /*7.html$"
      b += "Allow:"
      // crawl-delay variation: plain integer, decimal, and an unparseable
      // value (ignored by the pinned [0-9]+(\.[0-9]+)? rule)
      b += "Crawl-delay: " +
        (if (h == 9) "soon" else if (h % 4 == 1) "2.5" else "2")
      b += ""
    }
    b += "User-agent: *"
    b += "Disallow: /x-default/"
    // h == 7 has no graftbot group, so the * group is the selected one —
    // binds crawl-delay selection THROUGH the fallback group
    if (h == 7) b += "Crawl-delay: 4"
    b += "Sitemap: https://" + hostFor(h) + "/sitemap.xml"
    // second sitemap (h % 5 == 0) and an exact duplicate (h == 10) bind
    // the document-order first-occurrence dedup
    if (h % 5 == 0) b += "Sitemap: https://" + hostFor(h) + "/sitemap2.xml"
    if (h == 10) b += "Sitemap: https://" + hostFor(h) + "/sitemap.xml"
    // embedded whitespace in the value → REJECTED (urls are whitespace-
    // free; pins the n_sitemaps/space-joined contract)
    if (h == 3) b += "Sitemap: https://" + hostFor(h) + "/sm.xml extra junk"
    if (h == 5) {
      b += ""
      b += "User-agent: graftbot"
      b += "Disallow: /sec*/d/doc*?a=1&b=5$"
      // a SECOND delay in a later same-token group: the selected delay is
      // the FIRST in concatenation order (2.5 from the main group wins)
      b += "Crawl-delay: 99"
    }
    Some(b.mkString(eol))
  }

  /** Extra annotate-input urls pinning the host-extraction contract
    * (ADVICE r5): a query-embedded absolute url must key to the OUTER
    * host (first-occurrence "://" split), and a scheme-less url keys to
    * host '' (no robots row → allowed, null rule). Shared literal list
    * with the golden generator.
    */
  val ExtraUrls: Seq[String] = Seq(
    "https://site1.example.org/redirect?u=https://site0.example.org/sec0/d/x",
    "https://site0.example.org/sec0/redir?to=https://site3.example.org/x-default/p",
    "site2.example.org/sec2/d/doc4.html")

  /** All (host, robots_txt) rows (hosts that publish one). */
  def rows: Seq[(String, String)] =
    (0 until 13).flatMap(h => robotsTxtFor(h).map(t => (hostFor(h), t)))
}

/** Deterministic sitemap-XML synthesis for q_sitemap / q_sitemap_seed
  * (mirrored literally in graftpy.py sm_xml_for — shared convention,
  * separate parsers). Hosts h%4==0 publish a `<sitemapindex>`; the rest a
  * `<urlset>` whose locs land on BOTH sides of the RobotsGen rules (the
  * allowed /secN/d/ dir, the disallowed /secN/ dir, the `*7.html$` glob,
  * /x-default/, and h 5's $-anchored query rule via an `&amp;` loc).
  * Entries exercise: whitespace-padded locs, named + decimal + hex
  * character references (incl. a supplementary code point), lastmod /
  * changefreq presence cycling, an unparseable priority ("high"), a
  * loc-less block, an empty loc (h 8), and an unterminated final block
  * (h 6) — the last three are SKIPPED by the damage guard.
  */
object SitemapGen {
  import RobotsGen.hostFor

  def xmlFor(h: Int): String = {
    val b = scala.collection.mutable.ArrayBuffer.empty[String]
    b += "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
    if (h % 4 == 0) {
      b += "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
      b += "<sitemap>"
      b += "<loc>https://" + hostFor(h) + "/sitemap-0.xml</loc>"
      b += "<lastmod>2026-0" + ((h % 9) + 1) + "-15</lastmod>"
      b += "</sitemap>"
      b += "<sitemap>"
      b += "<loc>  https://" + hostFor(h) + "/sitemap-1.xml\t</loc>"
      b += "</sitemap>"
      b += "<sitemap><lastmod>2026-01-01</lastmod></sitemap>" // no loc: skipped
      b += "</sitemapindex>"
    } else {
      b += "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
      val n = 4 + (h % 3)
      (0 until n).foreach { k =>
        b += "<url>"
        val path = (k % 6) match {
          case 0 => "/sec" + (h % 5) + "/d/doc" + (h * 100 + k) + ".html"
          case 1 => "/sec" + (h % 5) + "/p" + k + ".html"
          case 2 => "/x-default/page" + k
          case 3 => "/a" + k + "7.html"
          case 4 => "/sec" + (h % 5) + "/d/doc" + k + "?a=1&amp;b=5"
          case _ => "/e" + k + "&#47;x&#x41;/emoji&#x1F600;"
        }
        val loc = "https://" + hostFor(h) + path
        b += (if (k == 2) "<loc>\n  " + loc + " \n</loc>" // padded: trimmed
              else "<loc>" + loc + "</loc>")
        if (k % 2 == 0)
          b += "<lastmod>2026-0" + ((k % 9) + 1) + "-0" + ((h % 9) + 1) +
            "</lastmod>"
        if (k % 3 != 1)
          b += "<changefreq>" + Seq("daily", "weekly", "monthly")(k % 3) +
            "</changefreq>"
        (k % 4) match {
          case 0 => b += "<priority>0." + (k % 10) + "</priority>"
          case 1 => b += "<priority>high</priority>" // unparseable: null
          case 2 => b += "<priority>1</priority>"
          case _ => () // absent
        }
        b += "</url>"
      }
      if (h == 8) b += "<url><loc></loc></url>" // empty loc: skipped
      if (h == 6) b += "<url><loc>https://" + hostFor(h) + "/never</loc>"
      // h 6's block above is UNTERMINATED on purpose — </urlset> below is
      // inside it, so the parser's damage guard must drop it
      b += "</urlset>"
    }
    b.mkString("\n")
  }

  /** All (host, sitemap_xml) rows. */
  def rows: Seq[(String, String)] =
    (0 until 13).map(h => (hostFor(h), xmlFor(h)))
}

/** Deterministic head-metadata page synthesis for q_html_meta: per doc id
  * the head block exercises mixed-case tag names, both quote styles plus
  * unquoted attribute values, swapped attribute order, entity-encoded
  * values, ASCII-ci attr-value matching ('Description'), missing fields
  * (title id%7==3, description id%3==1, og:title unless id%4==0, canonical
  * id%5==2, lang when the cycle hits ""), absolute vs relative canonical
  * hrefs, and a BODY <title> decoy after </head> that must never leak into
  * the result. Mirrored token-for-token clean-room in graftpy.py
  * (hm_page_html) — shared CONVENTION, separate implementations.
  */
object MetaGen {
  private def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)

  /** escapeHtml + quote escape (values go inside quoted attributes). */
  private def escAttr(s: String): String =
    PageGen.escapeHtml(s).replace("\"", "&quot;").replace("'", "&#39;")

  private val Langs = Array("en", "de", "fr", "la", "")

  def pageHtml(id: Long, text: String): String = {
    val words: IndexedSeq[String] =
      if (text == null) IndexedSeq.empty
      else text.split(" ").iterator.filter(_.nonEmpty).toIndexedSeq
    def first(k: Int): String = words.take(k).mkString(" ")
    val sb = new StringBuilder(1024)
    val lang = Langs(fm(id, 5).toInt)
    sb ++= (if (lang.isEmpty) "<html>\n"
            else if (fm(id, 2) == 1) "<HTML LANG='" + lang + "'>\n"
            else "<html lang=\"" + lang + "\">\n")
    sb ++= "<head>\n"
    sb ++= (if (fm(id, 2) == 0) "<meta charset=\"utf-8\">\n"
            else "<META CHARSET=utf-8>\n")
    if (fm(id, 7) != 3)
      sb ++= "<TiTLe>Doc &quot;" + id + "&quot; — " +
        PageGen.escapeHtml(first(3)) + "</tItLe>\n"
    if (fm(id, 3) != 1) {
      val d = escAttr(first(8))
      sb ++= (if (fm(id, 2) == 0)
        "<meta name=\"description\" content=\"" + d + " &amp; more\">\n"
      else "<meta content='" + d + " &amp; more' name='Description'>\n")
    }
    if (fm(id, 4) == 0)
      sb ++= "<meta property=\"og:title\" content=\"OG " +
        escAttr(first(2)) + "\">\n"
    if (fm(id, 5) != 2)
      sb ++= (if (fm(id, 2) == 0)
        "<link rel=\"canonical\" href=\"" + PageGen.urlFor(id) + "\">\n"
      else "<link href=/c/doc" + id + ".html rel=canonical>\n")
    sb ++= "</head>\n<body>\n<p>" + PageGen.escapeHtml(first(5)) + "</p>\n"
    sb ++= "<title>decoy title</title>\n</body></html>"
    sb.toString
  }
}

/** Deterministic mixed-encoding payload synthesis for q_charset: four
  * modes by doc id — utf-8 (BOM'd every 8th, else a quoted meta charset),
  * utf-16le/be (BOM only — the prescan never sees 16-bit content),
  * windows-1252 declared as iso-8859-1 through an http-equiv content-type
  * (binds the WHATWG label mapping), and windows-1252 via an unquoted
  * uppercase `<META CHARSET=...>`. Word content is projected to printable
  * ASCII so every mode's bytes are valid in its encoding by construction
  * (the cross-engine decode contract); pinned non-ASCII suffixes bind the
  * actual decode ("café №✓" wide, "café ±½" cp1252-safe). Mirrored
  * token-for-token in graftpy.py (cs_payload).
  */
object CharsetGen {
  private def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)

  private def asciiSlice(text: String): String = {
    val words: IndexedSeq[String] =
      if (text == null) IndexedSeq.empty
      else text.split(" ").iterator.filter(_.nonEmpty).toIndexedSeq
    words.take(6).mkString(" ").filter(c => c >= ' ' && c <= '~')
  }

  private def doc(meta: String, body: String): String =
    "<html><head>" + meta + "</head><body><p>" + body + "</p></body></html>"

  def payload(id: Long, text: String): Array[Byte] = {
    import java.nio.charset.StandardCharsets._
    val slice = asciiSlice(text)
    val wide = slice + " café №✓"
    val narrow = slice + " café ±½"
    fm(id, 4) match {
      case 0 =>
        val b = doc("<meta charset=\"utf-8\">", wide).getBytes(UTF_8)
        if (fm(id, 8) == 0)
          Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ b
        else b
      case 1 =>
        val s = doc("", wide)
        if (fm(id, 8) == 1)
          Array(0xFE.toByte, 0xFF.toByte) ++ s.getBytes(UTF_16BE)
        else Array(0xFF.toByte, 0xFE.toByte) ++ s.getBytes(UTF_16LE)
      case 2 =>
        doc("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
          "charset=iso-8859-1\">", narrow)
          .getBytes(java.nio.charset.Charset.forName("windows-1252"))
      case _ =>
        doc("<META CHARSET=WINDOWS-1252>", narrow)
          .getBytes(java.nio.charset.Charset.forName("windows-1252"))
    }
  }
}

/** Deterministic HTTP-wrapped WARC payload synthesis for q_warc_http
  * (mirrored token-for-token in graftpy.py http_*): response payloads are
  * real HTTP messages over the CharsetGen bodies. Per doc id —
  * status 404 (id%7==3, pinned ascii error body), 301 (id%11==5, Location
  * header, EMPTY body → default-decode, n_chars 0), else 200 over
  * CharsetGen.payload; Content-Type exercises every precedence arm:
  * absent (meta binds), agreeing, CONFLICTING with the meta declaration
  * (transport wins without a BOM — the id%4==0, id%3==2 rows decode
  * mojibake on purpose, identically in both engines), and utf-8 labels
  * under a BOM (BOM wins). id%13==6 ships the bare CharsetGen payload
  * with NO http wrapper (the raw-payload fallback: null status/mime).
  * id%5==0 pages also get a REQUEST record and id%9==2 a REVISIT record —
  * recordsHttp must emit response rows only.
  */
object HttpGen {
  private def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)
  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** The response record's payload for doc id (http message or raw). */
  def responsePayload(id: Long, text: String): Array[Byte] = {
    if (fm(id, 13) == 6) return CharsetGen.payload(id, text) // raw fallback
    val (statusLine, ctype, body) =
      if (fm(id, 7) == 3)
        ("HTTP/1.1 404 Not Found", "Content-Type: text/html\r\n",
          "<html><body>not found</body></html>".getBytes(Ascii))
      else if (fm(id, 11) == 5)
        ("HTTP/1.1 301 Moved Permanently",
          "Content-Type: text/html\r\nLocation: " +
            PageGen.urlFor(id + 1) + "\r\n",
          Array.emptyByteArray)
      else {
        val ct = fm(id, 4) match {
          case 2 => "Content-Type: text/html\r\n" // no charset: meta binds
          case 3 => "Content-Type: text/html; charset=windows-1252\r\n"
          case 0 => fm(id, 3) match {
            case 0 => "Content-Type: text/html; charset=utf-8\r\n"
            case 1 => "" // no Content-Type header at all
            case _ => "Content-Type: text/html; charset=iso-8859-1\r\n"
            // ^ conflicts with the utf-8 meta: transport wins (no BOM)
          }
          case _ => "Content-Type: text/html; charset=utf-8\r\n" // BOM wins
        }
        ("HTTP/1.1 200 OK", ct, CharsetGen.payload(id, text))
      }
    val head = statusLine + "\r\nServer: graft-fixture\r\n" + ctype +
      "Content-Length: " + body.length + "\r\n\r\n"
    head.getBytes(Ascii) ++ body
  }

  def requestPayload(id: Long): Array[Byte] =
    ("GET /doc/" + id + " HTTP/1.1\r\nHost: example.org\r\n" +
      "User-Agent: graftbot\r\n\r\n").getBytes(Ascii)

  def revisitPayload(id: Long): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n").getBytes(Ascii)
}

/** Deterministic PDF payload synthesis for q_pdf_text: two content
  * streams per document — a raw one exercising literal-string escapes
  * (escaped parens, octal, backslash-newline continuation), TJ kerning
  * arrays (every 3rd doc), hex strings and Td/T* line moves, and a second
  * stream FlateDecode-compressed on odd ids (JDK Deflater(6) and CPython
  * zlib both wrap zlib — and even if bytes differed, each engine inflates
  * its OWN fixture, so /Length stays self-consistent). Word content is
  * printable-ASCII-projected, PDF-escaped on the way in. Mirrored
  * token-for-token in graftpy.py (pdf_bytes).
  */
object PdfGen {
  private def fm(x: Long, m: Long): Long = java.lang.Math.floorMod(x, m)

  private def asciiSlice(text: String, k: Int): String = {
    val words: IndexedSeq[String] =
      if (text == null) IndexedSeq.empty
      else text.split(" ").iterator.filter(_.nonEmpty).toIndexedSeq
    words.take(k).mkString(" ").filter(c => c >= ' ' && c <= '~')
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  def content1(id: Long, text: String): String =
    "BT\n/F1 12 Tf\n72 720 Td\n" +
      "(" + esc(asciiSlice(text, 5)) + " \\(p\\) \\101 ok) Tj\n" +
      "0 -14 Td\n" +
      (if (fm(id, 3) == 0) "[(ker) -200 (ned) 10 (!)] TJ\n"
       else "(plain line) Tj\n") +
      "T*\n" +
      "<48656C6C 6F21> Tj\n" +
      "(con\\\ntinued) Tj\n" +
      "ET\n"

  def content2(id: Long, text: String): String =
    "BT 1 0 0 1 72 700 Tm (second " + esc(asciiSlice(text, 3)) +
      ") Tj 0 -14 TD (tail) ' ET\n"

  /** Third content stream: shows text through the F2 /ToUnicode font
    * (1-byte codes via bfchar + bfrange, an unmapped identity code) and
    * BOM'd UTF-16BE hex strings (BMP + astral), then resets to F1.
    */
  def content3(id: Long, text: String): String =
    "BT\n/F2 10 Tf\n" +
      "<0102> Tj\n" + // bfchar: 01 -> 'A', 02 -> U+1D504 (astral)
      "(\\020\\021\\022) Tj\n" + // bfrange 10..12 -> a,b,c (octal literals)
      "<FF> Tj\n" + // unmapped code: identity 0xFF
      (if (fm(id, 2) == 0) "<2021> Tj\n" else "") + // array-dst bfrange
      "0 -14 Td\n" +
      "<FEFF004800490021> Tj\n" + // BOM'd UTF-16BE bypasses the CMap
      (if (fm(id, 5) == 0) "<FEFFD835DD04> Tj\n" else "") + // astral BOM
      "/F1 9 Tf\n(back to latin1) Tj\nET\n"

  /** The F2 /ToUnicode CMap stream body (1-byte codes). */
  def cmapStream(id: Long): String =
    "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
      "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
      "2 beginbfchar\n<01> <0041>\n<02> <D835DD04>\nendbfchar\n" +
      "1 beginbfrange\n<10> <12> <0061>\nendbfrange\n" +
      (if (fm(id, 2) == 0)
        "1 beginbfrange\n<20> <22> [<0058> <0059005A> <005A>]\nendbfrange\n"
      else "") +
      "endcmap\nend\nend\n"

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(b)
      d.finish()
      val bos = new java.io.ByteArrayOutputStream(b.length)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val k = d.deflate(buf)
        bos.write(buf, 0, k)
      }
      bos.toByteArray
    } finally d.end()
  }

  /** Filter selection: (encoded bytes, dict /Filter suffix). `sel`: 0 =
    * raw, 1 = FlateDecode, 2 = LZWDecode.
    */
  private def encode(raw: Array[Byte], sel: Long): (Array[Byte], String) =
    sel match {
      case 1 => (deflate(raw), " /Filter /FlateDecode")
      case 2 => (graft.ops.Pdf.lzwEncode(raw), " /Filter /LZWDecode")
      case _ => (raw, "")
    }

  def pdfBytes(id: Long, text: String): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val bos = new java.io.ByteArrayOutputStream(2048)
    def w(s: String): Unit = bos.write(s.getBytes(latin1))
    def streamObj(num: Int, raw: Array[Byte], sel: Long): Unit = {
      val (data, filter) = encode(raw, sel)
      w(num + " 0 obj\n<< /Length " + data.length + filter + " >>\nstream\n")
      bos.write(data)
      w("\nendstream\nendobj\n")
    }
    val c1 = content1(id, text).getBytes(latin1)
    val c2 = content2(id, text).getBytes(latin1)
    val c3 = content3(id, text).getBytes(latin1)
    val cm = cmapStream(id).getBytes(latin1)
    w("%PDF-1.4\n")
    streamObj(1, c1, 0)
    // c2 filter: ids %4==1 Flate (the r5 shape), %4==3 LZW, even raw
    streamObj(2, c2, if (fm(id, 4) == 1) 1 else if (fm(id, 4) == 3) 2 else 0)
    w("3 0 obj\n<< /Type /Page /Resources << /Font << /F1 4 0 R " +
      "/F2 6 0 R >> >> >>\nendobj\n")
    w("4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n" +
      "endobj\n")
    // the F2-using content stream appears BEFORE its CMap object — binds
    // the extractor's order-independence
    streamObj(5, c3, 0)
    w("6 0 obj\n<< /Type /Font /Subtype /TrueType /BaseFont " +
      "/AAAAAA+Custom /ToUnicode 7 0 R >>\nendobj\n")
    // CMap stream filter rotates raw/Flate/LZW
    streamObj(7, cm, fm(id, 3))
    w("trailer\n<< /Root 3 0 R >>\n%%EOF\n")
    bos.toByteArray
  }
}
