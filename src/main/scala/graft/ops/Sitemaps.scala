package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org protocol) — the consumer of the sitemap
  * urls [[Robots]] now surfaces from robots.txt: a crawl that honors
  * `Sitemap:` lines must fetch and parse the referenced XML to seed its
  * frontier. Map-only per document; the parser is total (damage yields
  * the valid entry subset, never an exception) and mirrored clean-room in
  * tools/oracle/graftpy.py sm_*.
  *
  * PINNED subset (the protocol's required elements plus the common
  * optionals; real-world sitemaps are machine-generated lowercase XML):
  *   - the document kind is the FIRST of `<urlset` / `<sitemapindex` to
  *     appear (exact lowercase, attributes/namespaces ignored); anything
  *     else parses as zero entries with kind "";
  *   - entries are `<url>…</url>` (urlset) or `<sitemap>…</sitemap>`
  *     (index) blocks scanned in document order; a block without a
  *     well-formed non-empty `<loc>` is SKIPPED (damage guard);
  *   - per entry: `<loc>` (required), `<lastmod>`, `<changefreq>`, and
  *     `<priority>` (urlset only) — first occurrence inside the block,
  *     text trimmed (ASCII c <= 0x20, both ends);
  *   - text decodes the five XML named entities (amp/lt/gt/quot/apos)
  *     plus decimal `&#NN;` and hex `&#xHH;` character references
  *     (appendCodePoint — supplementary planes survive); a malformed or
  *     out-of-range reference stays literal;
  *   - `<priority>` parses through the same `[0-9]+(\.[0-9]+)?` gate as
  *     robots crawl-delay — anything else (e.g. "high") is null;
  *   - nothing resolves relatively: the protocol requires absolute locs.
  */
object Sitemaps {

  private val NumberValue = "[0-9]+(\\.[0-9]+)?".r

  /** Decode XML character/entity references per the pinned subset. */
  private[ops] def decodeEntities(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return if (s == null) "" else s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        // entity names are short; a far-away ';' means a bare '&'
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          body match {
            case "amp" => sb.append('&'); i = semi + 1
            case "lt" => sb.append('<'); i = semi + 1
            case "gt" => sb.append('>'); i = semi + 1
            case "quot" => sb.append('"'); i = semi + 1
            case "apos" => sb.append('\''); i = semi + 1
            case b if b.length > 1 && b.charAt(0) == '#' =>
              val (digits, radix) =
                if (b.length > 2 && (b.charAt(1) == 'x' || b.charAt(1) == 'X'))
                  (b.substring(2), 16)
                else (b.substring(1), 10)
              val cp =
                try {
                  if (digits.isEmpty) -1 else Integer.parseInt(digits, radix)
                } catch { case _: NumberFormatException => -1 }
              if (cp >= 0 && cp <= 0x10FFFF &&
                  !(cp >= 0xD800 && cp <= 0xDFFF)) {
                sb.appendCodePoint(cp); i = semi + 1
              } else { sb.append(c); i += 1 } // malformed: stays literal
            case _ => sb.append(c); i += 1 // unknown entity: stays literal
          }
        }
      }
    }
    sb.toString
  }

  @inline private[ops] def asciiTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) <= ' ') a += 1
    while (b > a && s.charAt(b - 1) <= ' ') b -= 1
    s.substring(a, b)
  }

  /** First `<tag>text</tag>` inside `block`, trimmed + entity-decoded;
    * null when absent or unterminated.
    */
  private[ops] def tagText(block: String, tag: String): String = {
    val open = "<" + tag + ">"
    val at = block.indexOf(open)
    if (at < 0) return null
    val start = at + open.length
    val end = block.indexOf("</" + tag + ">", start)
    if (end < 0) return null
    decodeEntities(asciiTrim(block.substring(start, end)))
  }

  /** The shared damage-semantics block scanner both XML-ingest kernels
    * ([[parseSitemap]], [[Feeds.parseFeed]]) run: `<tag>…</tag>` blocks
    * in document order, an UNTERMINATED block stops the scan, `mk`
    * returning None SKIPS the block (consuming no seq). One copy per
    * language — the mirror's `_sm_scan_blocks` is the other.
    */
  private[ops] def scanBlocks[T](xml: String, blockTag: String)(
      mk: (Int, String) => Option[T]): IndexedSeq[T] = {
    val open = "<" + blockTag + ">"
    val close = "</" + blockTag + ">"
    val out = IndexedSeq.newBuilder[T]
    var pos = xml.indexOf(open)
    var seq = 0
    while (pos >= 0) {
      val bodyStart = pos + open.length
      val end = xml.indexOf(close, bodyStart)
      if (end < 0) pos = -1 // unterminated block: damage, stop
      else {
        mk(seq, xml.substring(bodyStart, end)).foreach { t =>
          out += t
          seq += 1
        }
        pos = xml.indexOf(open, end + close.length)
      }
    }
    out.result()
  }

  final case class SitemapEntry(
      seq: Int,
      loc: String,
      lastmod: String, // nullable
      changefreq: String, // nullable
      priority: java.lang.Double) // nullable

  /** Parse one sitemap document → (kind, entries). kind is "urlset",
    * "sitemapindex", or "" (unrecognized root → zero entries).
    */
  def parseSitemap(xml: String): (String, IndexedSeq[SitemapEntry]) = {
    if (xml == null) return ("", IndexedSeq.empty)
    val iUrlset = xml.indexOf("<urlset")
    val iIndex = xml.indexOf("<sitemapindex")
    val kind =
      if (iUrlset < 0 && iIndex < 0) ""
      else if (iIndex < 0 || (iUrlset >= 0 && iUrlset < iIndex)) "urlset"
      else "sitemapindex"
    if (kind.isEmpty) return ("", IndexedSeq.empty)
    val blockTag = if (kind == "urlset") "url" else "sitemap"
    val entries = scanBlocks(xml, blockTag) { (seq, block) =>
      val loc = tagText(block, "loc")
      if (loc == null || loc.isEmpty) None
      else {
        val pr = if (kind == "urlset") tagText(block, "priority") else null
        Some(SitemapEntry(
          seq,
          loc,
          tagText(block, "lastmod"),
          if (kind == "urlset") tagText(block, "changefreq") else null,
          if (pr != null && NumberValue.pattern.matcher(pr).matches())
            java.lang.Double.valueOf(pr)
          else null))
      }
    }
    (kind, entries)
  }

  /** Sitemap table (host, sitemap_xml) → one row per entry:
    * (host, kind, seq, loc, lastmod, changefreq, priority). Map-only; a
    * host whose document parses to zero entries emits nothing (the
    * repo's valid-subset convention). Null rows dropped.
    */
  def parse(sitemaps: DataFrame): DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    sitemaps.select(col("host"), col("sitemap_xml"))
      .filter(col("host").isNotNull && col("sitemap_xml").isNotNull)
      .as[(String, String)]
      .flatMap { case (host, xml) =>
        val (kind, entries) = parseSitemap(xml)
        entries.iterator.map(e =>
          (host, kind, e.seq, e.loc, Option(e.lastmod),
            Option(e.changefreq),
            Option(e.priority).map(_.doubleValue)))
      }
      .toDF("host", "kind", "seq", "loc", "lastmod", "changefreq",
        "priority")
  }

  /** Frontier seeding: the urlset locs, robots-gated — parse → distinct
    * urls → [[Robots.annotate]] → allowed only. The politeness loop
    * closed end-to-end: robots.txt names the sitemap, the sitemap names
    * the urls, robots rules still gate every one of them. Shuffle shape
    * is one distinct on url plus annotate's replicated-build-side robots
    * join — document text never moves.
    */
  def seeds(
      sitemaps: DataFrame,
      robots: DataFrame,
      agent: String,
      saltBuckets: Int = 1): DataFrame = {
    val urls = parse(sitemaps)
      .filter(col("kind") === "urlset")
      .select(col("loc").as("url")).distinct()
    Robots.annotate(urls, robots, agent, saltBuckets)
      .filter(col("allowed"))
      .select(col("url"), col("host"), col("crawl_delay"))
  }
}
