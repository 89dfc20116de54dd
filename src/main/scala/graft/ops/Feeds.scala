package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parsing — the OTHER XML a crawler ingests beside
  * sitemaps: feeds announce fresh urls faster than sitemap lastmod, so a
  * freshness-oriented frontier consumes both. Shares [[Sitemaps]]'
  * pinned XML machinery (entity decode, ASCII trim, first-tag-text) and
  * its damage semantics (total parser, valid-entry subset). Mirrored
  * clean-room as `fd_*` in graftpy.py.
  *
  * PINNED subset:
  *   - document kind = FIRST of `<rss` / `<feed` to appear (lowercase);
  *     anything else parses to zero entries with kind "";
  *   - entries are `<item>…</item>` (rss) / `<entry>…</entry>` (atom)
  *     blocks in document order; an unterminated block stops the scan;
  *   - per entry: rss link = first `<link>text</link>`, atom link = the
  *     `href` attribute of the first `<link` tag in the block (entity-
  *     decoded, ASCII-trimmed); an entry with no non-empty link is
  *     SKIPPED (the sitemap loc rule);
  *   - title = first `<title>`; id = first `<guid>` (rss) / `<id>`
  *     (atom); published = first `<pubDate>` (rss) / `<updated>` (atom);
  *     all nullable.
  */
object Feeds {

  private val HrefRe =
    java.util.regex.Pattern.compile("\\bhref[ \t\n\r\f]*=[ \t\n\r\f]*(\"([^\"]*)\"|'([^']*)')")

  /** The href of the first `<link` TAG inside an Atom entry block. A
    * delimiter (ASCII whitespace, '>', '/', or end-of-block) must follow
    * the name, so a longer tag name starting with "link" (e.g.
    * `<linkfoo href=…>`) is never harvested (ADVICE r6 low #2 — the same
    * indexOf-prefix class as the round-6 /Font anchoring fix; mirrored in
    * fd_atom_href).
    */
  private def atomLinkHref(block: String): String = {
    var at = block.indexOf("<link")
    while (at >= 0) {
      val d = at + 5
      val delimited = d >= block.length || {
        val c = block.charAt(d)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
          c == '>' || c == '/'
      }
      if (delimited) {
        val gt = block.indexOf('>', at)
        val tag = if (gt < 0) block.substring(at) else block.substring(at, gt)
        val m = HrefRe.matcher(tag)
        if (!m.find()) return null
        val v = if (m.group(2) != null) m.group(2) else m.group(3)
        return Sitemaps.decodeEntities(Sitemaps.asciiTrim(v))
      }
      at = block.indexOf("<link", at + 1)
    }
    null
  }

  final case class FeedEntry(
      seq: Int,
      title: String,      // nullable
      link: String,
      entryId: String,    // nullable
      published: String)  // nullable

  /** Parse one feed document → (kind, entries). */
  def parseFeed(xml: String): (String, IndexedSeq[FeedEntry]) = {
    if (xml == null) return ("", IndexedSeq.empty)
    val iRss = xml.indexOf("<rss")
    val iAtom = xml.indexOf("<feed")
    val kind =
      if (iRss < 0 && iAtom < 0) ""
      else if (iAtom < 0 || (iRss >= 0 && iRss < iAtom)) "rss"
      else "atom"
    if (kind.isEmpty) return ("", IndexedSeq.empty)
    val blockTag = if (kind == "rss") "item" else "entry"
    val entries = Sitemaps.scanBlocks(xml, blockTag) { (seq, block) =>
      val link =
        if (kind == "rss") Sitemaps.tagText(block, "link")
        else atomLinkHref(block)
      if (link == null || link.isEmpty) None
      else Some(FeedEntry(
        seq,
        Sitemaps.tagText(block, "title"),
        link,
        Sitemaps.tagText(block, if (kind == "rss") "guid" else "id"),
        Sitemaps.tagText(block, if (kind == "rss") "pubDate" else "updated")))
    }
    (kind, entries)
  }

  /** Feed table (feed_url, feed_xml) → one row per entry:
    * (feed_url, kind, seq, title, link, entry_id, published). Map-only.
    */
  def parse(feeds: DataFrame): DataFrame = {
    val spark = feeds.sparkSession
    import spark.implicits._
    feeds.select(col("feed_url"), col("feed_xml"))
      .filter(col("feed_url").isNotNull)
      .as[(String, String)]
      .flatMap { case (u, xml) =>
        val (kind, es) = parseFeed(xml)
        es.map(e => (u, kind, e.seq, e.title, e.link, e.entryId, e.published))
      }
      .toDF("feed_url", "kind", "seq", "title", "link", "entry_id", "published")
  }
}
