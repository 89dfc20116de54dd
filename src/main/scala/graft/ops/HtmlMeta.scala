package graft.ops

import graft.align.ExtractHtml
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Head-metadata extraction — the per-page fields a crawl pipeline indexes
  * alongside the body text (title, meta description, og:title, canonical
  * url, declared language). Pure per-row parse → map-only over the corpus.
  *
  * PINNED spec (mirrored clean-room in tools/oracle/graftpy.py hm_*):
  *   - the scan region is the document prefix up to the first `</head>`
  *     (ASCII-case-insensitive); absent → the whole document (a body
  *     `<title>` decoy after `</head>` must NOT leak in);
  *   - `title` = inner text of the first `<title>`…`</title>` in region,
  *     tag-stripped, entity-decoded, whitespace-collapsed; unterminated →
  *     treated as absent;
  *   - `description` = `content` attr of the first `<meta>` whose `name`
  *     attr is `description` (attr VALUES compared ASCII-ci), entity-
  *     decoded + ws-collapsed; `og_title` likewise from the first `<meta>`
  *     with `property` = `og:title`;
  *   - `canonical` = `href` of the first `<link>` whose `rel` is
  *     `canonical`, entity-decoded then RESOLVED against the page url via
  *     [[LinkGraph.resolve]] (same restricted resolver as the link graph —
  *     one url semantics in the whole library); unresolvable → null;
  *   - `lang` = `lang` attr of the first `<html>` tag, trimmed +
  *     ASCII-lowered; absent/empty → null;
  *   - attribute parsing ([[attrsOf]]): inside one tag body, `name=value`
  *     pairs with names ASCII-lowered (first occurrence of a name wins),
  *     values optionally single-/double-quoted (unquoted runs end at
  *     whitespace), valueless attributes map to ""; a `/` standing alone
  *     (self-closing slash) is skipped.
  */
object HtmlMeta {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** ASCII-ci indexOf (needle lowercase) — same contract as LinkGraph's. */
  private def indexOfIc(s: String, needle: String, from: Int): Int = {
    @inline def lower(c: Char): Char =
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    var i = math.max(from, 0)
    val n = needle.length
    while (i + n <= s.length) {
      var j = 0
      while (j < n && lower(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  /** Attribute map of one tag body (text between `<name` and `>`).
    * Names ASCII-lowered, first occurrence wins.
    */
  private[ops] def attrsOf(tagBody: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    val n = tagBody.length
    // skip the element name (up to first whitespace)
    while (i < n && !isWs(tagBody.charAt(i))) i += 1
    while (i < n) {
      while (i < n && isWs(tagBody.charAt(i))) i += 1
      if (i >= n) return out.toMap
      if (tagBody.charAt(i) == '/') { i += 1 }
      else {
        val nameStart = i
        while (i < n && !isWs(tagBody.charAt(i)) && tagBody.charAt(i) != '=')
          i += 1
        val name = LinkGraph.asciiLower(tagBody.substring(nameStart, i))
        while (i < n && isWs(tagBody.charAt(i))) i += 1
        var value = ""
        if (i < n && tagBody.charAt(i) == '=') {
          i += 1
          while (i < n && isWs(tagBody.charAt(i))) i += 1
          if (i < n && (tagBody.charAt(i) == '"' || tagBody.charAt(i) == '\'')) {
            val q = tagBody.charAt(i)
            val end = tagBody.indexOf(q, i + 1)
            if (end < 0) { // unterminated quote: value is the tail
              value = tagBody.substring(i + 1); i = n
            } else { value = tagBody.substring(i + 1, end); i = end + 1 }
          } else {
            val vs = i
            while (i < n && !isWs(tagBody.charAt(i))) i += 1
            value = tagBody.substring(vs, i)
          }
        }
        if (name.nonEmpty && !out.contains(name)) out(name) = value
      }
    }
    out.toMap
  }

  /** All (tagBody) occurrences of `<name ...>` in `region`, in order.
    * `<name` must be followed by whitespace, '>' or '/' so `<metal>` does
    * not match `<meta`.
    */
  private[ops] def tagsOf(region: String, name: String): Iterator[String] =
    new Iterator[String] {
      private val needle = "<" + name
      private var from = 0
      private var nextBody: String = advance()
      private def advance(): String = {
        while (true) {
          val a = indexOfIc(region, needle, from)
          if (a < 0) return null
          val after = a + needle.length
          if (after < region.length && {
            val c = region.charAt(after)
            isWs(c) || c == '>' || c == '/'
          }) {
            val gt = region.indexOf('>', a)
            if (gt < 0) return null // unterminated tag drops the tail
            from = gt + 1
            return region.substring(a + 1, gt)
          }
          from = after
        }
        null
      }
      def hasNext: Boolean = nextBody != null
      def next(): String = { val r = nextBody; nextBody = advance(); r }
    }

  private def cleanText(s: String): String =
    LinkGraph.collapseWs(ExtractHtml.decodeEntities(LinkGraph.stripTags(s)))

  final case class Meta(
      title: Option[String],
      description: Option[String],
      ogTitle: Option[String],
      canonical: Option[String],
      lang: Option[String])

  /** Parse one page's head metadata per the pinned spec. Null-safe. */
  def parse(html: String, pageUrl: String): Meta = {
    if (html == null) return Meta(None, None, None, None, None)
    val headEnd = indexOfIc(html, "</head>", 0)
    val region = if (headEnd < 0) html else html.substring(0, headEnd)

    val title: Option[String] = {
      var res: Option[String] = None
      var from = 0
      var done = false
      while (!done) {
        val a = indexOfIc(region, "<title", from)
        if (a < 0) done = true
        else {
          val after = a + 6
          val valid = after < region.length && {
            val c = region.charAt(after); isWs(c) || c == '>' || c == '/'
          }
          if (!valid) from = after
          else {
            val gt = region.indexOf('>', a)
            val close =
              if (gt < 0) -1 else indexOfIc(region, "</title>", gt + 1)
            if (close >= 0) {
              val t = cleanText(region.substring(gt + 1, close))
              if (t.nonEmpty) res = Some(t)
            }
            done = true // first <title> decides (present, empty, or broken)
          }
        }
      }
      res
    }

    var description: Option[String] = None
    var ogTitle: Option[String] = None
    tagsOf(region, "meta").foreach { body =>
      val attrs = attrsOf(body)
      val nameLc = attrs.get("name").map(LinkGraph.asciiLower)
      val propLc = attrs.get("property").map(LinkGraph.asciiLower)
      if (description.isEmpty && nameLc.contains("description"))
        description = attrs.get("content").map(cleanText).filter(_.nonEmpty)
      if (ogTitle.isEmpty && propLc.contains("og:title"))
        ogTitle = attrs.get("content").map(cleanText).filter(_.nonEmpty)
    }

    // the FIRST rel=canonical link DECIDES — even when its href is
    // missing or unresolvable (mirror parity: a second canonical on the
    // page never rescues a broken first one)
    var canonical: Option[String] = None
    var canonicalSeen = false
    val linkIt = tagsOf(region, "link")
    while (!canonicalSeen && linkIt.hasNext) {
      val attrs = attrsOf(linkIt.next())
      if (attrs.get("rel").map(LinkGraph.asciiLower).contains("canonical")) {
        canonicalSeen = true
        canonical = attrs.get("href")
          .map(h => ExtractHtml.decodeEntities(h.trim)) // Java trim —
          // mirrored by graftpy._java_trim, NOT Python's Unicode strip
          .flatMap(h => LinkGraph.resolve(pageUrl, h))
      }
    }

    val lang: Option[String] = {
      val it = tagsOf(region, "html")
      if (!it.hasNext) None
      else attrsOf(it.next()).get("lang")
        .map(v => LinkGraph.asciiLower(v.trim)).filter(_.nonEmpty)
    }

    Meta(title, description, ogTitle, canonical, lang)
  }

  /** Corpus form over a page table (url, html:binary):
    * (url, title, description, og_title, canonical, lang) — one map pass,
    * null url/html rows dropped (repo null-row convention).
    */
  def headMeta(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("url"), col("html"))
      .filter(col("url").isNotNull && col("html").isNotNull)
      .as[(String, Array[Byte])]
      .map { case (url, html) =>
        val m = parse(
          new String(html, java.nio.charset.StandardCharsets.UTF_8), url)
        (url, m.title.orNull, m.description.orNull, m.ogTitle.orNull,
          m.canonical.orNull, m.lang.orNull)
      }
      .toDF("url", "title", "description", "og_title", "canonical", "lang")
  }
}
