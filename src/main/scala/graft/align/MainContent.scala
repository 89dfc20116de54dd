package graft.align

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

/** Density-based main-content extraction (jusText-simplified) — the
  * DOM-heuristic half of the north rule's "HTML boilerplate strip": where
  * [[ExtractHtml]] drops boilerplate by TAG NAME (nav/footer/aside/...),
  * this operator classifies every block-level segment by measured
  * densities, so `<div class="sidebar">` chrome with no semantic tag is
  * still removed. Modeled on the published jusText/boilerpipe family
  * (block segmentation + link-density + stopword-density rules), reduced
  * to a deterministic ordered rule list over integer-rational comparisons
  * (no floats — cross-engine oracle-safe):
  *
  *   r1  link-dense kill:   5·link_chars ≥ total_chars (and ≥1 link char)
  *   r2  long keep:         total_chars ≥ 40
  *   r3  stopword rescue:   total_chars ≥ 20 and 10·stop_words ≥ 3·words
  *   r4  default kill
  *
  * r2 before r3 means a long link-free block is content regardless of
  * language (the corpus vocabulary is stopword-poor); r3 rescues short
  * natural-language sentences ("a note to all of the readers") that r2
  * would drop. The honest failure mode — a SHORT stopword-poor content
  * block is lost — is the same trade jusText makes for its "short" class.
  *
  * Per-row pure function: the 100 TB shape is a single map-only pass, no
  * shuffle, fully codegen-adjacent (one kernel call per row inside a typed
  * Dataset map). Block segmentation, entity decoding and whitespace
  * normalization are specified operation-for-operation in the clean-room
  * Python mirror (tools/oracle/graftpy.py) — the golden is an independent
  * implementation, not Spark output.
  */
object MainContent {

  final case class Block(text: String, linkChars: Int, words: Int, stopWords: Int) {
    def totalChars: Int = text.length
    /** Ordered rule list; true = content. */
    def isContent: Boolean =
      if (linkChars > 0 && 5 * linkChars >= totalChars) false // r1
      else if (totalChars >= 40) true                         // r2
      else if (totalChars >= 20 && 10 * stopWords >= 3 * words) true // r3
      else false                                              // r4
  }

  final case class Extraction(
      content: String, nBlocks: Int, nKept: Int, removedChars: Long)

  private val CommentRe = Pattern.compile("(?s)<!--.*?-->")
  // subtrees that are never text content at all (chrome tags like
  // nav/footer/aside are deliberately NOT here — density must handle them)
  private val DropSubtreeRe = Pattern.compile(
    "(?is)<(script|style|head|noscript|template|svg)\\b[^>]*>.*?</\\1\\s*>")
  // block-level boundaries: each such tag (open or close) splits a block
  private val BlockTagRe = Pattern.compile(
    "(?i)</?(p|div|td|th|li|ul|ol|h[1-6]|blockquote|pre|table|tr|section|article|nav|footer|header|aside|form|br|hr)\\b[^>]*>")
  private val AnchorRe = Pattern.compile("(?is)<a\\b[^>]*>(.*?)</a\\s*>")
  private val TagRe = Pattern.compile("(?s)<[^>]*>")
  private val WsRunRe = Pattern.compile("\\s+")

  /** Pinned stopword list (mirrored verbatim in graftpy.py). */
  private[graft] val StopWords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "by",
    "for", "with", "from", "as", "is", "are", "was", "were", "be", "been",
    "it", "this", "that", "these", "those", "we", "you", "your", "they",
    "their", "have", "has", "had", "not", "but", "all")

  /** Lowercase and strip leading/trailing non-[a-z] chars — '(the' and
    * 'The.' both normalize to 'the'. Empty result = token is not a
    * stopword candidate (but still counts as a word).
    */
  private def normWord(w: String): String = {
    val lw = w.toLowerCase
    var i = 0
    var j = lw.length
    while (i < j && (lw.charAt(i) < 'a' || lw.charAt(i) > 'z')) i += 1
    while (j > i && (lw.charAt(j - 1) < 'a' || lw.charAt(j - 1) > 'z')) j -= 1
    lw.substring(i, j)
  }

  private def normText(s: String): String =
    WsRunRe.matcher(ExtractHtml.decodeEntities(s)).replaceAll(" ").trim

  /** Segment an HTML payload into classified blocks (empty-text segments
    * are not blocks). Anchors spanning a block boundary contribute their
    * chars to neither side — the boundary split happens first, by
    * definition (fixtures keep anchors within blocks, as real markup does).
    */
  def blocksOf(html: String): Vector[Block] = {
    var t = CommentRe.matcher(html).replaceAll(" ")
    var prev: String = null
    while (prev != t) { prev = t; t = DropSubtreeRe.matcher(t).replaceAll(" ") }
    val segs = BlockTagRe.matcher(t).replaceAll("\u0000").split('\u0000')
    val out = Vector.newBuilder[Block]
    var k = 0
    while (k < segs.length) {
      val seg = segs(k)
      val text = normText(TagRe.matcher(seg).replaceAll(" "))
      if (text.nonEmpty) {
        var linkChars = 0
        val am = AnchorRe.matcher(seg)
        while (am.find()) {
          linkChars += normText(TagRe.matcher(am.group(1)).replaceAll(" ")).length
        }
        val toks = text.split(" ")
        var words = 0
        var stops = 0
        var i = 0
        while (i < toks.length) {
          if (toks(i).nonEmpty) {
            words += 1
            if (StopWords.contains(normWord(toks(i)))) stops += 1
          }
          i += 1
        }
        out += Block(text, linkChars, words, stops)
      }
      k += 1
    }
    out.result()
  }

  /** Full extraction: kept blocks joined by '\n' + audit metrics. */
  def extract(html: Array[Byte]): Extraction = {
    if (html == null || html.isEmpty) return Extraction("", 0, 0, 0L)
    val bs = blocksOf(new String(html, StandardCharsets.UTF_8))
    val kept = bs.filter(_.isContent)
    Extraction(
      kept.map(_.text).mkString("\n"),
      bs.length,
      kept.length,
      bs.iterator.filterNot(_.isContent).map(_.totalChars.toLong).sum)
  }
}
