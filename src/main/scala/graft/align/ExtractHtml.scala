package graft.align

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

/** HTML → noisy char stream extraction — the graft role of the reference's
  * image-preprocessing + OCR stages (SURVEY.md O13; reference side
  * alignToOCR.py:128-184). Per the north rule this is a main-content
  * extraction: boilerplate subtrees are dropped, tags stripped, entities
  * decoded, ligatures folded, '~' specks removed (clean_special_chars
  * analogue, alignToOCR.py:61-72), whitespace normalized.
  *
  * Deterministic pure function over the `html` binary column. Each char of
  * the extracted stream keeps its offset: char k ⇒ box (k,0)-(k+1,1), the
  * web-text degeneration of the reference's `.llocs` pixel positions.
  */
object ExtractHtml {

  private val CommentRe = Pattern.compile("(?s)<!--.*?-->")
  // boilerplate subtrees dropped whole (script/style and non-content chrome)
  private val DropSubtreeRe = Pattern.compile(
    "(?is)<(script|style|head|nav|footer|header|aside|noscript|template|svg|form)\\b[^>]*>.*?</\\1\\s*>")
  private val TagRe = Pattern.compile("(?s)<[^>]*>")
  private val WsRunRe = Pattern.compile("\\s+")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©", "shy" -> "")

  private val EntityRe = Pattern.compile("&(#x?[0-9a-fA-F]+|[a-zA-Z]+);")

  /** Decode the common HTML entities (named subset above + numeric). Unknown
    * named entities are left verbatim — deterministic either way.
    */
  def decodeEntities(s: String): String = {
    val m = EntityRe.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      val body = m.group(1)
      val rep =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))
          catch { case _: Exception => m.group() }
        else if (body.startsWith("#"))
          try new String(Character.toChars(Integer.parseInt(body.substring(1))))
          catch { case _: Exception => m.group() }
        else NamedEntities.getOrElse(body, m.group())
      sb.append(rep)
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Fold typographic ligatures to their letter sequences. */
  def foldLigatures(s: String): String = {
    if (s.indexOf('ﬀ') < 0 && s.indexOf('ﬁ') < 0 && s.indexOf('ﬂ') < 0 &&
        s.indexOf('ﬃ') < 0 && s.indexOf('ﬄ') < 0 && s.indexOf('ﬅ') < 0 &&
        s.indexOf('ﬆ') < 0) return s
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case 'ﬀ' => sb.append("ff")
        case 'ﬁ' => sb.append("fi")
        case 'ﬂ' => sb.append("fl")
        case 'ﬃ' => sb.append("ffi")
        case 'ﬄ' => sb.append("ffl")
        case 'ﬅ' => sb.append("st") // ſt
        case 'ﬆ' => sb.append("st")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Final stream cleanup: ligature fold → '~' drop → whitespace collapse →
    * trim. Offsets are assigned over THIS cleaned stream.
    */
  def cleanStream(s: String): String = {
    val folded = foldLigatures(s)
    val noTilde = CleanText.cleanSpecialChars(folded)
    WsRunRe.matcher(noTilde).replaceAll(" ").trim
  }

  /** Extract the noisy text stream from an HTML payload. */
  def extractText(html: Array[Byte]): String = {
    if (html == null || html.isEmpty) return ""
    extractText(new String(html, StandardCharsets.UTF_8))
  }

  def extractText(html: String): String = {
    var t = CommentRe.matcher(html).replaceAll(" ")
    // repeat subtree drop to handle sequential occurrences after first pass
    var prev: String = null
    while (prev != t) { prev = t; t = DropSubtreeRe.matcher(t).replaceAll(" ") }
    t = TagRe.matcher(t).replaceAll(" ")
    t = decodeEntities(t)
    cleanStream(t)
  }

  /** Extracted stream as unit char boxes (SURVEY.md D2 degeneration). */
  def extractCharBoxes(html: Array[Byte]): IndexedSeq[CharBox] = {
    val s = extractText(html)
    val out = new Array[CharBox](s.length)
    var k = 0
    while (k < s.length) { out(k) = CharBox.at(s.charAt(k), k); k += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}
