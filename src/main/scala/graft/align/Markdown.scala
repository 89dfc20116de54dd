package graft.align

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

/** HTML → Markdown structured extraction — the third extraction surface
  * next to [[ExtractHtml]] (char-stream for the alignment kernel) and
  * [[MainContent]] (density-classified plain text): modern LLM corpus
  * pipelines (FineWeb-Edu, Dolma, RedPajama-v2 post-processing) convert
  * pages to Markdown because headings/lists/tables carry signal that a
  * flat char stream destroys. This is a deterministic, pinned-subset
  * converter — NOT a browser: it handles the block/inline tags below and
  * treats every other tag as transparent, so the output is a pure
  * function of the input bytes that the clean-room Python mirror
  * (tools/oracle/graftpy.py `mdx_convert`) reproduces exactly.
  *
  * Pinned rendering spec (shared verbatim with the mirror):
  *   - comments removed; script/style/head/noscript/template/svg subtrees
  *     dropped iteratively (same rule as [[MainContent]]).
  *   - whitespace inside inline text = ASCII `[ \t\n\r\f]` runs → one
  *     space (NOT `\s`: Java and Python disagree on U+00A0 under `\s`).
  *   - h1..h6 → `#`·n + space + inline; p/div/section/article/header/
  *     footer/nav/aside/main/figure/figcaption → paragraph blocks;
  *     blockquote → every line of inner blocks prefixed `> ` per level;
  *     ul/ol → `- ` / `1. ` items, nested lists indented two spaces per
  *     level, numbering restarts per ol; pre → fenced ``` block with raw
  *     (entity-decoded, uncollapsed) text; table → pipe rows, with a
  *     `| --- |` separator after the first row iff that row is all-`<th>`;
  *     hr → `---`; br → single space (inline).
  *   - inline: a → `[text](href)` (bare text when href is absent/empty),
  *     b/strong → `**text**`, i/em → `*text*`, code → `` `text` ``;
  *     `|` inside table cells escapes to `\|`.
  *   - blocks joined by one blank line; empty blocks never emitted.
  *
  * 100 TB shape: per-row pure function, single map-only pass, no shuffle —
  * same contract as the other extraction kernels.
  */
object Markdown {

  // every whitespace class below is the PINNED ASCII set, never \s —
  // Java \s is ASCII-only while Python \s is Unicode (U+00A0 etc.), so a
  // \s anywhere in a mirrored regex breaks the bit-identical contract
  private val CommentRe = Pattern.compile("(?s)<!--.*?-->")
  private val DropSubtreeRe = Pattern.compile(
    "(?is)<(script|style|head|noscript|template|svg)\\b[^>]*>.*?</\\1[ \t\n\r\f]*>")
  private val HrefRe = Pattern.compile(
    "(?is)\\bhref[ \t\n\r\f]*=[ \t\n\r\f]*(\"([^\"]*)\"|'([^']*)')")
  private val WsRunRe = Pattern.compile("[ \t\n\r\f]+")

  /** One parse event: either a text run or a tag. */
  private final case class Tok(
      text: String,       // non-null for text runs, null for tags
      name: String,       // lowercase tag name for tags, null for text
      isClose: Boolean,
      href: String)       // decoded href for <a ...>, else null

  /** Linear scan into text/tag tokens. A `<` with no closing `>` is
    * literal text; tags with no leading letter after the optional `/`
    * (doctype, processing instructions) emit nothing.
    */
  private def tokenize(html: String): ArrayBuffer[Tok] = {
    var t = CommentRe.matcher(html).replaceAll(" ")
    var prev: String = null
    while (prev != t) { prev = t; t = DropSubtreeRe.matcher(t).replaceAll(" ") }
    val out = new ArrayBuffer[Tok]
    var i = 0
    val n = t.length
    while (i < n) {
      val lt = t.indexOf('<', i)
      if (lt < 0) {
        out += Tok(ExtractHtml.decodeEntities(t.substring(i)), null, isClose = false, null)
        i = n
      } else {
        if (lt > i)
          out += Tok(ExtractHtml.decodeEntities(t.substring(i, lt)), null, isClose = false, null)
        val gt = t.indexOf('>', lt + 1)
        if (gt < 0) { // unterminated tag: the rest is literal text
          out += Tok(ExtractHtml.decodeEntities(t.substring(lt)), null, isClose = false, null)
          i = n
        } else {
          val body = t.substring(lt + 1, gt)
          var k = 0
          val isClose = body.nonEmpty && body.charAt(0) == '/'
          if (isClose) k = 1
          // ASCII-pinned name chars: Java Character.isLetter and Python
          // str.isalpha disagree outside ASCII — never use either here
          def asciiLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
          val ns = k
          while (k < body.length && (asciiLetter(body.charAt(k)) ||
              (k > ns && body.charAt(k) >= '0' && body.charAt(k) <= '9'))) k += 1
          // Locale.ROOT: default-locale toLowerCase turns "LI"/"I" into
          // dotless-ı forms under tr/az and silently unmaps the handlers
          val name = body.substring(ns, k).toLowerCase(java.util.Locale.ROOT)
          if (name.nonEmpty) {
            val href =
              if (name == "a" && !isClose) {
                val m = HrefRe.matcher(body)
                if (m.find()) {
                  val v = if (m.group(2) != null) m.group(2) else m.group(3)
                  ExtractHtml.decodeEntities(v)
                } else null
              } else null
            out += Tok(null, name, isClose, href)
          }
          i = gt + 1
        }
      }
    }
    out
  }

  // trim is pinned to the same five ASCII chars as the run regex: Java
  // String.trim (≤ U+0020) and Python str.strip() (Unicode ws incl.
  // U+00A0) disagree at block edges — neither is used
  private def wsNorm(s: String): String = {
    val t = WsRunRe.matcher(s).replaceAll(" ")
    @inline def ws(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    var a = 0
    var b = t.length
    while (a < b && ws(t.charAt(a))) a += 1
    while (b > a && ws(t.charAt(b - 1))) b -= 1
    t.substring(a, b)
  }

  private val BlockContainers = Set(
    "p", "div", "section", "article", "header", "footer", "nav", "aside",
    "main", "figure", "figcaption")
  private val InlineWrap = Map(
    "b" -> "**", "strong" -> "**", "i" -> "*", "em" -> "*", "code" -> "`")

  /** Nesting cap (pinned, shared with the mirror): past this depth every
    * structural tag renders transparently. Crawl bytes are adversarial —
    * without the cap, 100k nested opens is a StackOverflowError (JVM) or
    * RecursionError (mirror).
    */
  private val MaxNest = 100

  /** One-pass per-name LIFO close matching: matchIdx(i) = index of the
    * close token pairing the open at i, or -1. Per-name stack pairing is
    * exactly the balanced-depth scan of the spec, but O(n) total — a
    * per-open forward scan is O(n²) on an unclosed-tag flood (250k bare
    * `<a>` in a 1 MB page = 3·10^10 steps, an effective hang).
    */
  private def matchIndex(toks: ArrayBuffer[Tok]): Array[Int] = {
    val idx = Array.fill(toks.length)(-1)
    val stacks = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayDeque[Int]]
    var i = 0
    while (i < toks.length) {
      val tk = toks(i)
      if (tk.name != null) {
        if (!tk.isClose)
          stacks.getOrElseUpdate(tk.name, scala.collection.mutable.ArrayDeque.empty)
            .append(i)
        else stacks.get(tk.name).foreach { st =>
          if (st.nonEmpty) idx(st.removeLast()) = i
        }
      }
      i += 1
    }
    idx
  }

  /** (contentEnd, nextIndex) for the open token at `i` — the lookup form
    * of the old balanced scan: contentEnd points AT the close token.
    */
  @inline private def matchedEnd(
      toks: ArrayBuffer[Tok], mi: Array[Int], i: Int): (Int, Int) = {
    val m = mi(i)
    if (m < 0) (toks.length, toks.length) else (m, m + 1)
  }

  /** Inline rendering of tokens[i, end): text + a/b/i/em/strong/code/br;
    * any block tag inside an inline context renders transparently (its
    * own text becomes inline); unknown tags are transparent; structural
    * tags past [[MaxNest]] are transparent too.
    */
  private def renderInline(
      toks: ArrayBuffer[Tok], mi: Array[Int],
      i0: Int, end: Int, depth: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = i0
    while (i < end) {
      val tk = toks(i)
      if (tk.text != null) { sb.append(tk.text); i += 1 }
      else if (!tk.isClose && tk.name == "br") { sb.append(' '); i += 1 }
      else if (!tk.isClose && depth < MaxNest && tk.name == "a") {
        val (ce, ni) = matchedEnd(toks, mi, i)
        val inner = wsNorm(renderInline(toks, mi, i + 1, math.min(ce, end), depth + 1))
        if (inner.nonEmpty) {
          if (tk.href != null && tk.href.nonEmpty)
            sb.append('[').append(inner).append("](").append(tk.href).append(')')
          else sb.append(inner)
          sb.append(' ')
        }
        i = math.min(ni, end)
      } else if (!tk.isClose && depth < MaxNest && InlineWrap.contains(tk.name)) {
        val w = InlineWrap(tk.name)
        val (ce, ni) = matchedEnd(toks, mi, i)
        val inner = wsNorm(renderInline(toks, mi, i + 1, math.min(ce, end), depth + 1))
        if (inner.nonEmpty) sb.append(w).append(inner).append(w).append(' ')
        i = math.min(ni, end)
      } else i += 1 // transparent tag
    }
    sb.toString
  }

  /** Raw text of tokens[i, end) — for `pre`: entities already decoded at
    * tokenize time, whitespace preserved, tags skipped.
    */
  private def rawText(toks: ArrayBuffer[Tok], i0: Int, end: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = i0
    while (i < end) { if (toks(i).text != null) sb.append(toks(i).text); i += 1 }
    sb.toString
  }

  private def stripNl(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && (s.charAt(a) == '\n' || s.charAt(a) == '\r')) a += 1
    while (b > a && (s.charAt(b - 1) == '\n' || s.charAt(b - 1) == '\r')) b -= 1
    s.substring(a, b)
  }

  /** List rendering: returns the lines of one list block. `listDepth`
    * drives the two-space indent; `depth` is the structural nesting cap.
    */
  private def renderList(
      toks: ArrayBuffer[Tok], mi: Array[Int], i0: Int, end: Int,
      ordered: Boolean, listDepth: Int, depth: Int): ArrayBuffer[String] = {
    val lines = new ArrayBuffer[String]
    var i = i0
    var counter = 0
    while (i < end) {
      val tk = toks(i)
      // NO depth guard on li itself: item processing is iterative and
      // renderInline self-caps, so text is never lost at the boundary —
      // only the nested-list RECURSION below is depth-gated
      if (tk.name == "li" && !tk.isClose) {
        val (ce, ni) = matchedEnd(toks, mi, i)
        val ce2 = math.min(ce, end)
        // split the item at its first nested list (if any); past the
        // cap the nested region renders INLINE instead (ul/li are
        // transparent to renderInline) so its text is never lost
        var j = i + 1
        var nest = -1
        while (j < ce2 && nest < 0) {
          val t2 = toks(j)
          if (!t2.isClose && (t2.name == "ul" || t2.name == "ol")) nest = j
          j += 1
        }
        val renderNested = nest >= 0 && depth + 1 < MaxNest
        val itemEnd = if (renderNested) nest else ce2
        counter += 1
        val marker = if (ordered) s"$counter. " else "- "
        val txt = wsNorm(renderInline(toks, mi, i + 1, itemEnd, depth + 1))
        lines += ("  " * listDepth) + marker + txt
        if (renderNested) {
          val nTag = toks(nest)
          val (nce, _) = matchedEnd(toks, mi, nest)
          lines ++= renderList(toks, mi, nest + 1, math.min(nce, ce2),
            nTag.name == "ol", listDepth + 1, depth + 2)
        }
        i = math.min(ni, end)
      } else i += 1
    }
    lines
  }

  /** One extracted table cell. */
  final case class Cell(
      tableIdx: Int, rowIdx: Int, colIdx: Int, isHeader: Boolean, text: String)

  private def escapeCell(s: String): String = s.replace("|", "\\|")

  /** Table rendering: pipe rows; separator after an all-`<th>` first row.
    * Also returns the per-cell rows for the table-extraction operator.
    */
  private def renderTable(
      toks: ArrayBuffer[Tok], mi: Array[Int], i0: Int, end: Int,
      tableIdx: Int, depth: Int)
      : (ArrayBuffer[String], ArrayBuffer[Cell]) = {
    val lines = new ArrayBuffer[String]
    val cells = new ArrayBuffer[Cell]
    var i = i0
    var rowIdx = 0
    while (i < end) {
      val tk = toks(i)
      // NO depth guard on tr/cells: row processing is iterative and the
      // cell's renderInline self-caps — text is never lost at the boundary
      if (tk.name == "tr" && !tk.isClose) {
        val (ce, ni) = matchedEnd(toks, mi, i)
        val ce2 = math.min(ce, end)
        var j = i + 1
        val rowCells = new ArrayBuffer[(Boolean, String)]
        while (j < ce2) {
          val t2 = toks(j)
          if (!t2.isClose && (t2.name == "td" || t2.name == "th")) {
            val (cce, cni) = matchedEnd(toks, mi, j)
            val txt = wsNorm(
              renderInline(toks, mi, j + 1, math.min(cce, ce2), depth + 1))
            rowCells += ((t2.name == "th", txt))
            j = math.min(cni, ce2)
          } else j += 1
        }
        if (rowCells.nonEmpty) {
          lines += rowCells.map(c => escapeCell(c._2)).mkString("| ", " | ", " |")
          if (rowIdx == 0 && rowCells.forall(_._1))
            lines += rowCells.map(_ => "---").mkString("| ", " | ", " |")
          var c = 0
          while (c < rowCells.length) {
            cells += Cell(tableIdx, rowIdx, c, rowCells(c)._1, rowCells(c)._2)
            c += 1
          }
          rowIdx += 1
        }
        i = math.min(ni, end)
      } else i += 1
    }
    (lines, cells)
  }

  private def withQuote(block: String, quote: Int): String =
    if (quote == 0) block
    else block.split("\n", -1).map(l => ("> " * quote) + l).mkString("\n")

  /** Block-level walk of tokens[i, end): returns finished blocks.
    * Structural tags past [[MaxNest]] render transparently.
    */
  private def renderBlocks(
      toks: ArrayBuffer[Tok], mi: Array[Int], i0: Int, end: Int, quote: Int,
      tables: ArrayBuffer[Cell], tableCounter: Array[Int],
      depth: Int): ArrayBuffer[String] = {
    val blocks = new ArrayBuffer[String]
    val buf = new java.lang.StringBuilder

    def flush(): Unit = {
      val s = wsNorm(buf.toString)
      buf.setLength(0)
      if (s.nonEmpty) blocks += withQuote(s, quote)
    }

    val structural = depth < MaxNest
    var i = i0
    while (i < end) {
      val tk = toks(i)
      if (tk.text != null) { buf.append(tk.text); i += 1 }
      else if (!tk.isClose && structural && tk.name.length == 2 &&
          tk.name.charAt(0) == 'h' &&
          tk.name.charAt(1) >= '1' && tk.name.charAt(1) <= '6') {
        flush()
        val lvl = tk.name.charAt(1) - '0'
        val (ce, ni) = matchedEnd(toks, mi, i)
        val inner = wsNorm(renderInline(toks, mi, i + 1, math.min(ce, end), depth + 1))
        if (inner.nonEmpty) blocks += withQuote(("#" * lvl) + " " + inner, quote)
        i = math.min(ni, end)
      } else if (!tk.isClose && structural && BlockContainers.contains(tk.name)) {
        flush()
        val (ce, ni) = matchedEnd(toks, mi, i)
        blocks ++= renderBlocks(toks, mi, i + 1, math.min(ce, end), quote,
          tables, tableCounter, depth + 1)
        i = math.min(ni, end)
      } else if (!tk.isClose && structural && tk.name == "blockquote") {
        flush()
        val (ce, ni) = matchedEnd(toks, mi, i)
        blocks ++= renderBlocks(toks, mi, i + 1, math.min(ce, end), quote + 1,
          tables, tableCounter, depth + 1)
        i = math.min(ni, end)
      } else if (!tk.isClose && structural && (tk.name == "ul" || tk.name == "ol")) {
        flush()
        val (ce, ni) = matchedEnd(toks, mi, i)
        val lines = renderList(toks, mi, i + 1, math.min(ce, end),
          tk.name == "ol", 0, depth + 1)
        if (lines.nonEmpty) blocks += withQuote(lines.mkString("\n"), quote)
        i = math.min(ni, end)
      } else if (!tk.isClose && structural && tk.name == "pre") {
        flush()
        val (ce, ni) = matchedEnd(toks, mi, i)
        val raw = stripNl(rawText(toks, i + 1, math.min(ce, end)))
        blocks += withQuote("```\n" + raw + "\n```", quote)
        i = math.min(ni, end)
      } else if (!tk.isClose && structural && tk.name == "table") {
        flush()
        val (ce, ni) = matchedEnd(toks, mi, i)
        val idx = tableCounter(0)
        tableCounter(0) += 1
        val (lines, cells) = renderTable(toks, mi, i + 1, math.min(ce, end),
          idx, depth + 1)
        tables ++= cells
        if (lines.nonEmpty) blocks += withQuote(lines.mkString("\n"), quote)
        i = math.min(ni, end)
      } else if (!tk.isClose && tk.name == "hr") {
        flush()
        blocks += withQuote("---", quote)
        i += 1
      } else if (!tk.isClose && tk.name == "br") { buf.append(' '); i += 1 }
      else if (!tk.isClose && structural &&
          (tk.name == "a" || InlineWrap.contains(tk.name))) {
        // delegate the whole inline span (open tag included) to
        // renderInline — ONE implementation of link/emphasis rendering
        val (_, ni) = matchedEnd(toks, mi, i)
        val ni2 = math.min(ni, end)
        buf.append(renderInline(toks, mi, i, ni2, depth))
        i = ni2
      } else i += 1 // transparent (unknown tag, stray close, tbody, ...)
    }
    flush()
    blocks
  }

  final case class Conversion(markdown: String, nBlocks: Int, tables: Vector[Cell])

  /** Full conversion; also surfaces every table's cells for the
    * table-extraction operator (one parse, two consumers).
    */
  def convert(html: Array[Byte]): Conversion = {
    if (html == null || html.isEmpty) return Conversion("", 0, Vector.empty)
    val toks = tokenize(new String(html, StandardCharsets.UTF_8))
    val mi = matchIndex(toks)
    val tables = new ArrayBuffer[Cell]
    val blocks = renderBlocks(toks, mi, 0, toks.length, 0, tables, Array(0), 0)
    Conversion(blocks.mkString("\n\n"), blocks.length, tables.toVector)
  }
}
