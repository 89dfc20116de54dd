package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF text extraction — the north rule names "PDF/layout parse" next to
  * HTML boilerplate-strip as the extraction tier's inputs: a real crawl
  * carries application/pdf payloads whose text must reach the same typed
  * `text` column as HTML pages. Map-only per row, never throws (the
  * align-kernel totality contract: damaged documents yield their valid
  * prefix / parsed subset).
  *
  * PINNED subset (mirrored clean-room in tools/oracle/graftpy.py pdf_*):
  *   - stream objects located by scanning for `stream\n` / `stream\r\n`;
  *     the governing dict is the text between the nearest preceding `<<`
  *     and the keyword; payload = exactly `/Length N` bytes after the
  *     newline (never delimiter-scanned — compressed bytes may contain
  *     `endstream`); dict containing `/FlateDecode` → zlib-inflate
  *     (both engines wrap zlib; inflate failure skips the stream);
  *     missing/malformed `/Length` skips the stream;
  *   - content streams parse with an operand-stack scan: literal strings
  *     `(...)` (nesting, escapes `\n \r \t \b \f \( \) \\`, 1–3-digit
  *     octal, backslash-newline continuation, other escaped chars kept),
  *     hex strings `<...>` (whitespace allowed, odd length padded with
  *     0), numbers, names, arrays; `<<` inside content skips to `>>`;
  *   - text emission: `Tj` and `'`/`"` emit the string operand (the
  *     quotes first emit a newline — they are next-line-show operators);
  *     `TJ` emits its array's strings with a SPACE for any kerning
  *     number < −150 (the standard word-gap heuristic); `Td`/`TD` with a
  *     nonzero ty operand and `T*` emit a newline; `Tm` and all unknown
  *     operators are ignored; newlines never duplicate and never lead;
  *   - string bytes decode as ISO-8859-1 (byte-transparent — the
  *     PDFDocEncoding subset the fixture uses); streams join with one
  *     newline.
  */
object Pdf {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0.toChar

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode one literal string starting AT the '(' in `s`; returns
    * (decoded, index after the closing ')'). Unterminated → reads to end.
    */
  private[ops] def literalString(s: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\n' => i += 2 // line continuation: dropped
          case '\r' => // \CR or \CRLF continuation
            i += 2
            if (i < s.length && s.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0
            var k = 0
            i += 1
            while (k < 3 && i < s.length && {
              val o = s.charAt(i); o >= '0' && o <= '7'
            }) { v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1 }
            sb.append((v & 0xFF).toChar)
          case other => sb.append(other); i += 2 // unknown escape: kept
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) sb.append(c)
        i += 1
      } else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  /** Decode one hex string starting AT the '<'; returns (decoded, index
    * after '>'). Odd digit count pads a trailing 0; unterminated reads to
    * end.
    */
  private[ops] def hexString(s: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var i = start + 1
    var hi = -1
    while (i < s.length && s.charAt(i) != '>') {
      val v = hexVal(s.charAt(i))
      if (v >= 0) {
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar)
    (sb.toString, if (i < s.length) i + 1 else i)
  }

  private sealed trait Tok
  private final case class Str(v: String) extends Tok
  private final case class Num(v: Double) extends Tok
  private final case class Arr(items: Vector[Tok]) extends Tok

  /** Parse one content stream (ISO-8859-1 text) into shown text. */
  private[ops] def parseContent(s: String): String = {
    val out = new java.lang.StringBuilder()
    def newline(): Unit = {
      val n = out.length
      if (n > 0 && out.charAt(n - 1) != '\n') out.append('\n')
    }
    def emit(t: String): Unit = out.append(t)

    var stack = Vector.empty[Tok]
    var arr: Vector[Tok] = null // open TJ-style array, or null
    def push(t: Tok): Unit =
      if (arr != null) arr :+= t else stack :+= t

    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) i += 1
      else if (c == '(') {
        val (v, after) = literalString(s, i); push(Str(v)); i = after
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') {
        val end = s.indexOf(">>", i + 2)
        i = if (end < 0) n else end + 2
      } else if (c == '<') {
        val (v, after) = hexString(s, i); push(Str(v)); i = after
      } else if (c == '[') { arr = Vector.empty; i += 1 }
      else if (c == ']') {
        val a = if (arr == null) Vector.empty[Tok] else arr
        arr = null; stack :+= Arr(a); i += 1
      } else if (c == '/') {
        i += 1
        while (i < n && !isWs(s.charAt(i)) &&
          "()<>[]{}/%".indexOf(s.charAt(i)) < 0) i += 1
      } else if (c == '%') { // comment to end of line
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (isDigit(c) || c == '+' || c == '-' || c == '.') {
        val b = i
        i += 1
        while (i < n && (isDigit(s.charAt(i)) || s.charAt(i) == '.')) i += 1
        try push(Num(s.substring(b, i).toDouble))
        catch { case _: NumberFormatException => () }
      } else {
        // operator token: letters, '*', quotes
        val b = i
        while (i < n && !isWs(s.charAt(i)) &&
          "()<>[]{}/%".indexOf(s.charAt(i)) < 0 &&
          !isDigit(s.charAt(i)) && s.charAt(i) != '+' &&
          s.charAt(i) != '-' && s.charAt(i) != '.') i += 1
        val op = s.substring(b, math.max(i, b + 1))
        if (i == b) i += 1
        op match {
          case "Tj" =>
            stack.lastOption.foreach { case Str(v) => emit(v); case _ => () }
          case "'" | "\"" =>
            newline()
            stack.lastOption.foreach { case Str(v) => emit(v); case _ => () }
          case "TJ" =>
            stack.lastOption.foreach {
              case Arr(items) => items.foreach {
                case Str(v) => emit(v)
                case Num(k) => if (k < -150.0) emit(" ")
                case _ => ()
              }
              case _ => ()
            }
          case "Td" | "TD" =>
            // operands tx ty — newline iff ty != 0
            if (stack.length >= 2) (stack(stack.length - 1) match {
              case Num(ty) if ty != 0.0 => newline()
              case _ => ()
            })
          case "T*" => newline()
          case _ => () // Tm, Tf, graphics ops, …: ignored
        }
        stack = Vector.empty
      }
    }
    out.toString
  }

  /** Parse `/Length` (non-negative integer) from a dict string, or -1. */
  private[ops] def lengthOf(dict: String): Long = {
    val at = dict.indexOf("/Length")
    if (at < 0) return -1L
    var i = at + 7
    while (i < dict.length && isWs(dict.charAt(i))) i += 1
    val b = i
    while (i < dict.length && isDigit(dict.charAt(i))) i += 1
    if (i == b || i - b > 18) -1L else dict.substring(b, i).toLong
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val bos = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val k = inf.inflate(buf)
        if (k > 0) bos.write(buf, 0, k)
        else if (k == 0 && !inf.finished()) return None // stuck
      }
      if (inf.finished()) Some(bos.toByteArray) else None
    } catch {
      case _: Exception => None
    } finally inf.end()
  }

  /** Extract (nStreams parsed, text) from one PDF payload. Null-safe,
    * never throws; streams join with one newline.
    */
  def extractText(pdf: Array[Byte]): (Int, String) = {
    if (pdf == null) return (0, "")
    val doc = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val parts = Vector.newBuilder[String]
    var count = 0
    var i = 0
    var done = false
    while (!done) {
      val at = doc.indexOf("stream", i)
      if (at < 0) done = true
      else if (at >= 3 && doc.regionMatches(at - 3, "end", 0, 3)) {
        i = at + 6 // the 'stream' inside 'endstream' — not a stream start
      } else {
        var dataStart = -1
        if (doc.startsWith("stream\r\n", at)) dataStart = at + 8
        else if (doc.startsWith("stream\n", at)) dataStart = at + 7
        if (dataStart < 0) { i = at + 6 }
        else {
          val dictStart = doc.lastIndexOf("<<", at)
          val dict = if (dictStart < 0) "" else doc.substring(dictStart, at)
          val len = lengthOf(dict)
          if (len < 0 || dataStart + len > doc.length) i = at + 6
          else {
            val raw = java.util.Arrays.copyOfRange(pdf, dataStart,
              dataStart + len.toInt)
            val content: Option[String] =
              if (dict.contains("/FlateDecode"))
                inflate(raw).map(b => new String(b,
                  java.nio.charset.StandardCharsets.ISO_8859_1))
              else Some(new String(raw,
                java.nio.charset.StandardCharsets.ISO_8859_1))
            content.foreach { text =>
              val parsed = parseContent(text)
              if (parsed.nonEmpty) { parts += parsed; count += 1 }
            }
            i = dataStart + len.toInt
          }
        }
      }
    }
    (count, parts.result().mkString("\n"))
  }

  /** Format-dispatch extraction — the ingest stage a mixed crawl actually
    * runs: sniff the payload's magic bytes and route to the matching
    * extractor in ONE map pass. `%PDF-` → [[extractText]]; anything else
    * decodes through [[CharsetSniff]] and extracts as HTML
    * ([[graft.align.ExtractHtml]]). Output kind ∈ {pdf, html}.
    */
  def extractAny(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val magic = "%PDF-".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    payloads.select(col("doc_id"), col("payload"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val isPdf = b.length >= magic.length &&
          magic.indices.forall(j => b(j) == magic(j))
        if (isPdf) {
          val (_, text) = extractText(b)
          // code points, not UTF-16 units — mirror-parity for astral chars
          (id, "pdf", text.codePointCount(0, text.length), text)
        } else {
          val (_, _, decoded) = CharsetSniff.decode(b)
          val text = graft.align.ExtractHtml.extractText(decoded)
          (id, "html", text.codePointCount(0, text.length), text)
        }
      }.toDF("doc_id", "kind", "n_chars", "text")
  }

  /** Corpus form over (doc_id, pdf: binary):
    * (doc_id, n_streams, n_chars, text) — one map pass, null rows dropped.
    */
  def pdfText(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("pdf"))
      .filter(col("doc_id").isNotNull && col("pdf").isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val (k, text) = extractText(b)
        (id, k, text.codePointCount(0, text.length), text)
      }
      .toDF("doc_id", "n_streams", "n_chars", "text")
  }
}
