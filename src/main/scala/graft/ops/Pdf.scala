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
  *     `endstream`); dict containing `/FlateDecode` → zlib-inflate (both
  *     engines wrap zlib), else `/LZWDecode` → PDF LZW (MSB-first bit
  *     packing, 9→12-bit codes, 256 = clear-table, 257 = EOD,
  *     EarlyChange=1 — the PDF default; at a full 12-bit table the
  *     decoder stops growing until a clear); decode failure or
  *     missing/malformed `/Length` skips the stream;
  *   - object structure (VERDICT r5 missing #2): `N 0 obj` headers are
  *     scanned document-wide and each stream belongs to the nearest
  *     preceding header; every `/Fname M 0 R` inside a `/Font <<…>>`
  *     dict binds font name → object M (last binding wins, no nested
  *     dicts in the subset); a font object whose body carries
  *     `/ToUnicode T 0 R` maps its shown strings through the CMap in
  *     object T's stream; streams referenced by any /ToUnicode are CMap
  *     streams — parsed for mappings, EXCLUDED from the text output and
  *     the stream count;
  *   - CMap parse: `beginbfchar…endbfchar` pairs `<src> <dst>` and
  *     `beginbfrange…endbfrange` triples `<lo> <hi> <dst>` (the dst's
  *     LAST UTF-16 code unit increments across the range) or
  *     `<lo> <hi> [<d0> <d1> …]` (explicit list); the code width in
  *     bytes = half the FIRST src token's hex-digit count, clamped to
  *     1..2; dst hex decodes as UTF-16BE code units; ranges over 65535
  *     codes are skipped (damage guard); parse is tolerant, never
  *     throws;
  *   - content streams parse with an operand-stack scan: literal strings
  *     `(...)` (nesting, escapes `\n \r \t \b \f \( \) \\`, 1–3-digit
  *     octal, backslash-newline continuation, other escaped chars kept),
  *     hex strings `<...>` (whitespace allowed, odd length padded with
  *     0), numbers, names (pushed as operands), arrays; `<<` inside
  *     content skips to `>>`;
  *   - font state: `/Fname size Tf` switches the current font; the state
  *     resets at each stream boundary (subset pin);
  *   - string decode at emission: bytes beginning 0xFE 0xFF decode as
  *     UTF-16BE (a dangling trailing byte drops; surrogate pairs pass
  *     through) BEFORE any CMap — a BOM'd string is already text;
  *     otherwise, when the current font has a CMap, the bytes split into
  *     1- or 2-byte codes (per the CMap width; a dangling byte drops)
  *     and map through it — unmapped codes emit their UTF-16 code unit
  *     (identity fallback); otherwise bytes stay ISO-8859-1
  *     byte-transparent (the PDFDocEncoding subset);
  *   - text emission: `Tj` and `'`/`"` emit the decoded string operand
  *     (the quotes first emit a newline — they are next-line-show
  *     operators); `TJ` emits its array's strings with a SPACE for any
  *     kerning number < −150 (the standard word-gap heuristic);
  *     `Td`/`TD` with a nonzero ty operand and `T*` emit a newline; `Tm`
  *     and all unknown operators are ignored; newlines never duplicate
  *     and never lead; streams join with one newline.
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

  // ==== LZWDecode (PDF spec 7.4.4; EarlyChange=1 default) ====

  /** PDF LZW inflate: MSB-first codes, width 9→12 (decoder bumps when the
    * next assignable code reaches 2^width − 1 — the EarlyChange=1
    * convention), 256 clears the table, 257 ends. Damage → None.
    */
  private[ops] def lzwDecode(data: Array[Byte]): Option[Array[Byte]] = {
    if (data == null) return None
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def reset(): Unit = {
      table.clear()
      var i = 0
      while (i < 256) { table += Array(i.toByte); i += 1 }
      table += null // 256 clear
      table += null // 257 EOD
    }
    reset()
    var width = 9
    var prev: Array[Byte] = null
    var acc = 0L
    var bits = 0
    var idx = 0
    var done = false
    while (!done) {
      while (bits < width && idx < data.length) {
        acc = (acc << 8) | (data(idx) & 0xFFL)
        bits += 8
        idx += 1
      }
      if (bits < width) done = true // ran out without EOD: accept prefix
      else {
        val code = ((acc >>> (bits - width)) & ((1L << width) - 1)).toInt
        bits -= width
        if (code == 256) { reset(); width = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < table.length) table(code)
            else if (code == table.length && prev != null)
              prev :+ prev(0)
            else return None // impossible code: corrupt stream
          if (entry == null) return None
          out.write(entry, 0, entry.length)
          // 12-bit code space holds indices 0..4095 — the table may grow
          // to 4096 entries (code 4095 is legal), after which it freezes
          // until the next clear
          if (prev != null && table.length < 4096)
            table += (prev :+ entry(0))
          prev = entry
          if (table.length == (1 << width) - 1 && width < 12) width += 1
        }
      }
    }
    Some(out.toByteArray)
  }

  /** Matching LZW encoder (fixture synthesis + round-trip tests): emits a
    * clear up front and again whenever the table nears the 12-bit edge
    * (next == 3000 — valid per spec, keeps the decoder away from the
    * full-table corner). Width bumps when the next assignable code
    * reaches 2^width — one add LATER than the decoder, because the
    * decoder's table runs one entry behind the encoder's at equal code
    * positions (the EarlyChange pairing).
    */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length))
    var acc = 0L
    var bits = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code.toLong
      bits += width
      while (bits >= 8) {
        out.write(((acc >>> (bits - 8)) & 0xFF).toInt)
        bits -= 8
      }
    }
    val dict = new java.util.HashMap[java.util.List[java.lang.Byte], Integer]()
    def keyOf(bytes: Array[Byte]): java.util.List[java.lang.Byte] = {
      val l = new java.util.ArrayList[java.lang.Byte](bytes.length)
      bytes.foreach(b => l.add(java.lang.Byte.valueOf(b)))
      l
    }
    var next = 258
    def resetDict(): Unit = {
      dict.clear()
      var i = 0
      while (i < 256) { dict.put(keyOf(Array(i.toByte)), i); i += 1 }
      next = 258
      width = 9
    }
    emit(256)
    resetDict()
    var cur = Array.empty[Byte]
    var i = 0
    while (i < data.length) {
      val w = cur :+ data(i)
      if (dict.containsKey(keyOf(w))) cur = w
      else {
        emit(dict.get(keyOf(cur)).intValue())
        dict.put(keyOf(w), next)
        next += 1
        if (next == (1 << width) && width < 12) width += 1
        if (next == 3000) { emit(256); resetDict() }
        cur = Array(data(i))
      }
      i += 1
    }
    if (cur.nonEmpty) emit(dict.get(keyOf(cur)).intValue())
    emit(257)
    if (bits > 0) out.write(((acc << (8 - bits)) & 0xFF).toInt) // pad
    out.toByteArray
  }

  // ==== shown-string decode (BOM'd UTF-16BE, CMap, byte-transparent) ====

  /** A /ToUnicode CMap: code width in BYTES (1 or 2) and code → UTF-16
    * string.
    */
  final case class CMap(codeBytes: Int, map: Map[Int, String])

  /** UTF-16BE decode of raw byte-chars from `from`: big-endian pairs to
    * code units (surrogates pass through); a dangling byte drops.
    */
  private def utf16be(raw: String, from: Int): String = {
    val sb = new java.lang.StringBuilder((raw.length - from) / 2)
    var i = from
    while (i + 1 < raw.length) {
      sb.append((((raw.charAt(i) & 0xFF) << 8) | (raw.charAt(i + 1) & 0xFF)).toChar)
      i += 2
    }
    sb.toString
  }

  /** Decode one shown string per the pinned cascade (BOM → CMap →
    * byte-transparent). `cmap` may be null.
    */
  private[ops] def decodeShownString(raw: String, cmap: CMap): String = {
    if (raw.length >= 2 && raw.charAt(0) == 0xFE.toChar &&
        raw.charAt(1) == 0xFF.toChar)
      return utf16be(raw, 2)
    if (cmap == null) return raw
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    if (cmap.codeBytes == 1) {
      while (i < raw.length) {
        val code = raw.charAt(i) & 0xFF
        cmap.map.get(code) match {
          case Some(s) => sb.append(s)
          case None => sb.append(code.toChar)
        }
        i += 1
      }
    } else {
      while (i + 1 < raw.length) { // dangling byte drops
        val code = ((raw.charAt(i) & 0xFF) << 8) | (raw.charAt(i + 1) & 0xFF)
        cmap.map.get(code) match {
          case Some(s) => sb.append(s)
          case None => sb.append(code.toChar)
        }
        i += 2
      }
    }
    sb.toString
  }

  /** Tolerant CMap scan: bfchar pairs + bfrange triples (scalar dst
    * increments its last code unit; array dst lists explicitly). Never
    * throws; malformed sections contribute nothing.
    */
  private[ops] def parseCMap(s: String): CMap = {
    val map = Map.newBuilder[Int, String]
    var codeBytes = 0
    // hex tokens scanned lazily from a cursor
    def hexAt(from: Int, limit: Int): (String, Int) = {
      var i = from
      while (i < limit && s.charAt(i) != '<') i += 1
      if (i >= limit) return (null, limit)
      val e = s.indexOf('>', i + 1)
      if (e < 0 || e > limit) return (null, limit)
      (s.substring(i + 1, e).filterNot(isWs), e + 1)
    }
    def hexToInt(h: String): Int =
      try java.lang.Integer.parseInt(h, 16) catch { case _: Exception => -1 }
    def hexToUtf16(h: String): String = {
      val sb = new java.lang.StringBuilder(h.length / 4 + 1)
      var i = 0
      while (i + 3 < h.length) {
        val v = hexToInt(h.substring(i, i + 4))
        if (v >= 0) sb.append(v.toChar)
        i += 4
      }
      // a dangling byte pair (2 hex digits) maps as one code unit
      if (i + 1 < h.length) {
        val v = hexToInt(h.substring(i, i + 2))
        if (v >= 0) sb.append(v.toChar)
      }
      sb.toString
    }
    def noteWidth(src: String): Unit =
      if (codeBytes == 0 && src != null && src.nonEmpty)
        codeBytes = math.max(1, math.min(2, src.length / 2))
    // bfchar sections
    var at = s.indexOf("beginbfchar")
    while (at >= 0) {
      val end0 = s.indexOf("endbfchar", at)
      val end = if (end0 < 0) s.length else end0
      var cur = at + "beginbfchar".length
      var more = true
      while (more) {
        val (src, a1) = hexAt(cur, end)
        val (dst, a2) = hexAt(a1, end)
        if (src == null || dst == null) more = false
        else {
          noteWidth(src)
          val c = hexToInt(src)
          if (c >= 0) map += (c -> hexToUtf16(dst))
          cur = a2
        }
      }
      at = s.indexOf("beginbfchar", end)
    }
    // bfrange sections
    at = s.indexOf("beginbfrange")
    while (at >= 0) {
      val end0 = s.indexOf("endbfrange", at)
      val end = if (end0 < 0) s.length else end0
      var cur = at + "beginbfrange".length
      var more = true
      while (more) {
        val (lo, a1) = hexAt(cur, end)
        val (hi, a2) = hexAt(a1, end)
        if (lo == null || hi == null) more = false
        else {
          noteWidth(lo)
          val loV = hexToInt(lo)
          val hiV = hexToInt(hi)
          // dst: either an array of hex tokens or one scalar hex token —
          // whichever comes first, '[' or '<'
          var j = a2
          while (j < end && isWs(s.charAt(j))) j += 1
          if (j < end && s.charAt(j) == '[') {
            val close0 = s.indexOf(']', j)
            val close = if (close0 < 0 || close0 > end) end else close0
            if (loV >= 0 && hiV >= loV && hiV - loV <= 65535) {
              var c = loV
              var k = j + 1
              while (c <= hiV && k < close) {
                val (d, k2) = hexAt(k, close)
                if (d == null) { c = hiV + 1 }
                else { map += (c -> hexToUtf16(d)); c += 1; k = k2 }
              }
            }
            cur = close + 1
          } else {
            val (dst, a3) = hexAt(a2, end)
            if (dst == null) more = false
            else {
              if (loV >= 0 && hiV >= loV && hiV - loV <= 65535) {
                val base = hexToUtf16(dst)
                var c = loV
                while (c <= hiV) {
                  val d =
                    if (base.isEmpty) ""
                    else base.substring(0, base.length - 1) +
                      ((base.charAt(base.length - 1) + (c - loV)).toChar)
                  map += (c -> d)
                  c += 1
                }
              }
              cur = a3
            }
          }
        }
      }
      at = s.indexOf("beginbfrange", end)
    }
    CMap(if (codeBytes == 0) 1 else codeBytes, map.result())
  }

  private sealed trait Tok
  private final case class Str(v: String) extends Tok
  private final case class Num(v: Double) extends Tok
  private final case class Name(v: String) extends Tok
  private final case class Arr(items: Vector[Tok]) extends Tok

  /** Parse one content stream (ISO-8859-1 text) into shown text.
    * `fonts` maps font resource names (as used by `Tf`) to their
    * /ToUnicode CMaps; names absent from the map are byte-transparent.
    * Font state resets at the stream boundary (subset pin).
    */
  private[ops] def parseContent(s: String, fonts: Map[String, CMap]): String = {
    val out = new java.lang.StringBuilder()
    def newline(): Unit = {
      val n = out.length
      if (n > 0 && out.charAt(n - 1) != '\n') out.append('\n')
    }
    var curCmap: CMap = null
    def emit(t: String): Unit = out.append(decodeShownString(t, curCmap))

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
        val b = i + 1
        i += 1
        while (i < n && !isWs(s.charAt(i)) &&
          "()<>[]{}/%".indexOf(s.charAt(i)) < 0) i += 1
        push(Name(s.substring(b, i)))
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
                case Num(k) => if (k < -150.0) out.append(" ")
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
          case "Tf" =>
            // operands: /FontName size — the name is second-from-top
            if (stack.length >= 2) (stack(stack.length - 2) match {
              case Name(f) => curCmap = fonts.getOrElse(f, null)
              case _ => ()
            })
          case _ => () // Tm, graphics ops, …: ignored
        }
        stack = Vector.empty
      }
    }
    out.toString
  }

  /** CMap-less form (unit tests / plain content). */
  private[ops] def parseContent(s: String): String =
    parseContent(s, Map.empty)

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

  private val ObjHeaderRe =
    java.util.regex.Pattern.compile("(\\d{1,9})\\s+0\\s+obj")
  private val FontEntryRe = java.util.regex.Pattern.compile(
    "/([^\\s/<>\\[\\]()]+)\\s+(\\d{1,9})\\s+0\\s+R")
  private val ToUnicodeRe = java.util.regex.Pattern.compile(
    "/ToUnicode\\s+(\\d{1,9})\\s+0\\s+R")

  /** Extract (nStreams parsed, text) from one PDF payload. Null-safe,
    * never throws; content streams join with one newline; CMap streams
    * (referenced by a /ToUnicode) feed the font map and are excluded
    * from both the text and the count.
    */
  def extractText(pdf: Array[Byte]): (Int, String) = {
    if (pdf == null) return (0, "")
    val doc = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)

    // pass 0: locate stream spans (/Length-bounded; no decode yet). The
    // structural scans below must SKIP these spans — compressed payload
    // bytes can contain "7 0 obj" / "/Font" / "endobj" lookalikes.
    final case class Span(at: Int, dataStart: Int, len: Int, dict: String)
    val spanB = Vector.newBuilder[Span]
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
            spanB += Span(at, dataStart, len.toInt, dict)
            i = dataStart + len.toInt
          }
        }
      }
    }
    val spans = spanB.result()
    def inStreamData(pos: Int): Boolean = {
      // binary search over the sorted, non-overlapping spans
      var lo = 0; var hi = spans.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val s = spans(mid)
        if (pos < s.dataStart) hi = mid - 1
        else if (pos >= s.dataStart + s.len) lo = mid + 1
        else return true
      }
      false
    }

    // object headers (ascending positions, payload spans skipped)
    val headerPos = Array.newBuilder[Int]
    val headerObj = Array.newBuilder[Int]
    val hm = ObjHeaderRe.matcher(doc)
    while (hm.find()) {
      if (!inStreamData(hm.start())) {
        headerPos += hm.start()
        headerObj += hm.group(1).toInt
      }
    }
    val hPos = headerPos.result()
    val hObj = headerObj.result()
    def owningObj(pos: Int): Int = {
      // nearest header at or before pos (binary search)
      var lo = 0; var hi = hPos.length - 1; var best = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (hPos(mid) <= pos) { best = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (best < 0) -1 else hObj(best)
    }
    def objBody(objNum: Int): String = {
      val idx = hObj.indexOf(objNum)
      if (idx < 0) return ""
      val start = hPos(idx)
      var endObj = doc.indexOf("endobj", start)
      while (endObj >= 0 && inStreamData(endObj))
        endObj = doc.indexOf("endobj", endObj + 6)
      val nextHdr = if (idx + 1 < hPos.length) hPos(idx + 1) else doc.length
      val end = if (endObj >= 0 && endObj < nextHdr) endObj else nextHdr
      doc.substring(start, end)
    }

    // font resources: every /Name N 0 R inside a /Font <<…>> dict
    val fontObjOf = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var fAt = doc.indexOf("/Font")
    while (fAt >= 0) {
      // anchor: the token must be exactly "/Font" (not /FontDescriptor or
      // /FontFile2 — the next char must be a PDF delimiter/whitespace) and
      // its value dict must IMMEDIATELY follow (only whitespace between) —
      // a bare indexOf("<<") would jump to an unrelated later dict and
      // harvest bogus name→obj bindings (e.g. /Parent 2 0 R) that clobber
      // real font bindings under last-binding-wins
      // ASCII-pinned alnum (NOT Character.isLetterOrDigit — diverges from
      // the Python mirror on Latin-1 superscripts); whitespace = isWs,
      // the file's PDF-spec-7.2.2 set
      def asciiAlnum(c: Char): Boolean =
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9')
      val after = fAt + 5
      val tokenEnds = after >= doc.length || !asciiAlnum(doc.charAt(after))
      if (tokenEnds && !inStreamData(fAt)) {
        var j = after
        while (j < doc.length && isWs(doc.charAt(j))) j += 1
        if (j + 1 < doc.length && doc.charAt(j) == '<' &&
            doc.charAt(j + 1) == '<') {
          val open = j
          val close = doc.indexOf(">>", open + 2)
          if (close >= 0) {
            val fm = FontEntryRe.matcher(doc.substring(open + 2, close))
            while (fm.find()) fontObjOf(fm.group(1)) = fm.group(2).toInt
          }
        }
      }
      fAt = doc.indexOf("/Font", fAt + 5)
    }
    // font object -> its /ToUnicode target object
    val toUniOf = fontObjOf.valuesIterator.toSet[Int].flatMap { fo =>
      val tm = ToUnicodeRe.matcher(objBody(fo))
      if (tm.find()) Some(fo -> tm.group(1).toInt) else None
    }.toMap
    val cmapObjs: Set[Int] = toUniOf.values.toSet

    // pass 1: filter-decode every located stream, tagged with its object
    val streams = Vector.newBuilder[(Int, String)]
    spans.foreach { sp =>
      val raw = java.util.Arrays.copyOfRange(pdf, sp.dataStart,
        sp.dataStart + sp.len)
      val decoded: Option[Array[Byte]] =
        if (sp.dict.contains("/FlateDecode")) inflate(raw)
        else if (sp.dict.contains("/LZWDecode")) lzwDecode(raw)
        else Some(raw)
      decoded.foreach { b =>
        streams += ((owningObj(sp.at), new String(b,
          java.nio.charset.StandardCharsets.ISO_8859_1)))
      }
    }
    val allStreams = streams.result()

    // pass 2: CMap streams -> font-name map
    val cmapByObj: Map[Int, CMap] = allStreams.iterator
      .filter { case (o, _) => cmapObjs.contains(o) }
      .map { case (o, s) => o -> parseCMap(s) }.toMap
    val fonts: Map[String, CMap] = fontObjOf.iterator.flatMap {
      case (name, fo) =>
        toUniOf.get(fo).flatMap(cmapByObj.get).map(name -> _)
    }.toMap

    // pass 3: content streams, in document order
    val parts = Vector.newBuilder[String]
    var count = 0
    allStreams.foreach { case (o, text) =>
      if (!cmapObjs.contains(o)) {
        val parsed = parseContent(text, fonts)
        if (parsed.nonEmpty) { parts += parsed; count += 1 }
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
