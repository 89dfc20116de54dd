package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-payload charset sniffing + decode — the step between a raw crawl
  * payload (WARC record bytes) and every text operator in the library: a
  * real crawl is NOT all UTF-8, and decoding with the wrong charset is
  * the mojibake the [[Mojibake]] op then has to repair. Map-only per row.
  *
  * PINNED spec (a WHATWG-encoding-sniff subset, mirrored clean-room in
  * tools/oracle/graftpy.py cs_*):
  *   - BOM first: EF BB BF → utf-8, FF FE → utf-16le, FE FF → utf-16be
  *     (BOM stripped before decode; BOM wins over any meta declaration);
  *   - else prescan the first min(1024, length) bytes, decoded as
  *     ISO-8859-1 (every byte maps to one char — the scan itself is
  *     charset-blind), for `<meta>` tags: a `charset` attribute, or
  *     `http-equiv="content-type"` with a `charset=` parameter inside
  *     `content` (value up to the next ';', surrounding quotes stripped);
  *     labels normalize by trim + ASCII-lower and map per the WHATWG
  *     label table subset: utf-8/utf8 → utf-8; iso-8859-1/latin1/
  *     windows-1252/cp1252/us-ascii → windows-1252 (the WHATWG mapping —
  *     iso-8859-1 content on the web IS windows-1252); utf-16/utf-16le/
  *     utf-16be → utf-8 (the WHATWG rule: a meta cannot declare utf-16);
  *     unrecognized labels are skipped and the scan continues;
  *   - nothing found → windows-1252 (the legacy web default).
  *
  * Decode divergence bound (documented): the five bytes 0x81 0x8D 0x8F
  * 0x90 0x9D are undefined in windows-1252 — the JVM maps them to C1
  * controls while CPython's cp1252 replaces them — so the cross-engine
  * contract covers payloads that avoid them (any ENCODED cp1252 output
  * does). Malformed UTF-8/16 sequences decode to U+FFFD on both engines
  * (JVM decoder default for String(bytes, charset); Python
  * errors='replace').
  */
object CharsetSniff {

  final val Utf8 = "utf-8"
  final val Utf16le = "utf-16le"
  final val Utf16be = "utf-16be"
  final val Win1252 = "windows-1252"

  /** WHATWG label-table subset (keys already trimmed + ASCII-lowered). */
  private val Labels: Map[String, String] = Map(
    "utf-8" -> Utf8, "utf8" -> Utf8,
    "iso-8859-1" -> Win1252, "latin1" -> Win1252, "windows-1252" -> Win1252,
    "cp1252" -> Win1252, "us-ascii" -> Win1252,
    "utf-16" -> Utf8, "utf-16le" -> Utf8, "utf-16be" -> Utf8)

  /** BOM-only sniff: Some((charset, bomLen)) when the payload opens with
    * a UTF-8/16 byte-order mark.
    */
  private def bomSniff(bytes: Array[Byte]): Option[(String, Int)] = {
    if (bytes == null) return None
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return Some((Utf8, 3))
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return Some((Utf16le, 2))
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return Some((Utf16be, 2))
    None
  }

  /** Resolve a charset label (e.g. an HTTP Content-Type parameter)
    * through the WHATWG label table; None for unknown/null labels.
    */
  private[ops] def resolveLabel(label: String): Option[String] =
    Option(label).map(l => LinkGraph.asciiLower(l.trim)).flatMap(Labels.get)

  /** (charset, bomLen) for one payload per the pinned spec. */
  def sniff(bytes: Array[Byte]): (String, Int) = {
    if (bytes == null) return (Win1252, 0)
    // plain match, not .foreach(return _): a non-local return from a
    // closure is an exception throw per BOM'd payload on the ingest hot
    // path (review r6)
    bomSniff(bytes) match {
      case Some(t) => return t
      case None    => ()
    }
    val n = math.min(1024, bytes.length)
    val prefix = new String(bytes, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    HtmlMeta.tagsOf(prefix, "meta").foreach { body =>
      val attrs = HtmlMeta.attrsOf(body)
      val label: Option[String] = attrs.get("charset").orElse {
        if (attrs.get("http-equiv").map(LinkGraph.asciiLower)
            .contains("content-type"))
          attrs.get("content").flatMap(charsetParam)
        else None
      }
      label.map(l => LinkGraph.asciiLower(l.trim)).flatMap(Labels.get)
        .foreach(cs => return (cs, 0))
    }
    (Win1252, 0)
  }

  /** `charset=` parameter of a content-type value (quote-stripped), or
    * None.
    */
  private[ops] def charsetParam(contentType: String): Option[String] = {
    val lc = LinkGraph.asciiLower(contentType)
    val at = lc.indexOf("charset=")
    if (at < 0) return None
    var v = contentType.substring(at + 8)
    val semi = v.indexOf(';')
    if (semi >= 0) v = v.substring(0, semi)
    v = v.trim
    if (v.length >= 2 && (v.charAt(0) == '"' || v.charAt(0) == '\'') &&
        v.charAt(v.length - 1) == v.charAt(0))
      v = v.substring(1, v.length - 1)
    if (v.isEmpty) None else Some(v)
  }

  private def decodeAs(
      bytes: Array[Byte], cs: String, bomLen: Int): (String, Boolean, String) = {
    val jcs = cs match {
      case Utf8    => java.nio.charset.StandardCharsets.UTF_8
      case Utf16le => java.nio.charset.StandardCharsets.UTF_16LE
      case Utf16be => java.nio.charset.StandardCharsets.UTF_16BE
      case _       => java.nio.charset.Charset.forName("windows-1252")
    }
    (cs, bomLen > 0,
      new String(bytes, bomLen, bytes.length - bomLen, jcs))
  }

  /** Sniff + decode one payload: (charset, hadBom, text). */
  def decode(bytes: Array[Byte]): (String, Boolean, String) = {
    val (cs, bomLen) = sniff(bytes)
    if (bytes == null) return (cs, false, "")
    decodeAs(bytes, cs, bomLen)
  }

  /** Sniff + decode with a transport-layer charset label (an HTTP
    * Content-Type parameter): precedence BOM > transport label > meta
    * prescan > default — the WHATWG order with the network layer in
    * place. A label that doesn't resolve in the table falls through to
    * the prescan.
    */
  def decodeWithTransport(
      bytes: Array[Byte], transportLabel: String): (String, Boolean, String) = {
    if (bytes == null) return (Win1252, false, "")
    bomSniff(bytes) match {
      case Some((cs, bomLen)) => decodeAs(bytes, cs, bomLen)
      case None =>
        resolveLabel(transportLabel) match {
          case Some(cs) => decodeAs(bytes, cs, 0)
          case None     => decode(bytes)
        }
    }
  }

  /** Corpus form over (doc_id, payload:binary): doc_id, charset, had_bom,
    * n_chars, prefix (first 48 chars) — one map pass, null rows dropped.
    */
  def sniffDecode(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val (cs, bom, text) = decode(b)
        val (n, prefix) = codePointStats(text, 48)
        (id, cs, bom, n, prefix)
      }
      .toDF("doc_id", "charset", "had_bom", "n_chars", "prefix")
  }

  /** (code-point count, first-k-code-points prefix) — CODE POINTS, not
    * UTF-16 units, so the stats match the Python mirror's len/slice even
    * for astral characters and a prefix cut can never split a surrogate
    * pair.
    */
  private[ops] def codePointStats(text: String, k: Int): (Int, String) = {
    val n = text.codePointCount(0, text.length)
    val end = text.offsetByCodePoints(0, math.min(k, n))
    (n, text.substring(0, end))
  }
}
