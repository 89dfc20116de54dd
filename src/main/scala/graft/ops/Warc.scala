package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC-style archive record parsing — the step BEFORE everything else in
  * a Common-Crawl pipeline: a crawl ships as large archive blobs, each a
  * concatenation of records ("WARC/1.0\r\n" + headers + blank line +
  * Content-Length payload bytes + "\r\n\r\n"), and the engine's first job
  * is splitting blobs into per-page rows WITHOUT materializing an archive
  * as text. Map-only over the archive table; payload lengths are BYTE
  * counts (multi-byte UTF-8 pages bind the byte-vs-char distinction).
  *
  * PINNED parse spec (mirrored clean-room in graftpy.py warc_parse):
  * scan for the ASCII magic "WARC/1.0\r\n"; read ASCII header lines
  * ("Name: value\r\n") until the blank "\r\n"; `Content-Length` (ASCII
  * digits) gives the payload byte count; the payload is followed by
  * "\r\n\r\n". Any malformed structure (missing magic, unterminated
  * headers, bad/absent length, truncated payload) DROPS THE TAIL — a
  * damaged archive yields its valid prefix, never an exception. Header
  * names match case-insensitively (ASCII); unknown headers are ignored.
  */
object Warc {

  final case class WarcRecord(
      offset: Long,
      recType: String,
      uri: String,
      date: String,
      contentLength: Long,
      payload: Array[Byte])

  private val Magic = "WARC/1.0\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  @inline private def asciiLower(c: Byte): Byte =
    if (c >= 'A' && c <= 'Z') (c + 32).toByte else c

  private def matchesAt(data: Array[Byte], pos: Int, pat: Array[Byte]): Boolean = {
    if (pos + pat.length > data.length) return false
    var i = 0
    while (i < pat.length) {
      if (data(pos + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** Parse one archive blob. Returns the records of the valid prefix. */
  def parse(data: Array[Byte]): IndexedSeq[WarcRecord] = {
    if (data == null) return IndexedSeq.empty
    val out = IndexedSeq.newBuilder[WarcRecord]
    var pos = 0
    var done = false
    while (!done) {
      if (!matchesAt(data, pos, Magic)) { done = true }
      else {
        val recStart = pos
        var p = pos + Magic.length
        var recType: String = null
        var uri: String = null
        var date: String = null
        var contentLength = -1L
        var headersOk = false
        var badHeader = false
        // header lines until the blank "\r\n"
        while (!headersOk && !badHeader) {
          if (p + 1 < data.length && data(p) == '\r' && data(p + 1) == '\n') {
            headersOk = true
            p += 2
          } else {
            // find end of line
            var e = p
            while (e + 1 < data.length && !(data(e) == '\r' && data(e + 1) == '\n')) e += 1
            if (e + 1 >= data.length) badHeader = true
            else {
              val line = new String(data, p, e - p,
                java.nio.charset.StandardCharsets.US_ASCII)
              val ci = line.indexOf(':')
              if (ci > 0) {
                val name = line.substring(0, ci).map(c =>
                  if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
                val value = {
                  var b = ci + 1
                  while (b < line.length && line.charAt(b) == ' ') b += 1
                  line.substring(b)
                }
                name match {
                  case "warc-type"       => recType = value
                  case "warc-target-uri" => uri = value
                  case "warc-date"       => date = value
                  case "content-length" =>
                    // digits-only; >18 digits cannot fit the remaining
                    // archive anyway — saturate instead of letting toLong
                    // throw (the never-throw valid-prefix contract; the
                    // arbitrary-precision Python mirror reaches the same
                    // drop-the-tail outcome through the length guard)
                    contentLength =
                      if (value.isEmpty || !value.forall(c => c >= '0' && c <= '9'))
                        -1L
                      else if (value.length > 18) Long.MaxValue
                      else value.toLong
                  case _ => ()
                }
              } // header lines without ':' are ignored (not fatal)
              p = e + 2
            }
          }
        }
        // subtraction form: `p + contentLength + 4` would overflow Long
        // for a saturated length and slip past the bound
        if (badHeader || contentLength < 0 ||
            contentLength > data.length.toLong - p - 4) { done = true }
        else {
          val payload = java.util.Arrays.copyOfRange(data, p, p + contentLength.toInt)
          val after = p + contentLength.toInt
          if (data(after) == '\r' && data(after + 1) == '\n' &&
              data(after + 2) == '\r' && data(after + 3) == '\n') {
            out += WarcRecord(recStart.toLong,
              if (recType == null) "" else recType,
              if (uri == null) "" else uri,
              if (date == null) "" else date,
              contentLength, payload)
            pos = after + 4
          } else done = true
        }
      }
    }
    out.result()
  }

  /** Archive table (archive_id, data: binary) → per-record rows with the
    * payload run through the HTML char-stream extraction (the composed
    * extraction-tier pipeline: archive → record → page text). Map-only;
    * null rows dropped (repo null-row convention).
    */
  def records(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, blob) =>
        parse(blob).iterator.map { r =>
          (aid, r.offset, r.recType, r.uri, r.date, r.contentLength,
            graft.align.ExtractHtml.extractText(r.payload))
        }
      }.toDF("archive_id", "rec_offset", "rec_type", "uri", "warc_date",
        "content_length", "extracted")
  }

  /** Archive table → per-record rows with the payload run through the
    * charset sniff + decode instead of assuming UTF-8 — the full ingest
    * head (archive bytes → record split → typed text) for a crawl whose
    * payloads carry mixed encodings. Content-Length is a BYTE count, so
    * utf-16 payloads (NUL-dense, 2 bytes/char) bind the binary-safe split
    * hard. Map-only; null rows dropped.
    */
  def recordsDecoded(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, blob) =>
        parse(blob).iterator.map { r =>
          val (cs, bom, text) = CharsetSniff.decode(r.payload)
          val (n, prefix) = CharsetSniff.codePointStats(text, 48)
          (aid, r.offset, r.uri, r.contentLength, cs, bom, n, prefix)
        }
      }.toDF("archive_id", "rec_offset", "uri", "content_length",
        "charset", "had_bom", "n_chars", "prefix")
  }
}
