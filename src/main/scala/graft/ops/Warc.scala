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
  def parse(data: Array[Byte]): IndexedSeq[WarcRecord] =
    parseConsumed(data)._1

  /** Like [[parse]] but also returns how many bytes the accepted records
    * consumed (the start of the first unparseable/incomplete byte) — the
    * carry-over contract [[parseGzStream]] needs: records are emitted
    * greedily and a tail that fails here may simply be INCOMPLETE and
    * succeed once more bytes arrive, which is exactly how it re-parses.
    */
  private def parseConsumed(
      data: Array[Byte]): (IndexedSeq[WarcRecord], Int) = {
    if (data == null) return (IndexedSeq.empty, 0)
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
    (out.result(), pos)
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

  // ==== multi-member gzip (the Common Crawl `.warc.gz` convention:
  //      each WARC record is its own gzip member, concatenated) ====

  /** Split a multi-member gzip blob into its decompressed members.
    * Clean-room per RFC 1952: each member is a 10-byte header (magic
    * 1F 8B, CM=8/deflate, FLG) + optional FEXTRA/FNAME/FCOMMENT/FHCRC
    * fields + a raw deflate stream + an 8-byte trailer (CRC32 + ISIZE,
    * both LE). The trailer is VERIFIED — a CRC or size mismatch, a
    * truncated stream, or a non-member byte ends the scan with the valid
    * prefix (the parser totality contract; never throws). Both engines
    * wrap zlib for the deflate itself (graftpy mirrors via
    * zlib.decompressobj), so the split points — not the codec — are the
    * pinned surface.
    */
  def gzMembers(data: Array[Byte]): IndexedSeq[Array[Byte]] =
    gzMemberIterator(data).map(_._3).toIndexedSeq

  /** Like [[gzMembers]] but each member carries its COMPRESSED span
    * (offset, length) in the blob — what a `.warc.gz`-addressing index
    * (see [[cdxGz]]) must record, because seeking a gz member needs its
    * compressed, not decompressed, position. Materializes every member;
    * for blob-scale work consume [[gzMemberIterator]] instead.
    */
  def gzMemberSpans(data: Array[Byte]): IndexedSeq[(Long, Long, Array[Byte])] =
    gzMemberIterator(data).toIndexedSeq

  /** LAZY member scan — one decompressed member in memory at a time, so
    * consumers ([[recordsGz]], [[cdxGz]]) hold O(largest member), never
    * O(blob decompressed). Yields (compressedOffset, compressedLength,
    * memberBytes) with the same valid-prefix semantics as the eager
    * forms.
    */
  def gzMemberIterator(
      data: Array[Byte]): Iterator[(Long, Long, Array[Byte])] =
    new scala.collection.AbstractIterator[(Long, Long, Array[Byte])] {
      private var pos = 0
      private var nextItem: (Long, Long, Array[Byte]) = _
      private var done = data == null
      private def advance(): Unit = {
        nextItem = null
        if (!done) scanOne()
        if (nextItem == null) done = true
      }
      private def scanOne(): Unit = {
        if (pos + 10 > data.length || (data(pos) & 0xFF) != 0x1F ||
            (data(pos + 1) & 0xFF) != 0x8B || data(pos + 2) != 8) return
        val flg = data(pos + 3) & 0xFF
        var p = pos + 10
        var ok = true
        if ((flg & 4) != 0) { // FEXTRA: XLEN (LE) + bytes
          if (p + 2 > data.length) ok = false
          else {
            val xlen = (data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8)
            p += 2 + xlen
          }
        }
        def skipZeroTerminated(): Unit = { // FNAME / FCOMMENT
          while (ok && p < data.length && data(p) != 0) p += 1
          if (p >= data.length) ok = false else p += 1
        }
        if (ok && (flg & 8) != 0) skipZeroTerminated()
        if (ok && (flg & 16) != 0) skipZeroTerminated()
        if (ok && (flg & 2) != 0) p += 2 // FHCRC
        if (!ok || p > data.length) return
        val inf = new java.util.zip.Inflater(true) // raw deflate
        inf.setInput(data, p, data.length - p)
        // fixed-size growth: a member's decompressed size is unknown
        // up front and sizing from the remaining COMPRESSED blob would
        // be O(members x blob) transient allocation (review r6)
        val bos = new java.io.ByteArrayOutputStream(65536)
        val buf = new Array[Byte](65536)
        var err = false
        try {
          while (!inf.finished() && !err) {
            val n = inf.inflate(buf)
            if (n > 0) bos.write(buf, 0, n)
            else if (inf.needsInput() || inf.needsDictionary())
              err = true // truncated / preset-dictionary: damage
          }
        } catch {
          case _: java.util.zip.DataFormatException => err = true
        }
        val consumed = (data.length - p) - inf.getRemaining
        inf.end()
        if (err) return
        val trailerAt = p + consumed
        if (trailerAt + 8 > data.length) return
        val member = bos.toByteArray
        def le4(o: Int): Long =
          (data(o) & 0xFFL) | ((data(o + 1) & 0xFFL) << 8) |
            ((data(o + 2) & 0xFFL) << 16) | ((data(o + 3) & 0xFFL) << 24)
        val crc = new java.util.zip.CRC32()
        crc.update(member)
        if (le4(trailerAt) != crc.getValue ||
            le4(trailerAt + 4) != (member.length.toLong & 0xFFFFFFFFL))
          return // corrupt trailer: stop at the valid prefix
        nextItem = (pos.toLong, (trailerAt + 8 - pos).toLong, member)
        pos = trailerAt + 8
      }
      def hasNext: Boolean = {
        if (!done && nextItem == null) advance()
        !done
      }
      def next(): (Long, Long, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextItem
        nextItem = null
        r
      }
    }

  /** Decompress every valid-prefix member and concatenate — for a
    * per-record-gzipped WARC this reconstructs the PLAIN archive byte
    * stream, so record offsets downstream equal the uncompressed
    * convention's.
    */
  def gunzipMembers(data: Array[Byte]): Array[Byte] = {
    val ms = gzMembers(data)
    if (ms.isEmpty) Array.emptyByteArray
    else if (ms.length == 1) ms(0)
    else {
      // a single JVM array caps at 2^31-1 bytes: fail LOUDLY past it
      // (review r6 — an Int sum would overflow silently). Blob-scale
      // consumers use parseGzStream, which never reassembles.
      val total = ms.iterator.map(_.length.toLong).sum
      require(total <= Int.MaxValue - 16,
        s"gunzipMembers: $total decompressed bytes exceed one JVM " +
          "array - consume parseGzStream/gzMemberIterator instead")
      val bos = new java.io.ByteArrayOutputStream(total.toInt)
      ms.foreach(m => bos.write(m, 0, m.length))
      bos.toByteArray
    }
  }

  /** Streaming record parse of a multi-member gz blob: EXACTLY the
    * records of `parse(gunzipMembers(blob))` with the same plain-stream
    * offsets, but holding only (pending tail + one member) in memory —
    * records may span members. Per member the pending buffer re-parses
    * greedily ([[parseConsumed]]): complete records emit with offsets
    * rebased to the plain stream, the unconsumed tail carries over (it
    * may just be INCOMPLETE), and whatever remains at blob end is the
    * damaged tail both forms drop. Prefix-stability of the greedy parse
    * makes the equivalence exact (round-tripped in WarcSpec).
    */
  private[ops] def parseGzStream(blob: Array[Byte]): Iterator[WarcRecord] = {
    var pending = Array.emptyByteArray
    var plainBase = 0L
    gzMemberIterator(blob).flatMap { case (_, _, member) =>
      pending =
        if (pending.isEmpty) member
        else {
          val merged = new Array[Byte](pending.length + member.length)
          System.arraycopy(pending, 0, merged, 0, pending.length)
          System.arraycopy(member, 0, merged, pending.length, member.length)
          merged
        }
      val (recs, consumed) = parseConsumed(pending)
      val base = plainBase
      plainBase += consumed
      pending = java.util.Arrays.copyOfRange(
        pending, consumed, pending.length)
      recs.iterator.map(r => r.copy(offset = r.offset + base))
    }
  }

  // ==== WET generation (Common Crawl's extracted-text distribution
  //      format: conversion records carrying the plain text) ====

  /** Serialize WET conversion records (pinned subset of the WET spec,
    * mirrored in graftpy wet_bytes): per source record a header
    * `WARC/1.0 CRLF WARC-Type: conversion CRLF WARC-Target-URI: uri CRLF
    * WARC-Date: date CRLF Content-Type: text/plain CRLF Content-Length:
    * N CRLF CRLF` + the extracted text as UTF-8 (N counts those BYTES) +
    * `CRLF CRLF`. Deliberately no WARC-Record-ID/Refers-To uuids — they
    * would be nondeterministic; the (uri, date) pair carries the
    * linkage. The output is itself a valid archive for [[parse]]
    * (round-trip pinned in tests).
    */
  private[ops] def wetBytes(
      recs: Seq[(String, String, String)]): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach { case (uri, date, text) =>
      val body = text.getBytes(utf8)
      val header = s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: $uri\r\nWARC-Date: $date\r\n" +
        s"Content-Type: text/plain\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
      bos.write(header.getBytes(ascii))
      bos.write(body)
      bos.write("\r\n\r\n".getBytes(ascii))
    }
    bos.toByteArray
  }

  /** Archive table → WET summary rows (archive_id, n_records,
    * wet_length, wet_sha1): record split, HTML extraction, and WET
    * serialization in ONE map pass per archive — records never shuffle
    * and the emitted row is ~60 B regardless of archive size (the
    * digest + length pin the full serialized bytes cross-engine; a
    * production job would write the bytes to storage in the same pass).
    */
  def wet(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (aid, blob) =>
        val rs = parse(blob)
        val recs = rs.map(r => (r.uri, r.date,
          graft.align.ExtractHtml.extractText(r.payload)))
        val bytes = wetBytes(recs)
        (aid, rs.length, bytes.length.toLong, sha1B32(bytes))
      }.toDF("archive_id", "n_records", "wet_length", "wet_sha1")
  }

  // ==== WAT generation (Common Crawl's metadata sidecar — completes
  //      the WARC / WET / WAT format triple) ====

  /** JSON string escaping pinned to python json.dumps(ensure_ascii=False):
    * `"` and `\` escape, the five control shortcuts, \\u%04x for the other
    * C0 controls, everything else (incl. non-ASCII) raw — so the Scala
    * serializer and the mirror's json.dumps emit identical bytes.
    */
  private[ops] def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20) sb.append(f"\\u${c.toInt}%04x") else sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def jstr(s: String): String = "\"" + jsonEscape(s) + "\""

  /** One record's WAT JSON payload — a pinned subset of the real WAT
    * envelope (field order fixed; Title omitted when the page has none;
    * links carry raw un-resolved hrefs exactly as extracted). Mirrored
    * as `wat_json` via json.dumps over the same structure.
    */
  private[ops] def watJson(
      uri: String, date: String, contentLength: Long,
      title: Option[String], links: Seq[LinkGraph.RawLink]): String = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("{\"Envelope\":{\"WARC-Header-Metadata\":{")
      .append("\"WARC-Target-URI\":").append(jstr(uri))
      .append(",\"WARC-Date\":").append(jstr(date))
      .append(",\"Content-Length\":").append(contentLength)
      .append("},\"Payload-Metadata\":{\"HTML-Metadata\":{\"Head\":{")
    title.foreach(t => sb.append("\"Title\":").append(jstr(t)))
    sb.append("},\"Links\":[")
    var i = 0
    while (i < links.length) {
      if (i > 0) sb.append(',')
      sb.append("{\"url\":").append(jstr(links(i).href))
        .append(",\"text\":").append(jstr(links(i).anchor)).append('}')
      i += 1
    }
    sb.append("]}}}}")
    sb.toString
  }

  /** Serialize WAT metadata records (same pinned WARC framing as
    * [[wetBytes]], Content-Type application/json); the output is itself
    * a valid archive for [[parse]].
    */
  private[ops] def watBytes(recs: Seq[(String, String, String)]): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach { case (uri, date, json) =>
      val body = json.getBytes(utf8)
      val header = s"WARC/1.0\r\nWARC-Type: metadata\r\n" +
        s"WARC-Target-URI: $uri\r\nWARC-Date: $date\r\n" +
        s"Content-Type: application/json\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
      bos.write(header.getBytes(ascii))
      bos.write(body)
      bos.write("\r\n\r\n".getBytes(ascii))
    }
    bos.toByteArray
  }

  /** Archive table → WAT summary rows (archive_id, n_records, n_links,
    * wat_length, wat_sha1): record split, link extraction, head-metadata
    * parse, and WAT serialization in ONE map pass per archive — the same
    * never-shuffle-the-payload contract as [[wet]].
    */
  def wat(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .map { case (aid, blob) =>
        val rs = parse(blob)
        var nLinks = 0L
        val recs = rs.map { r =>
          val html = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
          val links = LinkGraph.extractLinks(html)
          nLinks += links.length
          val meta = HtmlMeta.parse(html, r.uri)
          (r.uri, r.date,
            watJson(r.uri, r.date, r.payload.length.toLong, meta.title, links))
        }
        val bytes = watBytes(recs)
        (aid, rs.length, nLinks, bytes.length.toLong, sha1B32(bytes))
      }.toDF("archive_id", "n_records", "n_links", "wat_length", "wat_sha1")
  }

  // ==== HTTP response payloads (the real Common Crawl record shape:
  //      a response record's payload is an HTTP message, not bare
  //      html — status line + headers + body) ====

  final case class HttpPayload(
      status: Int,
      mime: String, // "" when no Content-Type
      charset: String, // "" when no charset parameter
      body: Array[Byte])

  /** Parse an HTTP/1.x response payload (pinned subset, mirrored in
    * graftpy http_parse): status line `HTTP/x.y SP 3-digits …CRLF`,
    * headers to the first CRLF CRLF (names ASCII case-insensitive,
    * first Content-Type wins: mime = value before ';' lowercased
    * trimmed, charset = its `charset=` parameter), body = the rest.
    * Anything malformed → None (the caller treats the payload as a bare
    * body — total, never throws).
    */
  private[ops] def httpParse(payload: Array[Byte]): Option[HttpPayload] = {
    if (payload == null || payload.length < 12) return None
    // cheap ASCII prefix check before materializing the header string
    val P = "HTTP/"
    var i = 0
    while (i < 5) {
      if (payload(i) != P.charAt(i).toByte) return None
      i += 1
    }
    // locate CRLFCRLF (bounded scan — headers, not body)
    var sep = -1
    var p = 0
    val lim = payload.length - 3
    while (sep < 0 && p < lim) {
      if (payload(p) == '\r' && payload(p + 1) == '\n' &&
          payload(p + 2) == '\r' && payload(p + 3) == '\n') sep = p
      p += 1
    }
    if (sep < 0) return None
    val head = new String(payload, 0, sep,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n", -1)
    val status0 = lines(0)
    val sp1 = status0.indexOf(' ')
    if (sp1 < 0 || sp1 + 4 > status0.length) return None
    val code = status0.substring(sp1 + 1, sp1 + 4)
    if (!code.forall(c => c >= '0' && c <= '9')) return None
    if (sp1 + 4 < status0.length && status0.charAt(sp1 + 4) != ' ')
      return None // 4+-digit "status": malformed
    var mime = ""
    var charset = ""
    var li = 1
    var found = false
    while (li < lines.length && !found) {
      val line = lines(li)
      val colon = line.indexOf(':')
      if (colon > 0 &&
          LinkGraph.asciiLower(line.substring(0, colon).trim) ==
            "content-type") {
        val value = line.substring(colon + 1).trim
        val semi = value.indexOf(';')
        mime = LinkGraph.asciiLower(
          (if (semi < 0) value else value.substring(0, semi)).trim)
        charset = CharsetSniff.charsetParam(value).getOrElse("")
        found = true // first Content-Type wins
      }
      li += 1
    }
    Some(HttpPayload(code.toInt,
      mime, charset,
      java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)))
  }

  /** HTTP-payload archive table → one row per RESPONSE record (request /
    * revisit / metadata records are the split's job to skip — the real
    * ingest filter): status + mime from the HTTP head, body decoded with
    * the transport charset in WHATWG precedence (BOM > header charset >
    * meta prescan > default). A response whose payload isn't HTTP at all
    * decodes whole with null status/mime (the raw-payload fallback).
    * Map-only; null rows dropped.
    */
  /** One output row for a response record (shared by the plain and gz
    * forms so they cannot drift).
    */
  private def httpRow(aid: Long, r: WarcRecord)
      : (Long, Long, String, Option[Int], Option[String], String,
        Boolean, Int, String) =
    httpParse(r.payload) match {
      case Some(h) =>
        val (cs, bom, text) =
          CharsetSniff.decodeWithTransport(h.body, h.charset)
        val (n, prefix) = CharsetSniff.codePointStats(text, 48)
        (aid, r.offset, r.uri, Option(h.status), Option(h.mime),
          cs, bom, n, prefix)
      case None =>
        val (cs, bom, text) = CharsetSniff.decode(r.payload)
        val (n, prefix) = CharsetSniff.codePointStats(text, 48)
        (aid, r.offset, r.uri, Option.empty[Int],
          Option.empty[String], cs, bom, n, prefix)
    }

  def recordsHttp(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, blob) =>
        parse(blob).iterator
          .filter(_.recType == "response")
          .map(r => httpRow(aid, r))
      }.toDF("archive_id", "rec_offset", "uri", "status", "mime",
        "charset", "had_bom", "n_chars", "prefix")
  }

  // ==== CDX index generation (the crawl-index artifact: one row per
  //      record with a canonicalized url key, payload digest, and byte
  //      span — what makes a petabyte of archives random-accessible) ====

  private val B32Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** SHA-1 of the payload in base32 (RFC 4648) — the classic CDX digest
    * column; 20 bytes = exactly 32 base32 chars, no padding.
    */
  private[ops] def sha1B32(data: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(data)
    val sb = new java.lang.StringBuilder(32)
    var acc = 0L
    var bits = 0
    var i = 0
    while (i < d.length) {
      acc = (acc << 8) | (d(i) & 0xFFL)
      bits += 8
      while (bits >= 5) {
        sb.append(B32Alphabet.charAt(((acc >>> (bits - 5)) & 31L).toInt))
        bits -= 5
      }
      i += 1
    }
    sb.toString
  }

  /** SURT url key (pinned subset, mirrored in graftpy cdx_surt): scheme
    * stripped at the FIRST `://` (the hostOf convention), ONE leading
    * `www.` label dropped, host labels reversed and comma-joined, `)` +
    * the rest (path + query), the whole key ASCII-lowercased. Total: a
    * scheme-less input keys its whole text as the host part.
    */
  private[ops] def surt(uri: String): String = {
    if (uri == null) return ")"
    val sep = uri.indexOf("://")
    val noScheme = if (sep < 0) uri else uri.substring(sep + 3)
    val slash = noScheme.indexOf('/')
    val (host0, rest) =
      if (slash < 0) (noScheme, "") else noScheme.splitAt(slash)
    val host = LinkGraph.asciiLower(host0)
    val h = if (host.startsWith("www.")) host.substring(4) else host
    h.split('.').reverse.mkString(",") + ")" + LinkGraph.asciiLower(rest)
  }

  /** Archive table → CDX rows (archive_id, urlkey, uri, warc_date,
    * digest, rec_offset, rec_length). rec_length is the full record span
    * (header + payload + the CRLF CRLF separator) — adjacent offsets
    * difference, with the last record running to the archive end — so
    * `offset + length` seeks straight to the next record, the property
    * the real CDX exists for. Map-only per archive.
    */
  def cdx(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, blob) =>
        val rs = parse(blob)
        rs.iterator.zipWithIndex.map { case (r, i) =>
          val end =
            if (i + 1 < rs.length) rs(i + 1).offset else blob.length.toLong
          (aid, surt(r.uri), r.uri, r.date, sha1B32(r.payload),
            r.offset, end - r.offset)
        }
      }.toDF("archive_id", "urlkey", "uri", "warc_date", "digest",
        "rec_offset", "rec_length")
  }

  /** Digest-level CDX dedup — the write-time revisit dedup a crawler
    * does: per payload digest the earliest capture (min (archive_id,
    * rec_offset), lexicographic) is the ORIGINAL; every other row is a
    * revisit pointing at it. Two-pass relational shape, NO window sort:
    * a map-side-combining min(struct(...)) per digest (the repo's argmax
    * recipe — a hot digest never sorts in one task) + one hash join back
    * on digest. Output = input columns + (is_original, orig_archive_id,
    * orig_rec_offset).
    */
  def cdxDedup(cdxRows: DataFrame): DataFrame = {
    val keepers = cdxRows
      .groupBy(col("digest"))
      .agg(min(struct(col("archive_id"), col("rec_offset"))).as("__k"))
      .select(col("digest"),
        col("__k.archive_id").as("orig_archive_id"),
        col("__k.rec_offset").as("orig_rec_offset"))
    cdxRows.join(keepers, Seq("digest"))
      .withColumn("is_original",
        col("archive_id") === col("orig_archive_id") &&
          col("rec_offset") === col("orig_rec_offset"))
      .select(col("archive_id"), col("urlkey"), col("uri"),
        col("warc_date"), col("digest"), col("rec_offset"),
        col("rec_length"), col("is_original"),
        col("orig_archive_id"), col("orig_rec_offset"))
  }

  /** CDX over `.warc.gz` archives — the form the real crawl index takes:
    * `rec_offset`/`rec_length` are the member's COMPRESSED span in the
    * gz blob (what a reader must seek + inflate), while urlkey, uri,
    * date, and digest describe the record inside. One gz member per
    * record (the layout [[recordsGz]]'s fixture pins); a member that
    * holds several records emits one row per record sharing the member's
    * span. Map-only per archive.
    */
  def cdxGz(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, blob) =>
        gzMemberIterator(blob).flatMap { case (off, len, member) =>
          parse(member).iterator.map { r =>
            (aid, surt(r.uri), r.uri, r.date, sha1B32(r.payload), off, len)
          }
        }
      }.toDF("archive_id", "urlkey", "uri", "warc_date", "digest",
        "rec_offset", "rec_length")
  }

  /** `.warc.gz` archive table → the same rows as [[records]]: the
    * STREAMING member parse ([[parseGzStream]] — O(largest member)
    * memory, records may span members, never a 2 GiB reassembly array).
    * Map-only per archive; the member scan is sequential WITHIN one blob
    * (gzip members only reveal their end by decompression) but archives
    * parallelize — the Common Crawl layout is many ~1 GB warc.gz files,
    * one task each, which is exactly this op's input shape. Offsets are
    * positions in the logical plain stream, identical to the
    * uncompressed convention (pinned by q_warc_gz sharing
    * q_warc_records' row values).
    */
  def recordsGz(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, blob) =>
        parseGzStream(blob).map { r =>
          (aid, r.offset, r.recType, r.uri, r.date, r.contentLength,
            graft.align.ExtractHtml.extractText(r.payload))
        }
      }.toDF("archive_id", "rec_offset", "rec_type", "uri", "warc_date",
        "content_length", "extracted")
  }

  /** `.warc.gz` archives with HTTP payloads → [[recordsHttp]] rows: the
    * full gz ingest composition (member split → record parse → response
    * filter → HTTP head parse → transport-charset decode).
    */
  def recordsHttpGz(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("archive_id"), col("data"))
      .filter(col("archive_id").isNotNull && col("data").isNotNull)
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, blob) =>
        parseGzStream(blob)
          .filter(_.recType == "response")
          .map(r => httpRow(aid, r))
      }.toDF("archive_id", "rec_offset", "uri", "status", "mime",
        "charset", "had_bom", "n_chars", "prefix")
  }
}
