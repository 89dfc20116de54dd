package graft.ops

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  private def rec(uri: String, payload: Array[Byte],
      extraHeader: String = "", lenOverride: Option[Long] = None): Array[Byte] = {
    val len = lenOverride.getOrElse(payload.length.toLong)
    val h = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\n${extraHeader}Content-Length: $len\r\n\r\n"
    h.getBytes(US_ASCII) ++ payload ++ "\r\n\r\n".getBytes(US_ASCII)
  }

  test("two records parse with correct offsets and byte lengths") {
    val p1 = "hello".getBytes(UTF_8)
    val p2 = "worlds".getBytes(UTF_8)
    val blob = rec("https://a/1", p1) ++ rec("https://a/2", p2)
    val rs = Warc.parse(blob)
    assert(rs.map(_.uri) === Seq("https://a/1", "https://a/2"))
    assert(rs.head.offset === 0L)
    assert(rs(1).offset === rec("https://a/1", p1).length.toLong)
    assert(rs.map(_.contentLength) === Seq(5L, 6L))
    assert(new String(rs(1).payload, UTF_8) === "worlds")
  }

  test("Content-Length counts BYTES: multi-byte UTF-8 payload round-trips") {
    val p = "ﬁne café ligature ﬂow".getBytes(UTF_8)
    assert(p.length > "ﬁne café ligature ﬂow".length)
    val rs = Warc.parse(rec("https://a/u", p))
    assert(rs.length === 1)
    assert(rs.head.contentLength === p.length.toLong)
    assert(new String(rs.head.payload, UTF_8) === "ﬁne café ligature ﬂow")
  }

  test("header names match case-insensitively; unknown headers ignored") {
    val p = "x".getBytes(UTF_8)
    val h = "WARC/1.0\r\nwarc-TYPE: response\r\nWARC-TARGET-URI: u\r\n" +
      "X-Custom: whatever\r\nCONTENT-LENGTH: 1\r\n\r\n"
    val blob = h.getBytes(US_ASCII) ++ p ++ "\r\n\r\n".getBytes(US_ASCII)
    val rs = Warc.parse(blob)
    assert(rs.length === 1 && rs.head.recType === "response" && rs.head.uri === "u")
  }

  test("malformed structures drop the tail, never throw") {
    val good = rec("https://a/1", "ok".getBytes(UTF_8))
    // truncated payload
    val truncated = rec("https://a/2", "0123456789".getBytes(UTF_8),
      lenOverride = Some(999L))
    assert(Warc.parse(good ++ truncated).map(_.uri) === Seq("https://a/1"))
    // bad content-length value
    val badLen = ("WARC/1.0\r\nContent-Length: 12x\r\n\r\nabc\r\n\r\n").getBytes(US_ASCII)
    assert(Warc.parse(good ++ badLen).map(_.uri) === Seq("https://a/1"))
    // missing terminator after payload
    val noTerm = ("WARC/1.0\r\nContent-Length: 3\r\n\r\nabcXY").getBytes(US_ASCII)
    assert(Warc.parse(good ++ noTerm).map(_.uri) === Seq("https://a/1"))
    // garbage prefix yields nothing
    assert(Warc.parse("not a warc".getBytes(US_ASCII)) === IndexedSeq())
    assert(Warc.parse(null) === IndexedSeq())
    // oversized Content-Length values: 20 digits (> Long range) and
    // Long.MaxValue (would overflow `p + len + 4`) both drop the tail
    // exactly like the arbitrary-precision Python mirror — never throw
    val huge = ("WARC/1.0\r\nContent-Length: 18446744073709551616\r\n\r\nabc")
      .getBytes(US_ASCII)
    assert(Warc.parse(good ++ huge).map(_.uri) === Seq("https://a/1"))
    val maxLong = ("WARC/1.0\r\nContent-Length: 9223372036854775807\r\n\r\nabc")
      .getBytes(US_ASCII)
    assert(Warc.parse(good ++ maxLong).map(_.uri) === Seq("https://a/1"))
  }
}
