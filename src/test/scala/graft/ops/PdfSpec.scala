package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  // ---- string decoding ----

  test("literalString: escapes, octal, continuation, nesting") {
    def lit(s: String) = Pdf.literalString(s, 0)._1
    assert(lit("(plain)") === "plain")
    assert(lit("(a\\(b\\)c)") === "a(b)c")
    assert(lit("(tab\\there)") === "tab\there")
    assert(lit("(oct \\101\\102)") === "oct AB")
    assert(lit("(oct\\0601)") === "oct01") // 2-digit octal \060='0' then '1'
    assert(lit("(con\\\ntinued)") === "continued")
    assert(lit("(nested (inner) out)") === "nested (inner) out")
    assert(lit("(back\\\\slash)") === "back\\slash")
    assert(lit("(unknown \\z esc)") === "unknown z esc")
    assert(lit("(unterminated") === "unterminated") // reads to end
  }

  test("hexString: pairs, whitespace, odd padding") {
    def hex(s: String) = Pdf.hexString(s, 0)._1
    assert(hex("<48656C6C6F>") === "Hello")
    assert(hex("<48 65 6C\n6C 6F>") === "Hello")
    assert(hex("<484>") === "H@") // odd digit pads a trailing 0: 0x40='@'
    assert(hex("<>") === "")
  }

  // ---- content parsing ----

  test("parseContent: Tj/TJ/quotes/line ops, dict skip, comments") {
    assert(Pdf.parseContent("BT (a) Tj (b) Tj ET") === "ab")
    assert(Pdf.parseContent("[(x) -200 (y) -10 (z)] TJ") === "x yz")
    assert(Pdf.parseContent("(one) Tj 0 -14 Td (two) Tj") === "one\ntwo")
    assert(Pdf.parseContent("(one) Tj 5 0 Td (same) Tj") === "onesame")
    assert(Pdf.parseContent("(a) Tj T* (b) Tj T* T* (c) Tj") === "a\nb\nc")
    assert(Pdf.parseContent("(a) Tj (b) '") === "a\nb")
    assert(Pdf.parseContent("<< /F 1 >> (kept) Tj") === "kept")
    assert(Pdf.parseContent("% comment (not shown) Tj\n(real) Tj") === "real")
    // leading line op emits no leading newline
    assert(Pdf.parseContent("72 720 Td (first) Tj") === "first")
    assert(Pdf.parseContent("") === "")
  }

  // ---- whole-document extraction ----

  private val Text = "alpha beta gamma delta epsilon zeta"

  test("extractText: raw + FlateDecode streams, escapes, kerning, layout") {
    // even id: both streams raw; exercises TJ (id%3==0)
    val (k0, t0) = Pdf.extractText(graft.pipeline.PdfGen.pdfBytes(0, Text))
    assert(k0 === 2)
    assert(t0 === "alpha beta gamma delta epsilon (p) A ok\nker ned!\n" +
      "Hello!continued\nsecond alpha beta gamma\ntail")
    // odd id: second stream FlateDecode
    val (k1, t1) = Pdf.extractText(graft.pipeline.PdfGen.pdfBytes(1, Text))
    assert(k1 === 2)
    assert(t1 === "alpha beta gamma delta epsilon (p) A ok\nplain line\n" +
      "Hello!continued\nsecond alpha beta gamma\ntail")
  }

  test("extractText: damage never throws — valid subset survives") {
    val good = graft.pipeline.PdfGen.pdfBytes(2, Text)
    // truncation mid-second-stream: first stream still extracts
    val truncated = java.util.Arrays.copyOfRange(good, 0, good.length * 2 / 3)
    val (k, t) = Pdf.extractText(truncated)
    assert(k >= 1 && t.startsWith("alpha beta gamma"))
    // corrupt flate payload: that stream is skipped, the raw one survives
    val odd = graft.pipeline.PdfGen.pdfBytes(1, Text)
    val doc = new String(odd, java.nio.charset.StandardCharsets.ISO_8859_1)
    val flateStart = doc.indexOf("stream\n", doc.indexOf("FlateDecode")) + 7
    val corrupted = odd.clone()
    corrupted(flateStart) = 0x00.toByte
    corrupted(flateStart + 1) = 0x00.toByte
    val (kc, tc) = Pdf.extractText(corrupted)
    assert(kc === 1 && tc.startsWith("alpha beta gamma"))
    // garbage / null
    assert(Pdf.extractText("not a pdf".getBytes) === ((0, "")))
    assert(Pdf.extractText(null) === ((0, "")))
    // missing /Length skips the stream rather than guessing
    val noLen = "%PDF-1.4\n<< >>\nstream\n(x) Tj\nendstream\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Pdf.extractText(noLen) === ((0, "")))
  }

  test("lengthOf: digits after /Length, oversized rejected") {
    assert(Pdf.lengthOf("<< /Length 123 >>") === 123L)
    assert(Pdf.lengthOf("<< /Length 123 /Filter /FlateDecode >>") === 123L)
    assert(Pdf.lengthOf("<< /Len 5 >>") === -1L)
    assert(Pdf.lengthOf("<< /Length abc >>") === -1L)
    assert(Pdf.lengthOf("<< /Length 1234567890123456789012 >>") === -1L)
  }
}
