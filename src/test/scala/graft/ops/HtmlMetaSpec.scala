package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class HtmlMetaSpec extends AnyFunSuite {

  private val Base = "https://ex.org/dir/page.html"

  // ---- attribute scanner ----

  test("attrsOf: quote styles, unquoted, valueless, first-wins, self-close") {
    val a = HtmlMeta.attrsOf(
      "meta NAME=\"description\" content='a b' async data-x=1 x=\"dup\" x='2' /")
    assert(a === Map("name" -> "description", "content" -> "a b",
      "async" -> "", "data-x" -> "1", "x" -> "dup"))
    // unterminated quote: value is the tail (never throws)
    assert(HtmlMeta.attrsOf("meta content=\"open") === Map("content" -> "open"))
    assert(HtmlMeta.attrsOf("meta") === Map.empty)
  }

  // ---- parse ----

  test("parse: full head, mixed-case tags, entities, ws collapse") {
    val html = "<HTML Lang=' EN '>\n<head>" +
      "<TiTLe> A &amp;  B </tItLe>" +
      "<meta content='d &quot;x&quot;' name='Description'>" +
      "<meta property=\"og:title\" content=\"og t\">" +
      "<link rel=canonical href=\"/canon.html\">" +
      "</head><body><title>decoy</title></body>"
    val m = HtmlMeta.parse(html, Base)
    assert(m.title === Some("A & B"))
    assert(m.description === Some("d \"x\""))
    assert(m.ogTitle === Some("og t"))
    assert(m.canonical === Some("https://ex.org/canon.html"))
    assert(m.lang === Some("en"))
  }

  test("parse: region bound — body decoys never leak past </head>") {
    val html = "<head></head><body><title>decoy</title>" +
      "<meta name=description content=d>" +
      "<link rel=canonical href=/x></body>"
    val m = HtmlMeta.parse(html, Base)
    assert(m === HtmlMeta.Meta(None, None, None, None, None))
    // no </head> at all: the whole document is the region
    val m2 = HtmlMeta.parse("<title>t</title>", Base)
    assert(m2.title === Some("t"))
  }

  test("parse: first occurrence wins; empties and broken tags are absent") {
    val html = "<head><title>one</title><title>two</title>" +
      "<meta name=description content=first>" +
      "<meta name=description content=second>" +
      "<title>late</title></head>"
    val m = HtmlMeta.parse(html, Base)
    assert(m.title === Some("one"))
    assert(m.description === Some("first"))
    assert(HtmlMeta.parse("<head><title></title></head>", Base).title === None)
    assert(HtmlMeta.parse("<head><title>unterminated</head>", Base)
      .title === None)
    assert(HtmlMeta.parse(null, Base) ===
      HtmlMeta.Meta(None, None, None, None, None))
  }

  test("parse: canonical resolves through the restricted resolver") {
    def canon(href: String) = HtmlMeta.parse(
      "<head><link rel=\"canonical\" href=\"" + href + "\"></head>", Base)
      .canonical
    assert(canon("../other.html") === Some("https://ex.org/other.html"))
    assert(canon("//cdn.ex.org/p") === Some("https://cdn.ex.org/p"))
    assert(canon("mailto:x@y.z") === None) // non-http scheme dropped
    // <titlex> prefix must not match <title>
    assert(HtmlMeta.parse("<head><titlex>no</titlex></head>", Base)
      .title === None)
  }

  test("parse: the FIRST rel=canonical decides, even when broken") {
    // a second canonical never rescues a missing/unresolvable first one
    // (mirror-parity regression: graftpy breaks on the first occurrence)
    val broken = "<head><link rel=canonical href=\"mailto:x@y.z\">" +
      "<link rel=canonical href=\"/real.html\"></head>"
    assert(HtmlMeta.parse(broken, Base).canonical === None)
    val noHref = "<head><link rel=canonical>" +
      "<link rel=canonical href=\"/real.html\"></head>"
    assert(HtmlMeta.parse(noHref, Base).canonical === None)
    val ok = "<head><link rel=canonical href=\"/a\">" +
      "<link rel=canonical href=\"/b\"></head>"
    assert(HtmlMeta.parse(ok, Base).canonical ===
      Some("https://ex.org/a"))
  }

  test("codePointStats counts code points and never splits surrogates") {
    val astral = "x" + new String(Character.toChars(0x1F600)) + "y" // x😀y
    assert(CharsetSniff.codePointStats(astral, 48) === ((3, astral)))
    // cut at k=2 keeps the full surrogate pair, not half of it
    assert(CharsetSniff.codePointStats(astral, 2) ===
      ((3, "x" + new String(Character.toChars(0x1F600)))))
    assert(CharsetSniff.codePointStats("", 48) === ((0, "")))
  }

  // ---- charset sniff ----

  test("sniff: BOMs win and are stripped") {
    assert(CharsetSniff.sniff(Array(0xEF, 0xBB, 0xBF, 'a').map(_.toByte)) ===
      (("utf-8", 3)))
    assert(CharsetSniff.sniff(Array(0xFF, 0xFE, 65, 0).map(_.toByte)) ===
      (("utf-16le", 2)))
    assert(CharsetSniff.sniff(Array(0xFE, 0xFF, 0, 65).map(_.toByte)) ===
      (("utf-16be", 2)))
  }

  test("sniff: meta charset, http-equiv, label mapping, default") {
    def s(html: String) = CharsetSniff.sniff(
      html.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))._1
    assert(s("<meta charset=\"UTF-8\">") === "utf-8")
    assert(s("<META CHARSET=utf8>") === "utf-8")
    assert(s("<meta http-equiv='Content-Type' " +
      "content='text/html; charset=iso-8859-1'>") === "windows-1252")
    assert(s("<meta http-equiv=\"content-type\" " +
      "content=\"text/html; charset='latin1'; x=y\">") === "windows-1252")
    // WHATWG: a meta cannot declare utf-16 -> utf-8
    assert(s("<meta charset=utf-16le>") === "utf-8")
    // unrecognized label skipped, later meta wins
    assert(s("<meta charset=klingon><meta charset=utf-8>") === "utf-8")
    assert(s("<p>no meta at all</p>") === "windows-1252")
    // prescan window: a meta past 1024 bytes is invisible
    assert(s(" " * 1100 + "<meta charset=utf-8>") === "windows-1252")
  }

  test("decode round-trips the CharsetGen fixture modes") {
    val text = "alpha beta gamma delta epsilon zeta eta"
    // mode 0 no BOM (id=4): meta-declared utf-8
    val (cs4, bom4, t4) = CharsetSniff.decode(
      graft.pipeline.CharsetGen.payload(4, text))
    assert(cs4 === "utf-8" && !bom4 && t4.contains("café №✓"))
    // mode 0 BOM (id=8)
    val (cs8, bom8, _) = CharsetSniff.decode(
      graft.pipeline.CharsetGen.payload(8, text))
    assert(cs8 === "utf-8" && bom8)
    // mode 1 LE (id=5) / BE (id=9)
    val (cs5, _, t5) = CharsetSniff.decode(
      graft.pipeline.CharsetGen.payload(5, text))
    assert(cs5 === "utf-16le" && t5.contains("café №✓"))
    val (cs9, _, t9) = CharsetSniff.decode(
      graft.pipeline.CharsetGen.payload(9, text))
    assert(cs9 === "utf-16be" && t9.contains("café №✓"))
    // mode 2 (id=2): iso-8859-1 label -> windows-1252 decode
    val (cs2, _, t2) = CharsetSniff.decode(
      graft.pipeline.CharsetGen.payload(2, text))
    assert(cs2 === "windows-1252" && t2.contains("café ±½"))
    // mode 3 (id=3): unquoted uppercase charset attr
    val (cs3, _, t3) = CharsetSniff.decode(
      graft.pipeline.CharsetGen.payload(3, text))
    assert(cs3 === "windows-1252" && t3.contains("café ±½"))
  }

  test("decodeWithTransport: BOM > transport > meta > default") {
    import java.nio.charset.StandardCharsets._
    val utf8Meta = "<html><head><meta charset=\"utf-8\"></head>" +
      "<body>café</body></html>"
    // transport CONFLICTS with meta: transport wins without a BOM
    val (csT, _, tT) = CharsetSniff.decodeWithTransport(
      utf8Meta.getBytes(UTF_8), "iso-8859-1")
    assert(csT === "windows-1252" && tT.contains("cafÃ©")) // mojibake pinned
    // BOM beats the transport label
    val bomBytes = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      utf8Meta.getBytes(UTF_8)
    val (csB, bomB, tB) =
      CharsetSniff.decodeWithTransport(bomBytes, "iso-8859-1")
    assert(csB === "utf-8" && bomB && tB.contains("café"))
    // unknown / absent label falls through to the meta prescan
    val (csU, _, tU) = CharsetSniff.decodeWithTransport(
      utf8Meta.getBytes(UTF_8), "klingon-1")
    assert(csU === "utf-8" && tU.contains("café"))
    val (csN, _, _) = CharsetSniff.decodeWithTransport(
      utf8Meta.getBytes(UTF_8), null)
    assert(csN === "utf-8")
    // no BOM, no label, no meta: default
    assert(CharsetSniff.decodeWithTransport(
      "plain".getBytes(UTF_8), "")._1 === "windows-1252")
  }
}
