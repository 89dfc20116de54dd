package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** WAT serialization contract: the Scala JSON writer must emit the exact
  * bytes python json.dumps(separators=(",",":"), ensure_ascii=False)
  * emits for the pinned envelope structure, and the serialized archive
  * must round-trip through the WARC parser.
  */
class WatSpec extends AnyFunSuite {

  test("jsonEscape matches json.dumps escaping") {
    assert(Warc.jsonEscape("plain") === "plain")
    assert(Warc.jsonEscape("a\"b\\c") === "a\\\"b\\\\c")
    assert(Warc.jsonEscape("n\nr\rt\tb\bf\f") === "n\\nr\\rt\\tb\\bf\\f")
    assert(Warc.jsonEscape("") === "\\u0001\\u001f")
    // ensure_ascii=False: non-ASCII stays raw
    assert(Warc.jsonEscape("café — №") === "café — №")
  }

  test("watJson matches the mirror's json.dumps output verbatim") {
    val links = IndexedSeq(
      LinkGraph.RawLink("/p?a=1&b=2", "go now", 0),
      LinkGraph.RawLink("https://y.org", "tab\there", 1))
    val js = Warc.watJson("https://x.org/a", "2026-01-01T00:00:00Z", 120L,
      Some("Hi \"there\" — ok"), links)
    assert(js === "{\"Envelope\":{\"WARC-Header-Metadata\":{" +
      "\"WARC-Target-URI\":\"https://x.org/a\"," +
      "\"WARC-Date\":\"2026-01-01T00:00:00Z\",\"Content-Length\":120}," +
      "\"Payload-Metadata\":{\"HTML-Metadata\":{" +
      "\"Head\":{\"Title\":\"Hi \\\"there\\\" — ok\"}," +
      "\"Links\":[{\"url\":\"/p?a=1&b=2\",\"text\":\"go now\"}," +
      "{\"url\":\"https://y.org\",\"text\":\"tab\\there\"}]}}}}")
  }

  test("watJson omits Title when absent, empty links array") {
    val js = Warc.watJson("u", "d", 0L, None, IndexedSeq.empty)
    assert(js.contains("\"Head\":{},\"Links\":[]"))
  }

  test("watBytes round-trips through the WARC parser as metadata records") {
    val recs = Seq(
      ("https://a/", "2026-01-01T00:00:00Z", "{\"k\":\"v\"}"),
      ("https://b/", "2026-01-02T00:00:00Z", "{\"k\":\"wä\"}"))
    val parsed = Warc.parse(Warc.watBytes(recs))
    assert(parsed.length === 2)
    assert(parsed.map(_.recType) === IndexedSeq("metadata", "metadata"))
    assert(parsed.map(_.uri) === IndexedSeq("https://a/", "https://b/"))
    assert(new String(parsed(1).payload,
      java.nio.charset.StandardCharsets.UTF_8) === "{\"k\":\"wä\"}")
  }
}
