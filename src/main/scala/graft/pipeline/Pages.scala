package graft.pipeline

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** The input-table row shape (BASELINE.json `input_hint`): an Iceberg-style
  * table of Common-Crawl-like web pages.
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic page synthesis: `html` is boilerplate wrapping a seeded
  * noisy rendering of `text` (char substitutions, indels, ligatures ﬁ/ﬂ,
  * '~' specks, abbreviation insertions). No wall-clock, no external data —
  * byte-stable across runs and parallelism levels, so correctness and bench
  * runs see identical inputs.
  */
object PageGen {

  /** SplitMix64 — tiny, seedable, allocation-free PRNG. */
  final class Rng(seed0: Long) {
    private var state: Long = seed0
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    /** uniform double in [0,1). */
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(bound: Int): Int = ((nextLong() >>> 33) % bound).toInt
  }

  private val Subs: Map[Char, String] = Map(
    'l' -> "1", 'o' -> "0", 'e' -> "c", 'a' -> "o", 'i' -> "l",
    'u' -> "v", 's' -> "5", 'm' -> "rn", 'w' -> "vv", 't' -> "+")

  private val InsertAlphabet = "abcdefghijklmnopqrstuvwxyz"

  /** Noisy OCR-style rendering of a clean transcript. ~6% of chars are
    * substituted, ~2% deleted, ~2% get an insertion, ~1% get a '~' speck;
    * 'fi'/'fl' digrams become ligatures with p=0.25.
    */
  def noisyRender(text: String, seed: Long): String = {
    val rng = new Rng(seed ^ 0x5eed5eedL)
    val sb = new java.lang.StringBuilder(text.length + 16)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      // ligature injection on 'fi' / 'fl' digrams
      if (c == 'f' && i + 1 < text.length &&
          (text.charAt(i + 1) == 'i' || text.charAt(i + 1) == 'l') &&
          rng.nextDouble() < 0.25) {
        sb.append(if (text.charAt(i + 1) == 'i') 'ﬁ' else 'ﬂ')
        i += 2
      } else {
        val r = rng.nextDouble()
        if (r < 0.06 && Subs.contains(c)) sb.append(Subs(c))
        else if (r < 0.08 && c != ' ') { /* delete */ }
        else if (r < 0.10) { sb.append(c); sb.append(InsertAlphabet.charAt(rng.nextInt(26))) }
        else if (r < 0.11) { sb.append(c); sb.append('~') }
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Wrap a noisy stream in deterministic Common-Crawl-ish boilerplate. */
  def wrapHtml(noisy: String, url: String, seed: Long): Array[Byte] = {
    val rng = new Rng(seed ^ 0xb01123a7eL)
    val navVariant = rng.nextInt(3)
    val nav = navVariant match {
      case 0 => "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>"
      case 1 => "<nav><ul><li>Index</li><li>Archive</li></ul></nav>"
      case _ => "<header><h1>Site</h1></header>"
    }
    val html =
      s"""<!DOCTYPE html><html><head><title>doc</title>
         |<script>var trk = ${rng.nextInt(100000)}; function f(){return "<div>";}</script>
         |<style>.m{margin:${rng.nextInt(20)}px} .c{color:#abc}</style>
         |<meta charset="utf-8"/></head><body>
         |$nav
         |<div class="main" id="content"><p>${escapeHtml(noisy)}</p></div>
         |<aside>Related: <a href="$url?ref=1">link</a></aside>
         |<footer>&copy; 2026 example.org &middot; crawl ${rng.nextInt(9999)}</footer>
         |</body></html>""".stripMargin
    html.getBytes(StandardCharsets.UTF_8)
  }

  def urlFor(docId: Long): String = f"https://example.org/doc/$docId%08d"

  /** Deterministic UTC timestamp: 2026-01-01T00:00:00Z + docId seconds. */
  def tsFor(docId: Long): Timestamp = new Timestamp(1767225600000L + docId * 1000L)

  /** Build one page row from a document row. */
  def pageFor(docId: Long, text: String, lang: String): Page = {
    val noisy = noisyRender(text, docId)
    Page(urlFor(docId), tsFor(docId), wrapHtml(noisy, urlFor(docId), docId), text, lang)
  }
}
