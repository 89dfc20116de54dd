package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-based sentence segmentation (punkt-lite) — the preprocessing
  * primitive under sentence-level dedup, per-sentence quality filters, and
  * parallel-corpus alignment. Pure per-row function → map-only over the
  * corpus, no shuffle anywhere.
  *
  * PINNED boundary spec (mirrored clean-room in graftpy.py sent_split):
  * a boundary is a run of `.!?` optionally followed by closers `"')]`,
  * then ≥1 whitespace, then an ASCII uppercase letter or digit — UNLESS
  * the word ending at the punctuation is a known abbreviation
  * (case-insensitive, letters-only match against [[Abbrev]]) or a
  * single-letter initial ("J. Smith"). Decimals ("3.14") never split
  * because no whitespace follows the dot. Sentences are emitted trimmed;
  * text with no boundary yields one sentence if nonempty after trim.
  * All case checks are ASCII-pinned (the cross-engine rule).
  */
object Sentences {

  /** Pinned abbreviation list — part of the function's definition. */
  val Abbrev: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "st", "vs", "etc", "eg", "ie",
    "no", "fig", "jr", "sr", "inc", "ltd", "co", "dept")

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'
  @inline private def isUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  @inline private def isLower(c: Char): Boolean = c >= 'a' && c <= 'z'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isTerm(c: Char): Boolean = c == '.' || c == '!' || c == '?'
  @inline private def isCloser(c: Char): Boolean =
    c == '"' || c == '\'' || c == ')' || c == ']'

  /** The word (maximal non-whitespace run) ending just before index `i`,
    * or "" if `i` is at a word start.
    */
  private def wordEndingAt(s: String, i: Int): String = {
    var b = i
    while (b > 0 && !isWs(s.charAt(b - 1))) b -= 1
    s.substring(b, i)
  }

  /** True iff the terminator run starting at `i` is suppressed by the
    * abbreviation / initial guard (only meaningful for '.').
    */
  private def guarded(s: String, i: Int): Boolean = {
    if (s.charAt(i) != '.') return false
    val w = wordEndingAt(s, i)
    if (w.isEmpty) return false
    // single-letter initial: "J."
    if (w.length == 1 && isUpper(w.charAt(0))) return true
    // letters-only word in the pinned abbreviation set (ASCII lowercase)
    var j = 0
    val sb = new java.lang.StringBuilder(w.length)
    while (j < w.length) {
      val c = w.charAt(j)
      if (isUpper(c)) sb.append((c + 32).toChar)
      else if (isLower(c)) sb.append(c)
      else return false
      j += 1
    }
    Abbrev.contains(sb.toString)
  }

  private def trimWs(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && isWs(s.charAt(b))) b += 1
    while (e > b && isWs(s.charAt(e - 1))) e -= 1
    s.substring(b, e)
  }

  /** Split one text into sentences per the pinned spec. Null-safe. */
  def splitSentences(text: String): IndexedSeq[String] = {
    if (text == null) return IndexedSeq.empty
    val out = IndexedSeq.newBuilder[String]
    var start = 0
    var i = 0
    val n = text.length
    while (i < n) {
      if (isTerm(text.charAt(i)) && !guarded(text, i)) {
        var e = i
        while (e + 1 < n && isTerm(text.charAt(e + 1))) e += 1
        var c = e
        while (c + 1 < n && isCloser(text.charAt(c + 1))) c += 1
        var w = c + 1
        while (w < n && isWs(text.charAt(w))) w += 1
        if (w > c + 1 && w < n &&
            (isUpper(text.charAt(w)) || isDigit(text.charAt(w)))) {
          val sent = trimWs(text.substring(start, c + 1))
          if (sent.nonEmpty) out += sent
          start = w
          i = w
        } else i = e + 1
      } else i += 1
    }
    val tail = trimWs(text.substring(start))
    if (tail.nonEmpty) out += tail
    out.result()
  }

  /** Corpus form: (doc_id, sent_id, sentence, n_chars) — one map pass,
    * null-id/-text rows dropped (repo null-row convention).
    */
  def sentences(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        splitSentences(t).iterator.zipWithIndex.map {
          case (s, j) => (id, j, s, s.length)
        }
      }.toDF("doc_id", "sent_id", "sentence", "n_chars")
  }
}
