package graft.align

import java.util.regex.{Matcher, Pattern}

/** Transcript / noisy-stream text cleanup — ports of parse_cantus_csv.py:5-35
  * and alignToOCR.py:61-87.
  */
object CleanText {

  private val NonWordRe = Pattern.compile("[^\\s\\w|]")
  private val PipeRe = Pattern.compile(" \\| ")
  private val SpaceRunRe = Pattern.compile(" +")

  /** Transcript normalizer (parse_cantus_csv.py:5-13): drop everything but
    * whitespace/word chars/'|', collapse " | " to " ", collapse space runs,
    * lowercase. ASCII `\w` semantics (the reference runs Python 2 byte
    * strings; also matches the DuckDB/RE2 oracle).
    */
  def clean(text: String): String = {
    var t = NonWordRe.matcher(text).replaceAll("")
    t = PipeRe.matcher(t).replaceAll(" ")
    t = SpaceRunRe.matcher(t).replaceAll(" ")
    t.toLowerCase
  }

  /** OCR-stream cleanup (alignToOCR.py:61-72): remove '~'. */
  def cleanSpecialChars(inp: String): String = inp.replace("~", "")

  /** Plaintext transcript reader semantics (alignToOCR.py:75-87): drop lines
    * starting with '#', join with ' ', drop CR/LF, drop "| ". Takes lines
    * WITHOUT their terminators (readlines-with-'\n' joined then stripped is
    * equivalent).
    */
  def readTranscriptLines(lines: Seq[String]): String = {
    val joined = lines.filter(l => !l.startsWith("#")).mkString(" ")
    joined.replace("\n", "").replace("\r", "").replace("| ", "")
  }

  private val JWordRe = Pattern.compile("\\w*[jJ]\\w*")

  /** j/i spelling repair (parse_cantus_csv.py:16-35): copy 'j' placement
    * from the standardized spelling into the MS spelling.
    */
  def combineTranscripts(standard: String, ms: String): String = {
    var out = ms.replace("ihe", "ie")
    if (standard == null || standard.isEmpty) return out
    val m: Matcher = JWordRe.matcher(standard)
    while (m.find()) {
      val word = m.group().toLowerCase
      val newPat = word.replace("j", "\\w")
      out = Pattern.compile(newPat).matcher(out).replaceAll(Matcher.quoteReplacement(word))
    }
    out
  }
}
