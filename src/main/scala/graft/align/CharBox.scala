package graft.align

/** A character (or syllable) with its bounding box — port of `class CharBox`
  * (alignToOCR.py:35-58). `hasBox = false` models the reference's
  * `CharBox('_')` gap boxes with `ul = lr = None`.
  *
  * In the web-text degeneration, boxes are character offsets in the extracted
  * stream: char k gets `ul=(k,0)`, `lr=(k+1,1)` (SURVEY.md D2).
  */
final case class CharBox(
    ch: String,
    ulx: Int,
    uly: Int,
    lrx: Int,
    lry: Int,
    hasBox: Boolean = true)

object CharBox {
  /** Gap box (`CharBox('_')`, alignToOCR.py:287). */
  val Gap: CharBox = CharBox("_", 0, 0, 0, 0, hasBox = false)

  /** Unit box at stream offset k. */
  def at(ch: Char, k: Int): CharBox = CharBox(ch.toString, k, 0, k + 1, 1)
}

/** Abbreviation expansion over the noisy char stream — port of
  * alignToOCR.py:251-264 with the map of latinSyllabification.py:9-19.
  *
  * Iteration order is the literal dict insertion order (pinned: the golden
  * fixtures were produced under Python 3 where dicts preserve insertion
  * order). After each splice the scan restarts from index 0, as in the
  * reference.
  */
object Abbrev {

  /** latinSyllabification.py:9-19, insertion order pinned. */
  val Abbreviations: Seq[(String, Seq[String])] = Seq(
    "dns" -> Seq("do", "mi", "nus"),
    "dūs" -> Seq("do", "mi", "nus"), // dūs
    "dne" -> Seq("do", "mi", "ne"),
    "alla" -> Seq("al", "le", "lu", "ia"),
    "^" -> Seq("us"),
    "ā" -> Seq("am"), // ā
    "ē" -> Seq("em"), // ē
    "ū" -> Seq("um"), // ū
    "ō" -> Seq("om")  // ō
  )

  /** Expand abbreviations over the box stream. Segment i of the expansion
    * inherits the box of original char i+idx (alignToOCR.py:261-263).
    *
    * Output-equivalent optimization of the reference loop: the reference
    * rescans from index 0 after each splice; since a splice leaves all chars
    * before `idx` untouched (and `idx` was the FIRST occurrence), any new
    * occurrence must overlap the spliced region, i.e. start at
    * ≥ idx - len(key) + 1 — so the scan resumes there instead of 0, and the
    * boxes live in a spliced ArrayBuffer rather than rebuilt strings. Bounds
    * an abbreviation-dense adversarial page (e.g. 100k '^' chars) to seconds
    * instead of minutes, with byte-identical output (differential-tested).
    *
    * Assumes 1-char boxes (guaranteed by ExtractHtml and by expansion
    * itself); falls back to the literal reference algorithm otherwise.
    */
  def expand(allCharsIn: IndexedSeq[CharBox]): IndexedSeq[CharBox] = {
    if (allCharsIn.exists(_.ch.length != 1)) return expandLiteral(allCharsIn)

    val buf = new scala.collection.mutable.ArrayBuffer[CharBox](allCharsIn.length + 16)
    buf ++= allCharsIn

    @inline def matchesAt(pos: Int, key: String): Boolean = {
      if (pos + key.length > buf.length) false
      else {
        var i = 0
        while (i < key.length && buf(pos + i).ch.charAt(0) == key.charAt(i)) i += 1
        i == key.length
      }
    }

    for ((abb, segments) <- Abbreviations) {
      var from = 0
      while (from >= 0 && from + abb.length <= buf.length) {
        var idx = from
        while (idx + abb.length <= buf.length && !matchesAt(idx, abb)) idx += 1
        if (idx + abb.length > buf.length) from = -1 // no more occurrences
        else {
          val ins = Vector.newBuilder[CharBox]
          var i = 0
          while (i < segments.length) {
            val splitBox = buf(i + idx)
            for (x <- segments(i))
              ins += CharBox(x.toString, splitBox.ulx, splitBox.uly, splitBox.lrx, splitBox.lry)
            i += 1
          }
          buf.remove(idx, abb.length)
          buf.insertAll(idx, ins.result())
          from = math.max(0, idx - abb.length + 1)
        }
      }
    }
    buf.toIndexedSeq
  }

  /** Literal port of alignToOCR.py:251-264 (rescan from 0, rebuilt string
    * per iteration) — semantics anchor; used directly only when a box holds
    * a multi-char string (possible in the reference's .llocs flow, never in
    * the HTML-extraction flow).
    */
  def expandLiteral(allCharsIn: IndexedSeq[CharBox]): IndexedSeq[CharBox] = {
    var allChars: Vector[CharBox] = allCharsIn.toVector
    for ((abb, segments) <- Abbreviations) {
      var done = false
      while (!done) {
        val ocrStr = allChars.iterator.map(_.ch).mkString
        val idx = ocrStr.indexOf(abb)
        if (idx == -1) done = true
        else {
          val ins = Vector.newBuilder[CharBox]
          var i = 0
          while (i < segments.length) {
            val splitBox = allChars(i + idx)
            for (x <- segments(i))
              ins += CharBox(x.toString, splitBox.ulx, splitBox.uly, splitBox.lrx, splitBox.lry)
            i += 1
          }
          allChars = allChars.take(idx) ++ ins.result() ++ allChars.drop(idx + abb.length)
        }
      }
    }
    allChars
  }
}
