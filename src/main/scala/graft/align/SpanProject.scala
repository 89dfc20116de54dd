package graft.align

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** An aligned output span: `{syl, ul, lr}` (alignToOCR.py:324, 340-351). */
final case class SylBox(syl: String, ulx: Int, uly: Int, lrx: Int, lry: Int)

/** Post-alignment span grouping — ports of alignToOCR.py:283-351 (gap
  * insertion, syllable→span projection, bbox rotation, JSON serialization).
  */
object SpanProject {

  /** Gap insertion / stream sync (alignToOCR.py:283-292): build the box list
    * aligned 1:1 with the alignment strings by inserting gap boxes wherever
    * `ocrAlign` holds '_'. One pass — equivalent to the reference's
    * insert-while-enumerating loop. Throws if lengths disagree (mirrors the
    * reference's assert at alignToOCR.py:291-292).
    */
  def insertGaps(allChars: IndexedSeq[CharBox], ocrAlign: String): IndexedSeq[CharBox] = {
    val out = new Array[CharBox](ocrAlign.length)
    var src = 0
    var i = 0
    while (i < ocrAlign.length) {
      if (ocrAlign.charAt(i) == '_') out(i) = CharBox.Gap
      else { out(i) = allChars(src); src += 1 }
      i += 1
    }
    require(src == allChars.length,
      s"all_chars not same length as alignment: ${allChars.length} consumed $src of ${ocrAlign.length}")
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Syllable regex: gaps allowed only between inner chars —
    * `syl[0] + syl[1:-1].replace('', '_*') + syl[-1]` (alignToOCR.py:299-304)
    * ≡ the syllable's chars joined by `_*`. Chars are quoted defensively
    * (cleaned transcripts only hold `[\w\s|]`, but '|' would otherwise be a
    * regex alternation).
    */
  def sylRegex(syl: String): Pattern = {
    val body = syl.map(c => Pattern.quote(c.toString)).mkString("_*")
    Pattern.compile(body)
  }

  /** Syllable → span projection (alignToOCR.py:294-324): sequential regex
    * search over `traAlign` with an advancing offset; union bbox of the
    * non-gap boxes in the match range; if boxes span multiple lines keep only
    * the lowest (max uly); skip all-gap syllables.
    *
    * Reference divergence (guarded): a syllable with no match would raise
    * AttributeError in the reference (alignToOCR.py:307); here it is skipped
    * (offset unchanged) so a malformed row cannot kill a 10^12-row job.
    */
  def projectSyllables(
      syls: Seq[String],
      traAlign: String,
      gappedChars: IndexedSeq[CharBox]): Vector[SylBox] = {

    val sylBoxes = Vector.newBuilder[SylBox]
    var currentOffset = 0

    for (syl <- syls) {
      if (syl.nonEmpty) {
        val m = sylRegex(syl).matcher(traAlign)
        if (m.find(currentOffset)) {
          val start = m.start()
          val end = m.end()
          currentOffset = end

          var boxes = new ArrayBuffer[CharBox]()
          var i = start
          while (i < end) {
            val b = gappedChars(i)
            if (b.hasBox) boxes += b
            i += 1
          }

          if (boxes.nonEmpty) {
            // multi-line syllable: keep only the lowest line (alignToOCR.py:318-320)
            var distinctUly = false
            val firstUly = boxes(0).uly
            var k = 1
            while (k < boxes.length && !distinctUly) {
              if (boxes(k).uly != firstUly) distinctUly = true
              k += 1
            }
            if (distinctUly) {
              var lower = Int.MinValue
              boxes.foreach(b => if (b.uly > lower) lower = b.uly)
              boxes = boxes.filter(_.uly == lower)
            }
            var ulx = Int.MaxValue; var uly = Int.MaxValue
            var lrx = Int.MinValue; var lry = Int.MinValue
            boxes.foreach { b =>
              if (b.ulx < ulx) ulx = b.ulx
              if (b.uly < uly) uly = b.uly
              if (b.lrx > lrx) lrx = b.lrx
              if (b.lry > lry) lry = b.lry
            }
            sylBoxes += SylBox(syl, ulx, uly, lrx, lry)
          }
        }
        // no match: reference would crash (alignToOCR.py:307); we skip.
      }
    }
    sylBoxes.result()
  }

  /** Bbox rotation compensation (alignToOCR.py:90-125). Identity when
    * angle == 0 and dims match, but implemented for capability parity.
    * Python-2 integer division for the pivot/offsets; NumPy `round` is
    * half-to-even (`Math.rint`); int16 cast wraps (`toShort`).
    */
  def rotateBbox(
      box: SylBox,
      angleDeg: Double,
      origCols: Int, origRows: Int,
      targetCols: Int, targetRows: Int): SylBox = {
    // Python-2 `/` on ints FLOORS; Scala `/` truncates -- differs for the
    // negative odd differences that arise when target dims exceed orig dims
    val pivotX = Math.floorDiv(origCols, 2)
    val pivotY = Math.floorDiv(origRows, 2)
    val dx = Math.floorDiv(origCols - targetCols, 2)
    val dy = Math.floorDiv(origRows - targetRows, 2)
    val angle = angleDeg * math.Pi / 180
    val s = math.sin(angle)
    val c = math.cos(angle)

    val oUlx = box.ulx - pivotX
    val oUly = box.uly - pivotY
    val oLrx = box.lrx - pivotX
    val oLry = box.lry - pivotY

    val nUlx = (oUlx * c) - (oUly * s) + (pivotX - dx)
    val nUly = (oUlx * s) + (oUly * c) + (pivotY - dy)
    val nLrx = (oLrx * c) - (oLry * s) + (pivotX - dx)
    val nLry = (oLrx * s) + (oLry * c) + (pivotY - dy)

    SylBox(box.syl,
      Math.rint(nUlx).toLong.toShort.toInt, Math.rint(nUly).toLong.toShort.toInt,
      Math.rint(nLrx).toLong.toShort.toInt, Math.rint(nLry).toLong.toShort.toInt)
  }

  /** NumPy linear-interpolation quantile (np.quantile(x, q)) — used for
    * `median_line_spacing` (alignToOCR.py:338).
    */
  def numpyQuantile(values: Array[Double], q: Double): Double = {
    require(values.nonEmpty, "quantile of empty array")
    val sorted = values.sorted
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** JSON serialization shape of the reference output
    * (to_JSON_dict, alignToOCR.py:333-351).
    */
  def toJson(sylBoxes: Seq[SylBox], linesPeakLocs: Array[Double]): String = {
    val spacing =
      if (linesPeakLocs.length >= 2) {
        val diffs = new Array[Double](linesPeakLocs.length - 1)
        var i = 0
        while (i < diffs.length) { diffs(i) = linesPeakLocs(i + 1) - linesPeakLocs(i); i += 1 }
        numpyQuantile(diffs, 0.75)
      } else 0.0
    val sb = new java.lang.StringBuilder()
    sb.append("{\"median_line_spacing\": ").append(spacing).append(", \"syl_boxes\": [")
    var first = true
    for (s <- sylBoxes) {
      if (!first) sb.append(", ")
      first = false
      sb.append("{\"syl\": \"").append(s.syl.replace("\\", "\\\\").replace("\"", "\\\""))
        .append("\", \"ul\": [").append(s.ulx).append(", ").append(s.uly)
        .append("], \"lr\": [").append(s.lrx).append(", ").append(s.lry).append("]}")
    }
    sb.append("]}")
    sb.toString
  }
}
