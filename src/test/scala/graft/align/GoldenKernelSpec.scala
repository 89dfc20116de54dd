package graft.align

import org.scalatest.funsuite.AnyFunSuite

/** T1 golden-kernel tests (SURVEY.md §5): byte-identical targets captured by
  * executing the reference itself (FIXTURES.md).
  */
class GoldenKernelSpec extends AnyFunSuite {

  val seq1 = "Lorem ipsum dolor sit amet, consectetur adipiscing elit "
  val seq2 = "LoLorem fipsudolor ..... sit eamet, c.nnr adizisdcing eelitellit"

  test("digram alignment fixture (textSeqCompare.py:180-190, scoring [10,-5,-7,-7])") {
    val t1 = (0 until seq1.length / 2).map(x => seq1.substring(2 * x, 2 * x + 2)).toVector
    val t2 = (0 until seq2.length / 2).map(x => seq2.substring(2 * x, 2 * x + 2)).toVector
    val (a, b) = NeedlemanWunsch.alignTokens(t1, t2, Scoring.symmetric(10, -5, -7, -7))
    assert(a.mkString("|") ===
      "_|Lo|re|m |_|_|_|ip|su|m |do|lo|r |si|t |am|et|, |co|ns|ec|te|tu|r |ad|ip|is|_|ci|ng| e|li|t |_|_")
    assert(b.mkString("|") ===
      "Lo|Lo|re|m |fi|ps|ud|ol|or| .|..|..| s|it| e|am|et|, |_|_|_|c.|nn|r |ad|iz|is|dc|in|g |ee|li|te|ll|it")
  }

  val goldTra = "__Lorem _ipsum dolor______ sit _amet, consectetur adipis_cing _elit ____"
  val goldOcr = "LoLorem fipsu__dolor ..... sit eamet, c.n______nr adizisdcing eelitellit"

  test("char-level alignment fixture, default scoring (tokens path)") {
    val (a, b) = NeedlemanWunsch.alignTokens(
      seq1.map(_.toString).toVector, seq2.map(_.toString).toVector)
    assert(a.mkString === goldTra)
    assert(b.mkString === goldOcr)
  }

  test("char-level alignment fixture, default scoring (banded char path)") {
    // tiny initial band forces the doubling-agreement machinery
    for (band <- Seq(1, 4, 64, 4096)) {
      val r = NeedlemanWunsch.alignCharsBanded(seq1, seq2, Scoring.Default, band)
      assert(r.traAlign === goldTra, s"band=$band")
      assert(r.ocrAlign === goldOcr, s"band=$band")
    }
    val rf = NeedlemanWunsch.alignChars(seq1, seq2)
    assert(rf.traAlign === goldTra && rf.ocrAlign === goldOcr)
  }

  test("syllabification fixtures (latinSyllabification.py:215-219)") {
    assert(Syllabify.syllabifyText(
      "quaecumque ejus michi antiphonum assistens alleluya dixit extra exhibeamus") ===
      Vector("quae", "cum", "que", "e", "jus", "mi", "chi", "an", "ti", "pho", "num",
        "as", "si", "stens", "al", "le", "lu", "ya", "dix", "it", "ex", "tra",
        "ex", "hi", "be", "a", "mus"))
    assert(Syllabify.syllabifyWord("dominus") === Vector("do", "mi", "nus"))
    assert(Syllabify.syllabifyWord("euouae") === Vector("e", "u", "o", "u", "ae"))
    assert(Syllabify.syllabifyWord("alleluia") === Vector("al", "le", "lui", "a"))
    assert(Syllabify.syllabifyWord("sanctus") === Vector("san", "ctus"))
  }

  test("syllabify guards: vowel-less and empty words terminate") {
    assert(Syllabify.syllabifyWord("dns") === Vector("d", "n", "s"))
    assert(Syllabify.syllabifyWord("") === Vector.empty)
    assert(Syllabify.syllabifyText("a  b") === Vector("a", "b")) // double space
  }

  test("clean fixtures (parse_cantus_csv.py:5-13,16-35)") {
    assert(CleanText.clean("In exitu Israel!  de Aegypto | domus Jacob...") ===
      "in exitu israel de aegypto domus jacob")
    assert(CleanText.combineTranscripts("Jacob justus", "iacob iustus") === "jacob justus")
  }

  test("read_file semantics (alignToOCR.py:75-87)") {
    assert(CleanText.readTranscriptLines(Seq("# comment", "alleluia | dominus", "dixit")) ===
      "alleluia dominus dixit")
    assert(CleanText.cleanSpecialChars("a~b~") === "ab")
  }

  test("end-to-end span fixture (FIXTURES.md §6)") {
    val transcript = "alleluia dominus dixit dominus meus"
    val noisy = "a1leluia  dns dixit dminus meus extra"
    val stream = noisy.zipWithIndex.map { case (c, k) => CharBox.at(c, k) }.toVector

    val r = AlignKernel.processStream(transcript, stream)
    assert(r.error === "")
    assert(r.traAlign === "alleluia_ dominus dixit dominus meus______")
    assert(r.ocrAlign === "a1leluia  dominus dixit d_minus meus extra")

    val golden = Vector(
      ("al", 0, 2), ("le", 2, 4), ("lui", 4, 7), ("a", 7, 8),
      ("do", 10, 11), ("mi", 11, 12), ("nus", 12, 13),
      ("dix", 14, 17), ("it", 17, 19),
      ("do", 20, 21), ("mi", 21, 23), ("nus", 23, 26),
      ("me", 27, 29), ("us", 29, 31))
    assert(r.spans.map(s => (s.syl, s.ulx, s.lrx)) === golden)
    assert(r.spans.forall(s => s.uly == 0 && s.lry == 1))
  }

  test("abbreviation expansion order and box inheritance (alignToOCR.py:251-264)") {
    val stream = "xdnsy".zipWithIndex.map { case (c, k) => CharBox.at(c, k) }.toVector
    val out = Abbrev.expand(stream)
    assert(out.map(_.ch).mkString === "xdominusy")
    // 'do' inherits box of 'd' (offset 1), 'mi' of 'n' (2), 'nus' of 's' (3)
    assert(out(1).ulx === 1 && out(2).ulx === 1)
    assert(out(3).ulx === 2 && out(4).ulx === 2)
    assert(out(5).ulx === 3 && out(6).ulx === 3 && out(7).ulx === 3)
  }

  test("numpy linear-interpolation quantile (alignToOCR.py:338)") {
    assert(SpanProject.numpyQuantile(Array(1.0, 2.0, 3.0, 4.0), 0.75) === 3.25)
    assert(SpanProject.numpyQuantile(Array(10.0), 0.75) === 10.0)
    assert(SpanProject.numpyQuantile(Array(3.0, 1.0, 2.0), 0.5) === 2.0)
  }

  test("rotate_bbox identity at angle 0 (alignToOCR.py:90-125)") {
    val b = SylBox("al", 3, 0, 7, 1)
    assert(SpanProject.rotateBbox(b, 0.0, 100, 50, 100, 50) === b)
  }

  test("rotate_bbox matches NumPy/Python-2 semantics (floor div, half-even round, int16)") {
    // goldens computed by executing the reference formula under NumPy
    def r(b: (Int, Int, Int, Int), a: Double, oc: Int, or: Int, tc: Int, tr: Int) = {
      val o = SpanProject.rotateBbox(SylBox("x", b._1, b._2, b._3, b._4), a, oc, or, tc, tr)
      (o.ulx, o.uly, o.lrx, o.lry)
    }
    // negative odd dimension delta — floor vs truncation divergence case
    assert(r((3, 0, 7, 1), 0.0, 100, 50, 103, 50) === ((5, 0, 9, 1)))
    assert(r((10, 20, 30, 40), 5.0, 200, 100, 195, 99) === ((11, 12, 29, 34)))
    assert(r((10, 20, 30, 40), -3.5, 101, 51, 104, 54) === ((12, 24, 33, 43)))
    assert(r((0, 0, 1, 1), 182.5, 7, 9, 8, 10) === ((7, 9, 6, 8)))
  }

  test("winnowing: local edit preserves most minima; fold digest is identity-grade") {
    import graft.ops.TextOps
    val a = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val b = "the Xquick brown fox jumps over the lazy dog and runs far away home tonight"
    assert(TextOps.winnowSimilarity(a, a) === 1.0)
    assert(TextOps.winnowSimilarity(a, b) > 0.6, s"got ${TextOps.winnowSimilarity(a, b)}")
    assert(TextOps.fingerprintOf(a) !== TextOps.fingerprintOf(b))
    assert(TextOps.fingerprintOf(a) === TextOps.fingerprintOf(a))
  }

  test("bbox intersect / IOU (evaluate_text_alignment.py:16-53)") {
    assert(BBox.intersectArea(0, 0, 4, 4, 2, 2, 6, 6) === 4L)
    assert(BBox.intersectArea(0, 0, 1, 1, 5, 5, 6, 6) === 0L)
    assert(BBox.iou(0, 0, 4, 4, 0, 0, 4, 4) === 1.0)
    assert(BBox.iou(0, 0, 4, 4, 2, 2, 6, 6) === 4.0 / 28.0)
  }

  test("html extraction: boilerplate strip + entities + ligatures + '~'") {
    val html =
      """<!DOCTYPE html><html><head><title>t</title><script>var x = "<div>";</script>
        |<style>.a { color: red; }</style></head><body>
        |<nav>Home | About</nav>
        |<div class="main"><p>a1leluia  dns dixit</p><p>dminus ﬁnis &amp; meus ~extra</p></div>
        |<footer>&copy; 2026 example.org</footer>
        |</body></html>""".stripMargin
    assert(ExtractHtml.extractText(html.getBytes("UTF-8")) ===
      "a1leluia dns dixit dminus finis & meus extra")
  }
}
